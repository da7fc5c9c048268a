"""Round-5 MFU levers A/B: hash dropout + fused AdaLN-modulate.

Times the shipped train step (bfloat16_shadow, B=8) with the two
round-5 levers toggled:

- ops/layers.HASH_DROPOUT: counter-hash elementwise dropout masks fused
  into consumers vs jax.random.bernoulli (threefry tensors through HBM).
  Round-4 ablation charged dropout mask generation -17% of the cylinder
  step.
- ops/layers.FUSED_ADALN: one-pass Pallas AdaLN-modulate
  (ops/fused_adaln.py) vs XLA reduce+elementwise fusions. Round-4
  ablation: AdaLN modulation -11%.

Each variant is timed --repeats times INTERLEAVED (ledger noise
discipline, round-4 VERDICT item 9): the JSON reports median and
min..max spread per variant so sub-noise deltas are visible as such.

Also prints MFU for the shipped-semantics and original-semantics
(ib_time_constant off) FLOPs denominators, same definitions as
bench.py's mfu / mfu_effective.

Usage: python tools/bench_r5_levers.py [--case cylinder_flow] [--steps 10]
       [--repeats 3] [--batch 8]
"""

import argparse
import dataclasses
import importlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_timer(cfg, B, T, steps):
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    tx = make_optimizer(dataclasses.replace(
        TrainConfig(learning_rate=8e-5), adam_mu_dtype="bfloat16",
        compute_dtype="bfloat16_shadow"))
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jnp.broadcast_to(
        jax.random.normal(jax.random.fold_in(key, 2), (B, 1, cfg.ib_num)),
        (B, T, cfg.ib_num))

    compiled = {}

    def run(tag):
        # One compiled step per variant; flags are read at trace time.
        # The step donates (params, opt) — every run starts from FRESH
        # device copies so the shared originals are never donated away.
        if tag not in compiled:
            compiled[tag] = make_train_step(cfg, tx,
                                            compute_dtype="bfloat16_shadow")
        step = compiled[tag]
        p = jax.tree.map(jnp.array, params)
        o = jax.tree.map(jnp.array, opt)
        p, o, stats = step(p, o, src, tgt, ib, jax.random.PRNGKey(2))
        float(stats["loss"])  # compile (first time) + fence
        t0 = time.perf_counter()
        for i in range(steps):
            p, o, stats = step(p, o, src, tgt, ib,
                               jax.random.fold_in(key, 10 + i))
        float(stats["loss"])
        return (time.perf_counter() - t0) / steps * 1000

    def flops_refs():
        # Shared methodology with the driver bench (bench.flops_reference)
        # so the two artifacts' mfu_effective can never silently diverge.
        import bench
        return bench.flops_reference(cfg, tx, params, opt, src, tgt, ib)

    return run, flops_refs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cylinder_flow")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sea_tpu.ops.layers as L
    cfg = importlib.import_module(
        f"sea_tpu.configs.{args.case}").get_case().temporal
    T = 399 if args.case == "cylinder_flow" else 199
    if cfg.ln_type == "adaln":
        # Mirror the train driver: constant-ib datasets auto-enable the
        # cond hoist for AdaLN configs only.
        cfg = dataclasses.replace(cfg, ib_time_constant=True)
    run, flops_refs = make_timer(cfg, args.batch, T, args.steps)

    variants = {
        "baseline_no_levers": (False, False),
        "hash_dropout": (True, False),
        "fused_adaln": (False, True),
        "both_levers": (True, True),
    }
    times = {k: [] for k in variants}
    for _ in range(args.repeats):
        for name, (hd, fa) in variants.items():
            L.HASH_DROPOUT, L.FUSED_ADALN = hd, fa
            times[name].append(run(name))
    L.HASH_DROPOUT, L.FUSED_ADALN = True, True

    flops, flops_orig = flops_refs()
    from bench import _mxu_peak_tflops
    _, peak = _mxu_peak_tflops()
    out = {"case": args.case, "B": args.batch, "T": T,
           "steps": args.steps, "repeats": args.repeats,
           "device": jax.devices()[0].device_kind,
           "flops_shipped": flops, "flops_original": flops_orig}
    for name, ts in times.items():
        med = statistics.median(ts)
        out[name] = {
            "ms_median": round(med, 2),
            "ms_spread": [round(min(ts), 2), round(max(ts), 2)],
            "mfu": round(flops / (med / 1000) / peak, 3),
            "mfu_effective": round(flops_orig / (med / 1000) / peak, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
