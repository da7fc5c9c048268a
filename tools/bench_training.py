"""Training-step throughput bench (temporal stage) with MFU/roofline.

Measures the jitted teacher-forced train step (fwd+bwd+AdamW) at the
shipped configurations on the default device:

  --case multiphase   E=2048, T=199, dropout 0
  --case cylinder     E=1024, T=399, dropout 0.1 (attention-prob dropout
                      runs in the Pallas kernel via mha auto-dispatch)
  --impl auto|xla     xla disables the flash kernel (A/B baseline)
  --dtype f32|bf16    compute dtype policy for the step

MFU/roofline: FLOPs and HBM bytes come from XLA's compiled cost analysis;
achieved FLOP/s is reported against the v5e bf16 MXU peak (197 TFLOP/s)
and bytes/s against HBM peak (819 GB/s). Pallas kernel internals are
opaque to XLA's cost model, so for --impl auto the FLOPs are taken from
the equivalent --impl xla compile (same math).

Prints one JSON line. Not wired into the driver's bench.py (rollout stays
the headline); run manually on the chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip
V5E_HBM_BPS = 819e9


def build_spatial(case_name, dtype, batch=None, log_norms=True,
                  mu_dtype="float32", optimizer="adamw", n_inp=64):
    """Stage-1 (encoder/decoder) train step at the shipped model size.

    The real cells-per-patch C comes from the dataset's partition
    occupancy; the bench uses a representative --n_inp (default 64,
    same order as the reference meshes') so the step is measurable
    without data. B defaults to the shipped batch_size=128."""
    import dataclasses
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_spatial import make_train_step

    if case_name == "multiphase":
        from sea_tpu.configs.multiphase_flow import get_case
    else:
        from sea_tpu.configs.cylinder_flow import get_case
    case = get_case()
    cfg = case.spatial.with_n_inp(n_inp)
    B = batch or case.spatial_train.batch_size
    P = case.mesh.num_patches
    from sea_tpu.utils.precision import POLICY_BY_FLAG
    policy = POLICY_BY_FLAG[dtype]
    tx = make_optimizer(dataclasses.replace(
        TrainConfig(learning_rate=1e-4), adam_mu_dtype=mu_dtype,
        compute_dtype=policy, optimizer=optimizer))
    step = make_train_step(cfg, tx, compute_dtype=policy,
                           log_norms=log_norms)
    return cfg, step, tx, B, P


def build(case_name, impl, dtype, batch=None, log_norms=True,
          mu_dtype="float32", remat=False, optimizer="adamw",
          stack_fields=False):
    import dataclasses
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    if case_name == "multiphase":
        from sea_tpu.configs.multiphase_flow import get_case
        B, T = 4, 199
    else:
        from sea_tpu.configs.cylinder_flow import get_case
        B, T = 4, 399
    if batch:
        B = batch
    cfg = get_case().temporal
    if remat:
        cfg = dataclasses.replace(cfg, remat=remat)
    if stack_fields:
        cfg = dataclasses.replace(cfg, stack_fields=True)
    from sea_tpu.utils.precision import POLICY_BY_FLAG
    policy = POLICY_BY_FLAG[dtype]
    tx = make_optimizer(dataclasses.replace(
        TrainConfig(learning_rate=8e-5), adam_mu_dtype=mu_dtype,
        compute_dtype=policy, optimizer=optimizer))
    step = make_train_step(cfg, tx, compute_dtype=policy,
                           log_norms=log_norms)
    return cfg, step, tx, B, T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["multiphase", "cylinder"],
                    default="multiphase")
    ap.add_argument("--impl", choices=["auto", "xla"], default="auto")
    ap.add_argument("--dtype",
                    choices=["f32", "bf16", "bf16_mixed", "bf16_shadow"],
                    default="f32")
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch size (default 4; the 201M-param "
                         "multiphase model amortizes its fixed AdamW-state "
                         "traffic over more tokens at larger B)")
    ap.add_argument("--no_norms", action="store_true",
                    help="disable per-step grad/param norm observability "
                         "(TrainConfig.log_norms=False)")
    ap.add_argument("--mu", choices=["f32", "bf16"], default="f32",
                    help="AdamW first-moment dtype "
                         "(TrainConfig.adam_mu_dtype)")
    ap.add_argument("--opt", choices=["adamw", "adafactor"],
                    default="adamw",
                    help="optimizer family (TrainConfig.optimizer); "
                         "adafactor shrinks optimizer-state HBM traffic "
                         "to ~zero (factored nu, no mu)")
    ap.add_argument("--remat", nargs="?", const="full",
                    choices=["full", "dots"], default=None,
                    help="rematerialize the temporal blocks in the bwd "
                         "pass (TemporalModelConfig.remat). 'full' (also "
                         "the bare-flag value) recomputes everything; "
                         "'dots' saves matmul outputs and recomputes only "
                         "the elementwise interiors — targets activation "
                         "HBM traffic, the dominant term at B>=8")
    ap.add_argument("--stack", action="store_true",
                    help="stack_fields: batch the per-field LN->MLP->proj "
                         "tail into one vmapped einsum over G "
                         "(TemporalModelConfig.stack_fields A/B)")
    ap.add_argument("--stage", choices=["temporal", "spatial"],
                    default="temporal",
                    help="which training stage to bench; spatial = the "
                         "stage-1 encoder/decoder step at the shipped "
                         "model size (see --n_inp)")
    ap.add_argument("--n_inp", type=int, default=64,
                    help="spatial stage only: cells per patch C (data-"
                         "derived in real runs; 64 is representative)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the session env rewrites "
                         "JAX_PLATFORMS, so only jax.config sticks) — for "
                         "smoke runs; real numbers come from the TPU")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.stage == "spatial":
        _main_spatial(args)
        return

    import sea_tpu.ops.flash_attention as _fa
    real_flash_supported = _fa.flash_supported
    if args.impl == "xla":
        _fa.flash_supported = lambda *a, **k: False

    from sea_tpu.models.temporal import init_temporal

    mu_dtype = "bfloat16" if args.mu == "bf16" else "float32"
    cfg, step, tx, B, T = build(args.case, args.impl, args.dtype,
                                batch=args.batch,
                                log_norms=not args.no_norms,
                                mu_dtype=mu_dtype, remat=args.remat,
                                optimizer=args.opt,
                                stack_fields=args.stack)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)

    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))

    def cost_of(a_step):
        compiled = a_step.lower(params, opt_state, src, tgt, ib,
                                jax.random.PRNGKey(2)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))

    # Cost analysis from the compiled step (XLA view of the math). step is
    # already jitted — lower() through it so this IS the compile the timed
    # calls reuse (no duplicate compilation). Pallas kernel internals are
    # opaque to cost_analysis, so for --impl auto the FLOPs come from a
    # separate forced-XLA compile of the same math (the timed step is
    # still the auto one).
    try:
        flops, nbytes = cost_of(step)
        if args.impl == "auto" or args.remat:
            # MFU uses MODEL flops: a forced-XLA, remat-off compile of the
            # same math (Pallas internals are opaque; remat would count
            # the recompute). The timed step's bytes are kept.
            _fa.flash_supported = lambda *a, **k: False
            try:
                # Must mirror the timed step's optimizer/mu exactly: the
                # lowering reuses the SAME opt_state pytree, so a
                # different optimizer family would fail to trace.
                _, xla_step, _, _, _ = build(args.case, "xla", args.dtype,
                                             batch=args.batch,
                                             log_norms=not args.no_norms,
                                             mu_dtype=mu_dtype,
                                             optimizer=args.opt)
                flops, _ = cost_of(xla_step)  # keep the auto-step bytes
            finally:
                # --impl xla must stay disabled through the TIMED loop
                # below: lower().compile() does not seed the jit cache,
                # so the first timed call re-traces and would otherwise
                # pick the flash path back up.
                if args.impl != "xla":
                    _fa.flash_supported = real_flash_supported
    except Exception:
        flops = nbytes = 0.0

    # Compile + first step. NOTE: on the tunneled backend
    # block_until_ready returns early; a host readback (float()) is the
    # only reliable sync. The final step's loss depends on all prior
    # steps' params, so one readback fences the whole loop.
    params, opt_state, stats = step(params, opt_state, src, tgt, ib,
                                    jax.random.PRNGKey(2))
    float(stats["loss"])

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, stats = step(params, opt_state, src, tgt, ib,
                                        jax.random.fold_in(key, 10 + i))
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / n

    tokens = B * T * cfg.num_fields
    out = {
        "metric": f"{args.case}_temporal_train_step",
        "impl": args.impl,
        "dtype": args.dtype,
        "mu": args.mu,
        "opt": args.opt,
        "remat": args.remat,
        "B": B, "T": T,
        "ms_per_step": round(dt * 1000, 2),
        "tokens_per_sec": round(tokens / dt),
        "loss": float(stats["loss"]),
    }
    if flops:
        out["model_tflops_per_step"] = round(flops / 1e12, 3)
        out["achieved_tflops_per_sec"] = round(flops / dt / 1e12, 2)
        out["mfu_vs_v5e_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS, 4)
        out["hbm_gb_per_step"] = round(nbytes / 1e9, 2)
        out["hbm_util_vs_peak"] = round(nbytes / dt / V5E_HBM_BPS, 4)
    print(json.dumps(out))


def _main_spatial(args):
    from sea_tpu.models.spatial import init_spatial

    mu_dtype = "bfloat16" if args.mu == "bf16" else "float32"
    cfg, step, tx, B, P = build_spatial(args.case, args.dtype,
                                        batch=args.batch,
                                        log_norms=not args.no_norms,
                                        mu_dtype=mu_dtype,
                                        optimizer=args.opt,
                                        n_inp=args.n_inp)
    params = init_spatial(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    batch = jax.random.normal(jax.random.PRNGKey(1),
                              (B, P, cfg.num_fields, args.n_inp))
    it = jnp.zeros(())

    def cost_of(a_step):
        compiled = a_step.lower(params, opt_state, batch,
                                jax.random.PRNGKey(2), it).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))

    try:
        flops, nbytes = cost_of(step)
    except Exception:
        flops = nbytes = 0.0

    params, opt_state, stats = step(params, opt_state, batch,
                                    jax.random.PRNGKey(2), it)
    float(stats["loss"])  # tunneled-backend fence (see temporal path)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, stats = step(params, opt_state, batch,
                                        jax.random.PRNGKey(10 + i), it)
    float(stats["loss"])
    dt = (time.perf_counter() - t0) / n

    out = {
        "metric": f"{args.case}_spatial_train_step",
        "dtype": args.dtype, "mu": args.mu, "opt": args.opt,
        "B": B, "P": P, "n_inp": args.n_inp,
        "ms_per_step": round(dt * 1000, 2),
        "snapshots_per_sec": round(B / dt),
        "loss": float(stats["loss"]),
    }
    if flops:
        out["model_tflops_per_step"] = round(flops / 1e12, 4)
        out["achieved_tflops_per_sec"] = round(flops / dt / 1e12, 2)
        out["mfu_vs_v5e_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS, 4)
        out["hbm_gb_per_step"] = round(nbytes / 1e9, 3)
        out["hbm_util_vs_peak"] = round(nbytes / dt / V5E_HBM_BPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
