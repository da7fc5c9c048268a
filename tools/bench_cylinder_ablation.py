"""Cylinder train-step component ablation (round-4 VERDICT item 5).

The cylinder recipe stalls at ~32% MFU while multiphase reaches ~46%;
the profile (tools/profile_train_step.py, /tmp window logs) shows the
time in linear-matmul fusions at ~25% GEMM efficiency, not in attention.
The cylinder/multiphase config deltas are AdaLN (vs plain LN), dropout
0.1 (vs 0), and T=399 (vs 199) — this tool times the SAME step with each
component ablated to attribute the gap, plus the stack_fields lever.

Ablations change the model (param count/semantics) — the timings
attribute COST, they are not drop-in recipes.

Usage: python tools/bench_cylinder_ablation.py [--batch 8] [--steps 10]
Prints one JSON object: ms/step per variant.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def time_step(cfg, B, T, steps):
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    tx = make_optimizer(dataclasses.replace(
        TrainConfig(learning_rate=8e-5), adam_mu_dtype="bfloat16",
        compute_dtype="bfloat16_shadow"))
    step = make_train_step(cfg, tx, compute_dtype="bfloat16_shadow")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    params, opt, stats = step(params, opt, src, tgt, ib,
                              jax.random.PRNGKey(2))
    float(stats["loss"])  # compile + fence
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, stats = step(params, opt, src, tgt, ib,
                                  jax.random.fold_in(key, 10 + i))
    float(stats["loss"])
    return (time.perf_counter() - t0) / steps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    bench._require_backend()
    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sea_tpu.configs.cylinder_flow import get_case
    base = get_case().temporal
    B, T = args.batch, 399
    variants = {
        "shipped": base,
        "ln_instead_of_adaln": dataclasses.replace(base, ln_type="ln"),
        "no_dropout": dataclasses.replace(base, dropout=0.0),
        "stack_fields": dataclasses.replace(base, stack_fields=True),
        "ln_and_stack": dataclasses.replace(base, ln_type="ln",
                                            stack_fields=True),
    }
    out = {}
    for name, cfg in variants.items():
        ms = time_step(cfg, B, T, args.steps)
        out[f"{name}_ms"] = round(ms, 2)
        print(f"# {name}: {ms:.2f} ms/step", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
