"""Same-hardware A/B: scan+KV-cache rollout vs prefix-recompute rollout.

The reference's rollout (utils/train_utils.py:202-207) re-runs the full
model on the growing prefix each step. BASELINE.md's headline vs_baseline
ratios compare our TPU scan engine against that loop in PyTorch on this
machine's CPU (no GPU in the image), which conflates hardware and
architecture. This tool isolates the ARCHITECTURAL win by running both
rollout strategies on the SAME chip as compiled XLA:

- scan: rollout/engine.rollout_scan — one program, O(T) per-step work
  against KV caches.
- prefix: the reference's strategy with shapes bucketed to multiples of
  ``BUCKET`` so it compiles to a handful of programs (a fori_loop per
  bucket; step i runs a full forward on the first L >= i+1 positions —
  causality makes trailing garbage irrelevant to position i's output).
  Work is the reference's triangular sum rounded up per-bucket, so the
  measured prefix cost is within one bucket (<= +BUCKET/T, ~16% at
  T=399/B=64) of the reference's own schedule — NOT the 2x overstatement
  a pad-to-full-length loop would give.

Equivalence of the bucketed prefix loop to rollout_scan is asserted at a
small T before timing (same numerics modulo f32 reassociation).

Usage: python tools/bench_scan_vs_prefix.py [--case cylinder|multiphase]
Prints one JSON line with steps/sec for both engines and the ratio.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUCKET = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cylinder",
                    choices=["cylinder", "multiphase"])
    ap.add_argument("--dtype", default="f32",
                    choices=["f32", "bf16", "int8"],
                    help="weight precision for BOTH engines (serving modes)")
    ap.add_argument("--check", action="store_true",
                    help="equivalence check only (small T, any backend)")
    ap.add_argument("--batch", type=int, default=1,
                    help="trajectory batch B for both engines — sweeps "
                         "refine select_engine's PREFIX_MAX_BATCH "
                         "(scan amortizes its weight stream over B, so "
                         "the prefix win should close as B grows)")
    args = ap.parse_args()

    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import (rollout_jit,
                                        rollout_prefix_bucketed)

    if args.case == "cylinder":
        from sea_tpu.configs.cylinder_flow import get_case
        T = 399
    else:
        from sea_tpu.configs.multiphase_flow import get_case
        T = 250
    cfg = get_case().temporal

    # Equivalence at small T (always; it is cheap and guards the timing).
    import numpy as np
    from sea_tpu.configs.base import TemporalModelConfig
    ccfg = TemporalModelConfig(num_layers=1, embed_dim=32, n_heads=2,
                               block_size=64, scale_ratio=2, num_fields=2,
                               down_proj=2, dropout=0.1, exchange_mode="sea",
                               ib_scale_mode="mlp", ib_addition_mode="add",
                               ln_type="adaln")
    cp = init_temporal(jax.random.PRNGKey(0), ccfg)
    key = jax.random.PRNGKey(1)
    cx0 = jax.random.normal(key, (2, 2, 32))
    cib = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 1))
    got = np.asarray(rollout_prefix_bucketed(cp, ccfg, cx0, cib,
                                             bucket=BUCKET))
    want = np.asarray(rollout_jit(cp, ccfg, cx0, cib))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
    # Tolerance: on TPU, DEFAULT-precision f32 matmuls truncate operands to
    # bf16 on the MXU, and scan (per-step matvec) vs prefix (full-sequence
    # matmul) accumulate in different orders — ~1e-3 relative wiggle is
    # expected there. Exact-shape equivalence is pinned at 1e-4 on CPU by
    # tests/test_rollout.py; this run-time check only guards against logic
    # regressions before a long timing run.
    tol = 2e-2 if jax.default_backend() == "tpu" else 1e-4
    assert err < tol, f"bucketed prefix != scan (rel {err})"
    if args.check:
        print(json.dumps({"equivalence_rel_err": float(err)}))
        return

    params = init_temporal(jax.random.PRNGKey(0), cfg)
    if args.dtype == "bf16":
        from sea_tpu.utils.precision import cast_weights_bf16
        params = cast_weights_bf16(params)
    elif args.dtype == "int8":
        from sea_tpu.utils.precision import quantize_weights_int8
        params = quantize_weights_int8(params)
    B = args.batch
    x0 = jax.random.normal(key, (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))

    # Warm (compile) then time. One dispatch per bucket for prefix; the
    # per-dispatch tunnel RTT is ~20 ms x ~7 buckets = noise at these
    # multi-second runtimes.
    jax.block_until_ready(
        rollout_prefix_bucketed(params, cfg, x0, ib, bucket=BUCKET))
    t0 = time.perf_counter()
    jax.block_until_ready(
        rollout_prefix_bucketed(params, cfg, x0, ib, bucket=BUCKET))
    prefix_s = time.perf_counter() - t0

    jax.block_until_ready(rollout_jit(params, cfg, x0, ib))
    t0 = time.perf_counter()
    jax.block_until_ready(rollout_jit(params, cfg, x0, ib))
    scan_s = time.perf_counter() - t0

    print(json.dumps({
        "case": args.case, "T": T, "B": args.batch, "dtype": args.dtype,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "prefix_recompute_steps_per_sec": round(T / prefix_s, 3),
        "scan_kv_steps_per_sec": round(T / scan_s, 3),
        "scan_vs_prefix_on_chip": round(prefix_s / scan_s, 2),
        "bucket": BUCKET,
    }))


if __name__ == "__main__":
    main()
