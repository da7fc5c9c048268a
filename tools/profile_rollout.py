"""Per-op device-time breakdown of the scan rollout (serving path).

bench.py shows the B=1 int4 rollout streams ~100 MB of weights per step
but achieves only ~39% of HBM peak, while bf16w runs at 77% — this tool
answers WHERE the extra per-step time goes (dequant materialization?
small-op overhead? cache updates?) before any kernel work is attempted.

Captures a jax.profiler device trace around ONE jitted rollout (a single
lax.scan program covering all T steps) and prints the same
framework-op-stats rollup as profile_train_step.py, normalized per
rollout step.

Usage: python tools/profile_rollout.py [--case multiphase|cylinder]
       [--dtype f32|bf16|int8|int4] [--steps 250]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_train_step import summarize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["multiphase", "cylinder"],
                    default="multiphase")
    ap.add_argument("--dtype", choices=["f32", "bf16", "int8", "int4"],
                    default="int4")
    ap.add_argument("--steps", type=int, default=None,
                    help="rollout length (default: 250 mp / 399 cyl)")
    ap.add_argument("--cache", choices=["policy", "f32", "bf16"],
                    default="policy",
                    help="KV-cache dtype (policy = bf16 for int4 only)")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.case == "multiphase":
        from sea_tpu.configs.multiphase_flow import get_case
        steps = args.steps or 250
    else:
        from sea_tpu.configs.cylinder_flow import get_case
        steps = args.steps or 399
    cfg = get_case().temporal

    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan
    from sea_tpu.utils.precision import (cast_weights_bf16,
                                         quantize_weights_int4,
                                         quantize_weights_int8)

    from sea_tpu.utils.precision import fuse_attention_projections

    params = init_temporal(jax.random.PRNGKey(0), cfg)
    # mirror the serving surfaces: reduced precision fuses qkv/kv
    if args.dtype == "bf16":
        params = cast_weights_bf16(fuse_attention_projections(params))
    elif args.dtype == "int8":
        params = quantize_weights_int8(fuse_attention_projections(params))
    elif args.dtype == "int4":
        params = quantize_weights_int4(fuse_attention_projections(params))

    if args.cache == "policy":
        cache_dtype = jnp.bfloat16 if args.dtype == "int4" else jnp.float32
    else:
        cache_dtype = jnp.bfloat16 if args.cache == "bf16" else jnp.float32

    @jax.jit
    def run(p, x0, ib):
        return rollout_scan(p, cfg, x0, ib, cache_dtype=cache_dtype).sum()

    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(key, (1, cfg.num_fields, cfg.embed_dim))
    ib0 = jax.random.normal(jax.random.fold_in(key, 1), (1, steps, cfg.ib_num))
    ib1 = jax.random.normal(jax.random.fold_in(key, 2), (1, steps, cfg.ib_num))
    float(run(params, x0, ib0))  # compile + warm

    logdir = args.logdir or tempfile.mkdtemp(prefix="seatpu_rollprof_")
    with jax.profiler.trace(logdir):
        sink = float(run(params, x0, ib1))  # host readback = fence
    assert sink == sink
    print(f"case={args.case} dtype={args.dtype} steps={steps} "
          f"cache={cache_dtype.__name__}")
    summarize(logdir, steps)


if __name__ == "__main__":
    main()
