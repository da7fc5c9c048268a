"""A/B the fused flash-decode kernel (ops/decode_attention.py) on the
serving rollouts.

Same methodology as bench.py's bench_rollout (REPEATS rollouts in one
jitted lax.map, one scalar readback, distinct warm/timed stacks). The
kernel dispatch is trace-time (SEA_TPU_DECODE_KERNEL env read inside
decode_supported) and every bench_rollout call builds a fresh jit, so
flipping the env var between calls inside one process is a valid A/B.

Usage:  python tools/bench_decode_kernel.py [--dtypes f32,bf16,int4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


CASES = [
    ("multiphase", 250),
    ("cylinder", 399),
]


def get_cfg(name):
    if name == "multiphase":
        from sea_tpu.configs.multiphase_flow import get_case
    else:
        from sea_tpu.configs.cylinder_flow import get_case
    return get_case().temporal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="f32,bf16,int4")
    args = ap.parse_args()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {}
    kb = 20
    for case, steps in CASES:
        cfg = get_cfg(case)
        for dtype in args.dtypes.split(","):
            for kernel in ("0", "1"):
                os.environ["SEA_TPU_DECODE_KERNEL"] = kernel
                sps, _ = bench.bench_rollout(cfg, steps, dtype=dtype,
                                             key_base=kb)
                kb += 1
                tag = f"{case}_{dtype}_{'kernel' if kernel == '1' else 'xla'}"
                out[tag] = round(sps, 1)
                print(f"{tag}: {sps:.1f} steps/s", flush=True)
    os.environ.pop("SEA_TPU_DECODE_KERNEL", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
