"""Focused re-measurement of the int4 serving rollouts (kernel path).

Same methodology as bench.py's bench_rollout (REPEATS rollouts inside
one jitted lax.map, single scalar readback, fresh input stacks for the
timed call), restricted to the two int4 rows so the two-tier
packed-nibble kernel path (ops/quant_matmul.py) can be pinned with
exact numbers for BASELINE.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sea_tpu.configs.cylinder_flow import get_case as cyl_case
    from sea_tpu.configs.multiphase_flow import get_case as mp_case

    out = {}
    mp, _ = bench.bench_rollout(mp_case().temporal, 250, dtype="int4",
                                key_base=6)
    out["multiphase_int4w_steps_per_sec"] = round(mp, 1)
    cyl, _ = bench.bench_rollout(cyl_case().temporal, 399, dtype="int4",
                                 key_base=7)
    out["cylinder_int4w_steps_per_sec"] = round(cyl, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
