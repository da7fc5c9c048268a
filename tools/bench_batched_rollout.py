"""Batched serving rollout A/B (aggregate trajectory-steps/s).

Re-measures the batched serving rows with the flash-decode kernel in the
dispatch mix (ops/decode_attention.py): the round-3 batched numbers
(BASELINE.md "Batched int4 rollout") predate the kernel, whose
``decode_supported`` gate (B * n_heads <= 64) admits B<=8 for both
shipped cases (H=8). Methodology is bench.py's bench_rollout verbatim
(REPEATS rollouts inside one jitted lax.map, single scalar readback,
distinct warm/timed stacks) with BATCH swept; SEA_TPU_DECODE_KERNEL=0
gives the no-kernel leg of the A/B.

Usage:
    python tools/bench_batched_rollout.py [--batches 4,8] \
        [--dtypes int4,bf16] [--cases multiphase_flow,cylinder_flow]

Prints one JSON object: {case}_{dtype}_B{b}: [agg_steps_per_s, wall_steps_per_s].
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8")
    ap.add_argument("--dtypes", default="int4,bf16")
    ap.add_argument("--cases", default="multiphase_flow,cylinder_flow")
    ap.add_argument("--kv", default="auto",
                    help="comma list of KV-cache dtypes to A/B: auto "
                         "(measured policy), f32, bf16, int8 (per-token-"
                         "scaled planes — targets the cache-bound batched "
                         "regime)")
    args = ap.parse_args()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A wedged tunnel otherwise hangs the sweep forever with no output —
    # the exact failure bench.py's watchdog exists for.
    bench._require_backend()

    import importlib
    STEPS = {"multiphase_flow": 250, "cylinder_flow": 399}
    out = {}
    kb = 40
    for case in args.cases.split(","):
        if case not in STEPS:
            sys.exit(f"unknown case {case!r} (expected one of {sorted(STEPS)})")
        mod = importlib.import_module(f"sea_tpu.configs.{case}")
        cfg = mod.get_case().temporal
        steps = STEPS[case]
        import jax.numpy as jnp
        kv_map = {"auto": None, "f32": jnp.float32, "bf16": jnp.bfloat16,
                  "int8": jnp.int8}
        for dtype in args.dtypes.split(","):
            for kv in args.kv.split(","):
                if kv not in kv_map:
                    sys.exit(f"unknown --kv {kv!r} "
                             f"(expected one of {sorted(kv_map)})")
                bench.CACHE_DTYPE = kv_map[kv]
                tag = "" if kv == "auto" else f"_kv{kv}"
                for b in (int(x) for x in args.batches.split(",")):
                    bench.BATCH = b
                    kb += 1
                    sps, _ = bench.bench_rollout(cfg, steps, dtype=dtype,
                                                 key_base=kb)
                    out[f"{case}_{dtype}{tag}_B{b}"] = [int(round(sps * b)),
                                                        round(sps, 1)]
                    print(f"# {case} {dtype}{tag} B={b}: {sps * b:.0f} agg "
                          f"({sps:.1f} wall) steps/s", file=sys.stderr)
        bench.CACHE_DTYPE = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
