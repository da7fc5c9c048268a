"""Ring attention memory evidence (round-4 VERDICT item 6).

Compiles ring_attention at long T on a 1-device 'seq' mesh (the
single-chip sanity configuration — multi-chip hardware is not available
on this host) for both ring bodies and reports the compiled executable's
memory analysis:

- impl=dense: the per-pair [B, H, Tl, Tk] score block materializes in
  XLA — at T=8192 that buffer alone is B*H*T*T*4 bytes of temp memory.
- impl=flash: scores only ever exist as Pallas VMEM tiles; temp memory
  stays O(T).

Also executes the flash ring once (sanity: runs, finite) and, with
--check, verifies it against the plain flash kernel at the same T.

Usage: python tools/measure_ring_memory.py [--t 8192] [--b 1] [--h 2]
       [--hd 128] [--check]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8192)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--run", action="store_true",
                    help="also execute the flash ring once (default: "
                         "compile-only memory analysis)")
    args = ap.parse_args()
    if args.check:
        args.run = True  # verification requires executing the flash ring

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    from sea_tpu.parallel.ring_attention import ring_attention
    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("seq",))
    B, T, H, hd = args.b, args.t, args.heads, args.hd
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, hd), jnp.float32)

    out = {"B": B, "T": T, "H": H, "hd": hd,
           "backend": jax.default_backend(),
           "score_buffer_bytes_dense_would_need": B * H * T * T * 4}
    for impl in ("dense", "flash"):
        fn = jax.jit(lambda q, k, v, impl=impl: ring_attention(
            q, k, v, mesh, causal=True, src_len=0, impl=impl))
        try:
            compiled = fn.lower(q, q, q).compile()
            ma = compiled.memory_analysis()
            out[f"{impl}_temp_bytes"] = int(
                getattr(ma, "temp_size_in_bytes", -1))
            out[f"{impl}_peak_hint_bytes"] = int(
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0))
        except Exception as exc:
            out[f"{impl}_error"] = repr(exc)[:200]

    if args.run:
        y = jax.jit(lambda q, k, v: ring_attention(
            q, k, v, mesh, causal=True, src_len=0, impl="flash"))(q, q, q)
        out["flash_ring_finite"] = bool(jnp.isfinite(y).all())
        if args.check:
            from sea_tpu.ops.flash_attention import flash_attention
            ref = flash_attention(q, q, q, causal=True, src_len=0)
            err = float(jnp.max(jnp.abs(y - ref)))
            out["flash_ring_vs_flash_max_abs"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
