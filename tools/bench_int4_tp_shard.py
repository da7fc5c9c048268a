"""int4 TP decomposition: on-TPU per-shard kernel no-regression check.

Multi-chip hardware is not available on this host, so the TP'd int4
serving path (parallel/kernel_shard.sharded_int4_matmul_tp; equality
pinned in interpret mode on the virtual mesh) is evidenced on the real
chip by timing each device's LOCAL work: the packed-nibble kernel on the
col-shard (w[:, N/nm]) and row-shard (w[K/2/nm, :] with the paired x
slices) of the shipped serving matrices, vs the full unsharded kernel
and the XLA dequant fallback that TP'd weights used to take (round-4
VERDICT item 5). If per-shard achieved GB/s tracks the full kernel's,
the measured 1.29x kernel-vs-XLA win survives --mesh DxM serving
(the row path adds one psum on a [B, N] activation — noise next to the
weight stream).

Usage: python tools/bench_int4_tp_shard.py [--nm 2,4] [--b 1]
Prints one JSON object of achieved GB/s per leg.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def gbps(fn, x, wp, s, *, iters=30):
    y = jax.block_until_ready(fn(x, wp, s))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x, wp, s)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    return wp.size / dt / 1e9  # packed bytes streamed per call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nm", default="2,4")
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--shapes", default="1024x8192,8192x1024")
    args = ap.parse_args()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sea_tpu.ops.quant_matmul as qm

    out = {"B": args.b, "device": jax.devices()[0].device_kind}
    key = jax.random.PRNGKey(0)
    kern = jax.jit(lambda x, wp, s: qm.int4_matmul(x, wp, s,
                                                   force="kernel"))
    xla = jax.jit(lambda x, wp, s: qm.int4_matmul(x, wp, s, force="jnp"))
    for shape in args.shapes.split(","):
        K, N = map(int, shape.split("x"))
        qw = jax.random.randint(jax.random.fold_in(key, K + N), (K, N),
                                -8, 8, jnp.int8)
        wp = qm.pack_int4(qw)
        s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1),
                                      (N,))) + 0.1
        x = jax.random.normal(jax.random.fold_in(key, 2),
                              (args.b, K)).astype(jnp.bfloat16)
        tag = f"{K}x{N}"
        out[f"{tag}_full_kernel_gbps"] = round(gbps(kern, x, wp, s), 1)
        out[f"{tag}_full_xla_gbps"] = round(gbps(xla, x, wp, s), 1)
        for nm in map(int, args.nm.split(",")):
            # col shard: contiguous output columns.
            wp_c, s_c = wp[:, : N // nm], s[: N // nm]
            out[f"{tag}_colshard{nm}_kernel_gbps"] = round(
                gbps(kern, x, wp_c, s_c), 1)
            # row shard: first K/(2 nm) packed rows pair with x's lo/hi
            # slices (the shard_map body's local view).
            k2l = K // (2 * nm)
            wp_r = wp[:k2l]
            x_r = jnp.concatenate([x[:, :k2l], x[:, K // 2:K // 2 + k2l]],
                                  axis=1)
            out[f"{tag}_rowshard{nm}_kernel_gbps"] = round(
                gbps(kern, x_r, wp_r, s), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
