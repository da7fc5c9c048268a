"""shard_map overhead A/B for the Pallas kernels (round-4 VERDICT item 1).

Measures, on the real chip, the flash-attention fwd+bwd and flash-decode
kernels dispatched (a) directly and (b) through a 1-device shard_map —
the wrapper the multi-device dispatch path uses (parallel/kernel_shard).
A 1-device mesh isolates the wrapper's own cost (partitioning overhead,
layout pinning) from any real-collective effects: "no regression" here
means the sharded dispatch path is free where it matters.

Note the PRODUCTION dispatch never wraps on 1 device
(attention_kernel_sharding is a no-op for mesh.size == 1); this tool
exists to bound the wrapper cost that multi-device programs pay.

Usage: python tools/bench_kernel_shard.py [--repeats 50]
Prints one JSON object with us/call for each (kernel, path) pair.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def _time(fn, args, repeats):
    def fence(out):
        # Host readback, not block_until_ready: the tunneled backend was
        # observed to under-fence block_until_ready (BASELINE.md round-4
        # ib_time_constant note) — a scalar readback is the reliable
        # completion barrier (same design as bench.py).
        return float(jax.tree.leaves(out)[0].ravel()[0])
    fence(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=50)
    args = ap.parse_args()
    bench._require_backend()

    cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sea_tpu.ops.decode_attention import decode_attention
    from sea_tpu.ops.dispatch import KernelSharding
    from sea_tpu.ops.flash_attention import flash_attention
    from sea_tpu.parallel.kernel_shard import (sharded_decode_attention,
                                               sharded_flash_attention)
    from sea_tpu.parallel.mesh import make_mesh

    mesh1 = make_mesh(1, 1)
    ctx = KernelSharding(mesh1)
    out = {}

    # Flash attention fwd+bwd at the cylinder training shape.
    B, T, H, hd = 8, 399, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, hd), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape)
    seed = jnp.asarray([3, 5], jnp.int32)

    @jax.jit
    def direct(q, k, v):
        f = lambda q, k, v: jnp.sum(flash_attention(
            q, k, v, causal=True, dropout_rate=0.1, dropout_seed=seed) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    @jax.jit
    def wrapped(q, k, v):
        f = lambda q, k, v: jnp.sum(sharded_flash_attention(
            ctx, q, k, v, causal=True, dropout_rate=0.1,
            dropout_seed=seed) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    out["flash_fwdbwd_direct_us"] = round(_time(direct, (q, k, v),
                                                args.repeats), 1)
    out["flash_fwdbwd_shardmap1_us"] = round(_time(wrapped, (q, k, v),
                                                   args.repeats), 1)

    # Flash-decode at the multiphase serving shape.
    B, H, T, hd = 8, 8, 256, 256
    qd = jax.random.normal(key, (B, H, hd), jnp.float32)
    ck = jax.random.normal(jax.random.fold_in(key, 3), (B, H, T, hd))
    cv = jax.random.normal(jax.random.fold_in(key, 4), (B, H, T, hd))
    t = jnp.int32(200)

    out["decode_direct_us"] = round(_time(
        jax.jit(lambda q, k, v: decode_attention(q, k, v, t)),
        (qd, ck, cv), args.repeats), 1)
    out["decode_shardmap1_us"] = round(_time(
        jax.jit(lambda q, k, v: sharded_decode_attention(ctx, q, k, v, t)),
        (qd, ck, cv), args.repeats), 1)

    out["flash_overhead_pct"] = round(
        100 * (out["flash_fwdbwd_shardmap1_us"]
               / out["flash_fwdbwd_direct_us"] - 1), 1)
    out["decode_overhead_pct"] = round(
        100 * (out["decode_shardmap1_us"] / out["decode_direct_us"] - 1), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
