"""Flash-attention kernel bench vs the XLA path on the real chip.

Shapes: [2, 2048, 8, 128] causal (the VERDICT target shape). Respects the
tunnel quirks: distinct inputs per repeat, all repeats inside one jitted
lax.map dispatch, single scalar readback.

Prints one JSON line with fwd and fwd+bwd times for pallas vs XLA, plus
the dropout-enabled pallas numbers (in-kernel mask).
"""

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B, T, H, HD = 2, 2048, 8, 128
REPEATS = 8  # default; raise via --repeats for small shapes, where the
# ~20 ms tunnel RTT per dispatch would otherwise dominate (floor =
# RTT/repeats per call even with all repeats inside one dispatch).
# Shipped train shapes: cylinder [4,399,8,128] (E=1024/8 heads),
# multiphase [4,199,8,256] (E=2048/8 heads).
SHAPES = {"verdict": (2, 2048, 8, 128), "cylinder": (4, 399, 8, 128),
          "multiphase": (4, 199, 8, 256)}


def timeit(fn, stacks, repeats):
    @jax.jit
    def run_many(qs, ks, vs, gs):
        return jax.lax.map(lambda x: fn(*x), (qs, ks, vs, gs)).sum()

    warm = tuple(s[1:] for s in stacks)
    timed = tuple(s[:repeats] for s in stacks)
    float(run_many(*warm))
    t0 = time.perf_counter()
    float(run_many(*timed))
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=sorted(SHAPES), default="verdict")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--block_q", type=int, default=None)
    ap.add_argument("--block_k", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=REPEATS)
    args = ap.parse_args()
    from sea_tpu.ops.flash_attention import (DEFAULT_BLOCK_K,
                                             DEFAULT_BLOCK_Q,
                                             flash_attention, _xla_attention)
    B, T, H, HD = SHAPES[args.shape]
    # Defaults uncl clamped: the kernel pads T up to a block multiple, so
    # T=399 with block 512 is one padded block (block sizes must stay
    # hardware-tiled; T itself need not divide them).
    bq = args.block_q or DEFAULT_BLOCK_Q
    bk = args.block_k or DEFAULT_BLOCK_K
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    key = jax.random.PRNGKey(0)
    mk = lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                     (args.repeats + 1, B, T, H, HD)).astype(dt)
    stacks = (mk(1), mk(2), mk(3), mk(4))
    seed = jnp.asarray([3, 5], jnp.int32)

    flash = functools.partial(flash_attention, causal=True, src_len=0,
                              block_q=bq, block_k=bk)
    flash_do = functools.partial(flash_attention, causal=True, src_len=0,
                                 block_q=bq, block_k=bk,
                                 dropout_rate=0.1, dropout_seed=seed)
    xla = functools.partial(_xla_attention, causal=True, src_len=0)

    def fwd(f):
        return lambda q, k, v, g: f(q, k, v).sum()

    def fwdbwd(f):
        def run(q, k, v, g):
            out, vjp = jax.vjp(lambda q, k, v: f(q, k, v), q, k, v)
            return sum(x.sum() for x in vjp(g))
        return run

    res = {
        "shape": [B, T, H, HD], "dtype": args.dtype,
        "block": [bq, bk],
        "pallas_fwd_ms": round(timeit(fwd(flash), stacks, args.repeats), 3),
        "xla_fwd_ms": round(timeit(fwd(xla), stacks, args.repeats), 3),
        "pallas_fwdbwd_ms": round(timeit(fwdbwd(flash), stacks, args.repeats), 3),
        "xla_fwdbwd_ms": round(timeit(fwdbwd(xla), stacks, args.repeats), 3),
        "pallas_dropout_fwdbwd_ms": round(timeit(fwdbwd(flash_do), stacks,
                                                 args.repeats), 3),
    }
    res["fwd_speedup"] = round(res["xla_fwd_ms"] / res["pallas_fwd_ms"], 2)
    res["fwdbwd_speedup"] = round(res["xla_fwdbwd_ms"]
                                  / res["pallas_fwdbwd_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
