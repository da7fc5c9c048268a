"""Microbench: candidates for the B=1 serving matvec (the rollout hot op).

tools/profile_rollout.py shows the int4 rollout step spends ~180 us of
~290 us in XLA's dequant-matvec loop fusions running at ~500 GB/s — 61%
of v5e HBM peak. This bench A/Bs, at the multiphase MLP shape
[2048 -> 16384]:

  xla_int4   — the shipped path: x @ wq(int4).astype(bf16) * s
  xla_int8   — same with int8 weights
  pallas_p4  — Pallas kernel over uint8-PACKED nibbles (two int4 along
               the input dim per byte: lo=w[:K/2], hi=w[K/2:]), unpack
               in-register, two bf16 dots, f32 accumulate
  pallas_s8  — same kernel structure for int8 weights (no unpack)
  stream     — pure byte-stream reduce kernel = achievable roofline

Methodology matches bench.py: R sequential iterations inside ONE jitted
lax.scan whose carry feeds the next step's activation (prevents XLA from
hoisting the dequant out of the loop the way the real rollout can't),
one scalar readback, min over trials.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pack_nibbles(q):
    """q: int8 [K, N] in [-7,7] -> uint8 [K//2, N]; lo nibble = rows
    [:K/2], hi nibble = rows [K/2:] (contiguous x slices at unpack)."""
    K = q.shape[0]
    lo = (q[: K // 2] & 0xF).astype(jnp.uint8)
    hi = (q[K // 2 :] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def _mv_p4_kernel(x_ref, wp_ref, s_ref, o_ref):
    wp = wp_ref[:].astype(jnp.int32)
    lo = (((wp & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    hi = (((wp >> 4) ^ 8) - 8).astype(jnp.bfloat16)
    K2 = wp.shape[0]
    xlo = x_ref[:, :K2]
    xhi = x_ref[:, K2:]
    acc = (jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
           + jnp.dot(xhi, hi, preferred_element_type=jnp.float32))
    o_ref[:] = acc * s_ref[:]


def matvec_p4(x, wp, s, *, block_n: int):
    """x: [B, K] bf16; wp: uint8 [K//2, N]; s: f32 [1, N] -> [B, N] f32."""
    B, K = x.shape
    N = wp.shape[1]
    return pl.pallas_call(
        _mv_p4_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0)),
            pl.BlockSpec((K // 2, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, wp, s)


def _mv_p4b_kernel(x_ref, wp_ref, s_ref, o_ref):
    # int8-granularity unpack: arithmetic shifts at byte width use 4x
    # more VPU lanes per op than the int32 path in _mv_p4_kernel
    w8 = jax.lax.bitcast_convert_type(wp_ref[:], jnp.int8)
    lo = ((w8 << 4) >> 4).astype(jnp.bfloat16)   # sign-extend low nibble
    hi = (w8 >> 4).astype(jnp.bfloat16)          # arithmetic shift: signed
    K2 = w8.shape[0]
    acc = (jnp.dot(x_ref[:, :K2], lo, preferred_element_type=jnp.float32)
           + jnp.dot(x_ref[:, K2:], hi, preferred_element_type=jnp.float32))
    o_ref[:] = acc * s_ref[:]


def matvec_p4b(x, wp, s, *, block_n: int):
    B, K = x.shape
    N = wp.shape[1]
    return pl.pallas_call(
        _mv_p4b_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0)),
            pl.BlockSpec((K // 2, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, wp, s)


def _mv_p4c_kernel(x_ref, wp_ref, s_ref, o_ref):
    # Minimal-VPU unpack (only i8 AND/XOR + i8->bf16 converts legalize
    # on this Mosaic): lo' = (w&0xF)^8 = lo+8; the -8 becomes a rank-1
    # correction using sum(x_lo). hi: (w&0xF0) as int8 IS 16*hi (two's
    # complement), and the /16 is pre-folded into x_hi by the caller.
    w8 = jax.lax.bitcast_convert_type(wp_ref[:], jnp.int8)
    lo_p8 = ((w8 & 0xF) ^ 8).astype(jnp.bfloat16)   # lo + 8
    hi16 = (w8 & (-16)).astype(jnp.bfloat16)        # 16 * hi
    K2 = w8.shape[0]
    xlo = x_ref[:, :K2]
    xhi16 = x_ref[:, K2:]                            # caller pre-divided /16
    acc = (jnp.dot(xlo, lo_p8, preferred_element_type=jnp.float32)
           + jnp.dot(xhi16, hi16, preferred_element_type=jnp.float32))
    corr = 8.0 * jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc - corr) * s_ref[:]


def matvec_p4c(x, wp, s, *, block_n: int):
    B, K = x.shape
    N = wp.shape[1]
    xs = jnp.concatenate([x[:, : K // 2],
                          x[:, K // 2 :] * (1.0 / 16.0)], axis=1)
    return pl.pallas_call(
        _mv_p4c_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0)),
            pl.BlockSpec((K // 2, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(xs, wp, s)


def _mv_s8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(x_ref[:], w,
                       preferred_element_type=jnp.float32) * s_ref[:]


def matvec_s8(x, w8, s, *, block_n: int):
    B, K = x.shape
    N = w8.shape[1]
    return pl.pallas_call(
        _mv_s8_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, w8, s)


def _stream_kernel(w_ref, o_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.sum(w_ref[:].astype(jnp.int32), axis=0,
                        keepdims=True).astype(jnp.float32)


def stream_bytes(wp, *, block_n: int):
    K, N = wp.shape
    return pl.pallas_call(
        _stream_kernel,
        grid=(N // block_n,),
        in_specs=[pl.BlockSpec((K, block_n), lambda j: (0, j))],
        out_specs=pl.BlockSpec((1, block_n), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, block_n), jnp.float32),
    )(wp)


def _dma_only_kernel(w_ref, o_ref):
    # touch one row: the BlockSpec pipeline still DMAs the full block
    # (uint8 -> f32 isn't a supported Mosaic cast; hop through int32)
    o_ref[:] = w_ref[0:1, :].astype(jnp.int32).astype(jnp.float32)


def dma_only(wp, *, block_n: int):
    K, N = wp.shape
    return pl.pallas_call(
        _dma_only_kernel,
        grid=(N // block_n,),
        in_specs=[pl.BlockSpec((K, block_n), lambda j: (0, j))],
        out_specs=pl.BlockSpec((1, block_n), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, block_n), jnp.float32),
    )(wp)


def timed_loop(fn, x0, repeats, *weights, trials=3):
    """Sequential scan: carry y -> next x (no hoisting possible).
    Weights are passed as jit ARGUMENTS (packed S4 buffers cannot be
    baked in as constants on this backend)."""

    @functools.partial(jax.jit, static_argnums=0)
    def run(length, x0, *ws):
        def step(x, _):
            y = fn(x, *ws)
            # feed a slice of y back as the next activation (shape match)
            nxt = y[:, : x.shape[1]].astype(x.dtype)
            nxt = nxt / (1.0 + jnp.abs(nxt))  # keep bounded
            return nxt, ()

        xT, _ = jax.lax.scan(step, x0, None, length=length)
        return xT.sum()

    def best_of(length):
        float(run(length, x0, *weights))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(run(length, x0, *weights))
            best = min(best, time.perf_counter() - t0)
        return best

    # difference two lengths: cancels dispatch RTT (~20-30 ms on the
    # tunneled backend) and any other fixed per-call cost
    t_full = best_of(repeats)
    t_half = best_of(repeats // 2)
    return (t_full - t_half) / (repeats - repeats // 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=2048)
    ap.add_argument("--N", type=int, default=16384)
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=100)
    ap.add_argument("--block_n", type=int, default=512)
    args = ap.parse_args()
    K, N, B = args.K, args.N, args.B

    # NOTE: no persistent compile cache here — restoring a cached
    # executable whose arg layout is packed S4 retriggers the
    # device_put relayout recursion (utils/precision.py int4 notes).

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 7.0
    q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int8)
    wp = pack_nibbles(q)
    s8 = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    q8 = jnp.clip(jnp.round(w / s8), -127, 127).astype(jnp.int8)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (B, K), jnp.bfloat16)

    # Native-S4 baseline, constructed inline (utils/precision.py no
    # longer emits S4 — this standalone program is the one place the
    # single pinned packed layout still holds, see quantize_weights_int4
    # docstring for why mixed kernel+S4 programs can't use it):
    def _to_s4(qi8):
        return qi8.astype(jnp.int4)
    if jax.default_backend() == "tpu":
        from jax._src.layout import Format, Layout
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        packed = Format(Layout(major_to_minor=(0, 1),
                               tiling=((8, 128), (8, 1)),
                               sub_byte_element_size_in_bits=4), sharding)
        wq_s4 = jax.jit(_to_s4, out_shardings=packed)(q)
    else:
        wq_s4 = jax.jit(_to_s4)(q)
    p4 = {"w_q": wq_s4, "w_s": s}

    int4_bytes = K * N // 2
    int8_bytes = K * N

    results = {}

    def report(name, sec_per_iter, nbytes):
        gbps = nbytes / sec_per_iter / 1e9
        results[name] = {"us": round(sec_per_iter * 1e6, 1),
                         "GB/s": round(gbps, 1),
                         "frac_819": round(gbps / 819.0, 3)}
        print(name, results[name], flush=True)

    # fixed per-iteration cost of the timing scan itself (tiny op body)
    t = timed_loop(lambda x: x * 1.0001, x0, args.repeats)
    report("noop_loop", t, 1)

    # correctness first
    y_ref = (x0.astype(jnp.float32) @ q.astype(jnp.float32)) * s
    y_p4 = matvec_p4(x0, wp, s, block_n=args.block_n)
    err = float(jnp.max(jnp.abs(y_p4 - y_ref))
                / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print("pallas_p4 rel err vs int4 ref:", err, flush=True)
    assert err < 2e-2, err

    t = timed_loop(lambda x, wq, ws: (x @ wq.astype(jnp.bfloat16)) * ws,
                   x0, args.repeats, p4["w_q"], p4["w_s"])
    report("xla_int4", t, int4_bytes)

    t = timed_loop(lambda x, wq, ws: (x @ wq.astype(jnp.bfloat16)) * ws,
                   x0, args.repeats, q8, s8)
    report("xla_int8", t, int8_bytes)

    t = timed_loop(lambda x, wq, ws: matvec_p4(x, wq, ws,
                                               block_n=args.block_n),
                   x0, args.repeats, wp, s)
    report("pallas_p4", t, int4_bytes)

    t = timed_loop(lambda x, wq, ws: matvec_s8(x, wq, ws,
                                               block_n=args.block_n),
                   x0, args.repeats, q8, s8)
    report("pallas_s8", t, int8_bytes)

    y_p4c = matvec_p4c(x0, wp, s, block_n=args.block_n)
    err = float(jnp.max(jnp.abs(y_p4c - y_ref))
                / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print("pallas_p4c rel err:", err, flush=True)
    t = timed_loop(lambda x, wq, ws: matvec_p4c(x, wq, ws,
                                                block_n=args.block_n),
                   x0, args.repeats, wp, s)
    report("pallas_p4c_i8bitops", t, int4_bytes)

    # stream roofline: same packed bytes, reduce-only / DMA-only bodies
    def run_fn(fn):
        @functools.partial(jax.jit, static_argnums=0)
        def run(length, w):
            def step(acc, _):
                return acc + fn(w).sum(), ()
            out, _ = jax.lax.scan(step, 0.0, None, length=length)
            return out

        def best_of(length):
            float(run(length, wp))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(length, wp))
                best = min(best, time.perf_counter() - t0)
            return best

        return ((best_of(args.repeats) - best_of(args.repeats // 2))
                / (args.repeats - args.repeats // 2))

    report("stream_roofline_int4bytes",
           run_fn(lambda w: stream_bytes(w, block_n=args.block_n)),
           int4_bytes)
    report("dma_only_int4bytes",
           run_fn(lambda w: dma_only(w, block_n=args.block_n)),
           int4_bytes)

    import json
    print(json.dumps({"shape": [K, N], "B": B, "block_n": args.block_n,
                      "results": results}))


if __name__ == "__main__":
    main()
