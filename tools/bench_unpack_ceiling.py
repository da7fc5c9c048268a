"""Decompose the int4 matvec kernel's bandwidth — a recorded NEGATIVE result.

Question: the shipped input-major kernel (ops/quant_matmul._mv_call) runs
the B=1 dequant matvec at ~570-590 GB/s (~70% of v5e HBM peak). Is the
remainder the VPU nibble unpack, or the degenerate M=1 MXU dot — and does
an output-major ("transposed") layout with block_n active MXU rows fix it?

Answer (v5e, 2000-repeat dispatch-cancelled timing, [2048, 16384]):

    full  (shipped, input-major [K/2, N])   29.3 us   573 GB/s
    fullT (output-major [N, K/2])           65.2 us   257 GB/s

The transposed kernel is ~2x SLOWER even with every relayout hoisted out
of the grid loop (x pre-transposed to [K, B] outside; output left [N, B]
and transposed outside): [bn, K/2] @ [K/2, B<=8] is just as degenerate
for the MXU (1 of 128 result columns active) as [B, K/2] @ [K/2, bn]
(1 of 128 rows), and the input-major orientation pipelines better.
A first in-kernel-transpose variant was 2x slower again — per-grid-step
lane<->sublane relayouts of the activation/output vectors dominate
everything (kernel bodies re-execute per grid step; never relayout
inside one).

An unpack-only kernel (no dots) measured ~650-745 GB/s in the same
harness, so the dots add ~25% on top of the unpack — but reorienting
them doesn't help, and a VPU multiply-reduce formulation pencils out
slower still. Conclusion: the shipped kernel keeps the input-major
layout; the remaining headroom would need int8 MXU matmuls with
in-register nibble widening, which this Mosaic doesn't expose. Kept as
the record of WHY the layout is what it is.

Usage: python tools/bench_unpack_ceiling.py [--k 2048] [--n 16384]
       [--b 1] [--repeats 2000]
(repeats must be large enough that device time dominates the tunnel's
~25 ms dispatch RTT: at 100 repeats the differenced timings are noise.)
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get("SEA_BENCH_XLA_CACHE", "/tmp/sea_tpu_xla_cache")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bench_quant_matvec import timed_loop
from sea_tpu.ops.quant_matmul import _mv_call, _pick_block_n, pack_int4


def _unpack_only_kernel(x_ref, wp_ref, o_ref):
    # Streams + unpacks both planes, no dot: bounds what the full kernel
    # could reach if the dots were free. Depends on x so the timing
    # loop's feedback can't hoist the call.
    w8 = jax.lax.bitcast_convert_type(wp_ref[:], jnp.int8)
    lo = ((w8 & 0xF) ^ 8).astype(jnp.bfloat16)
    hi = (w8 & (-16)).astype(jnp.bfloat16)
    o_ref[:] = (jnp.sum(lo.astype(jnp.float32))
                + jnp.sum(hi.astype(jnp.float32))
                + jnp.sum(x_ref[:].astype(jnp.float32))).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("block_n",))
def _unpack_only_call(x, wp, *, block_n):
    K2, N = wp.shape
    return pl.pallas_call(
        _unpack_only_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((x.shape[0], x.shape[1]), lambda j: (0, 0)),
            pl.BlockSpec((K2, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(x, wp)


# --- the rejected output-major variant, kept runnable for re-testing on
# future Mosaic versions ---

def pack_int4_t(q):
    """int8 [K, N] in [-8, 7] -> packed uint8 [N, K//2], output-major."""
    K = q.shape[0]
    qt = q.T
    lo = (qt[:, : K // 2] & 0xF).astype(jnp.uint8)
    hi = (qt[:, K // 2 :] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def _mvt_kernel(xt_ref, wp_ref, s_ref, o_ref):
    # x arrives pre-transposed [K, B] and the output leaves [bn, B]:
    # NO relayouts in the body (it re-executes per grid step).
    w8 = jax.lax.bitcast_convert_type(wp_ref[:], jnp.int8)  # [bn, K/2]
    lo_p8 = ((w8 & 0xF) ^ 8).astype(jnp.bfloat16)   # lo + 8
    hi16 = (w8 & (-16)).astype(jnp.bfloat16)        # 16 * hi
    K2 = w8.shape[1]
    xlo = xt_ref[:K2, :]                             # [K/2, B]
    xhi16 = xt_ref[K2:, :] * jnp.bfloat16(1.0 / 16.0)
    acc = (jnp.dot(lo_p8, xlo, preferred_element_type=jnp.float32)
           + jnp.dot(hi16, xhi16, preferred_element_type=jnp.float32))
    corr = 8.0 * jnp.sum(xlo.astype(jnp.float32), axis=0)  # [B]
    o_ref[:] = (acc - corr[None, :]) * s_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n",))
def _mvt_call(x, wpt, s, *, block_n):
    B, K = x.shape
    N = wpt.shape[0]
    out = pl.pallas_call(
        _mvt_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((K, B), lambda j: (0, 0)),
            pl.BlockSpec((block_n, K // 2), lambda j: (j, 0)),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, B), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
    )(x.T, wpt, s)
    return out.T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=2000)
    args = ap.parse_args()
    K, N, B = args.k, args.n, args.b

    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (K, N), dtype=np.int8)
    qj = jnp.asarray(q)
    wp = jnp.asarray(pack_int4(qj))
    wpt = jnp.asarray(pack_int4_t(qj))
    x0 = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal(N), jnp.float32)
    bn = _pick_block_n(K, N)
    nbytes = wp.size

    def report(name, t):
        print(f"{name:7s} {t*1e6:8.2f} us  {nbytes/t/1e9:7.1f} GB/s")

    t = timed_loop(lambda x, w: jnp.broadcast_to(
        _unpack_only_call(x, w, block_n=bn), (B, K)).astype(jnp.bfloat16)
        * jnp.bfloat16(1e-6) + x,
        x0, args.repeats, wp)
    report("unpack", t)

    t = timed_loop(lambda x, w, ss: _mv_call(
        x, w, ss.reshape(1, N), block_n=bn), x0, args.repeats, wp, s)
    report("full", t)

    t = timed_loop(lambda x, w, ss: _mvt_call(
        x, w, ss.reshape(N, 1), block_n=bn), x0, args.repeats, wpt, s)
    report("fullT", t)

    ref = (x0.astype(jnp.float32) @ qj.astype(jnp.float32)) * s
    got = _mvt_call(x0, wpt, s.reshape(N, 1), block_n=bn)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"fullT rel-max-err vs dequant: {err:.2e}")


if __name__ == "__main__":
    main()
