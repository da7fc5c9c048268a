"""int4 weight-only matmul: packed-nibble Pallas kernel for serving.

The B=1 autoregressive rollout streams the full weight set from HBM every
step (BASELINE.md roofline rows). XLA's native S4 dequant-matvec runs at
~470 GB/s on a v5e — 58% of HBM peak — because its nibble unpack is
VPU-bound (measured, tools/bench_quant_matvec.py). This kernel reaches
~590 GB/s (1.3x) with a minimal-VPU unpack built from the only int8
vector ops this Mosaic legalizes (AND/XOR and i8->bf16 convert):

- storage: two int4 values per uint8, packed along the INPUT dim —
  byte[k, n] holds w[k, n] (low nibble) and w[k + K/2, n] (high nibble),
  so unpacked planes pair with CONTIGUOUS activation slices (no lane
  interleave on the output dim);
- low nibble:  (w & 0xF) ^ 8 = lo + 8 in one AND + one XOR; the -8
  becomes a rank-1 correction `8 * sum(x_lo)` folded into the output;
- high nibble: (w & 0xF0) interpreted as int8 IS 16*hi (two's
  complement keeps the sign), and the /16 is pre-folded into the
  activation slice — zero extra in-kernel ops;
- two bf16 dots with f32 accumulation, per-output-channel scale last.

Bit-exact vs the reference dequant `(x @ q.astype(bf16)) * s` (the xor
trick and corrections are integer-exact in bf16's 8-bit mantissa range:
nibbles are in [-8, 7]).

Replaces the native-jnp.int4 serving path (utils/precision.py round-3
history): uint8 storage also removes the packed-S4 relayout bug
workaround and makes the quantized params trivially checkpointable.

No VJP on purpose: weight-only quantization is a SERVING transform
(training always runs on the f32/bf16 master params).

Sharded serving note: under a GSPMD mesh (cli temporal test --mesh) the
pallas_call has no partitioning rule, so XLA replicates its operands —
correct, but TP'd int4 weights are all-gathered (hoisted out of the
scan loop) rather than streamed shard-wise. Single-chip and DP-
replicated serving (the measured configurations) are unaffected; if
shard-wise TP int4 ever matters, serve --precision int8 or extend this
with jax.experimental.custom_partitioning.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# rows-per-call ceiling for the kernel path: serving matvecs are M=B<=8;
# larger M (e.g. whole-trajectory decode) is MXU-efficient under plain
# XLA with a one-off dequant, so the kernel would only add VMEM pressure.
_KERNEL_MAX_ROWS = 8

# VMEM budget for one grid step: packed block (double-buffered) + the
# two materialized bf16 nibble planes ≈ 3*K*block_n bytes; 16 MB/core
# total, leave headroom for x/out/scales. 3*K*bn <= 13e6 measured safe,
# 3*K*bn = 25e6 measured OOM (tools/bench_quant_matvec.py).
_VMEM_BUDGET = 13_000_000

# Minimum weight-matrix size (unpacked elements) for the kernel path.
# Re-measured for the all-uint8 design (docs/ROUND3.md): the kernel wins
# at EVERY quantized size once native S4 is off the table — XLA's fused
# two-plane dequant matvec runs at ~57 GB/s on the small attention mats
# (vs ~3 us/call kernel overhead): cylinder int4 rollout 4400 steps/s
# with the 2^23 threshold, 5534 at 2^20, 5860 all-kernel. Floor matches
# the quantizers' min_size (smaller mats stay f32).
_KERNEL_MIN_ELEMS = 1 << 16

# Tests only: run the pallas matvec in interpret mode (CPU) so the
# shard_map-wrapped serving path is testable on the virtual CPU mesh.
_FORCE_INTERPRET = False


def pack_int4(q):
    """int8 [K, N] with values in [-8, 7] -> packed uint8 [K//2, N].

    Low nibble = rows [:K/2], high nibble = rows [K/2:] — input-dim
    packing so both planes multiply contiguous activation slices.
    """
    K = q.shape[0]
    if K % 2:
        raise ValueError(f"input dim must be even to pack nibbles, got {K}")
    lo = (q[: K // 2] & 0xF).astype(jnp.uint8)
    hi = (q[K // 2 :] & 0xF).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_planes(wp, dtype=jnp.bfloat16):
    """packed uint8 [K//2, N] -> (lo, hi) nibble planes [K//2, N] dtype.
    lo pairs with x[:, :K/2], hi with x[:, K/2:]."""
    w8 = jax.lax.bitcast_convert_type(wp, jnp.int8)
    lo = (((w8 & 0xF) ^ 8) - 8).astype(dtype)
    hi16 = (w8 & (-16)).astype(jnp.int32)  # 16 * hi, sign carried
    hi = (hi16 // 16).astype(dtype)
    return lo, hi


def unpack_int4(wp, dtype=jnp.bfloat16):
    """packed uint8 [K//2, N] -> dequantized-to-integer [K, N] dtype."""
    return jnp.concatenate(unpack_planes(wp, dtype), axis=0)


def _mv_kernel(x_ref, wp_ref, s_ref, o_ref):
    w8 = jax.lax.bitcast_convert_type(wp_ref[:], jnp.int8)
    lo_p8 = ((w8 & 0xF) ^ 8).astype(jnp.bfloat16)   # lo + 8
    hi16 = (w8 & (-16)).astype(jnp.bfloat16)        # 16 * hi
    K2 = w8.shape[0]
    xlo = x_ref[:, :K2]
    xhi16 = x_ref[:, K2:] * jnp.bfloat16(1.0 / 16.0)  # tiny VPU op
    acc = (jnp.dot(xlo, lo_p8, preferred_element_type=jnp.float32)
           + jnp.dot(xhi16, hi16, preferred_element_type=jnp.float32))
    corr = 8.0 * jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc - corr) * s_ref[:]


def _pick_block_n(K: int, N: int):
    for bn in (2048, 1024, 512, 256, 128):
        if N % bn == 0 and 3 * K * bn <= _VMEM_BUDGET:
            return bn
    return None


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _mv_call(x, wp, s, *, block_n: int, interpret: bool = False):
    B, K = x.shape
    N = wp.shape[1]
    xs = x
    return pl.pallas_call(
        _mv_kernel,
        grid=(N // block_n,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0)),
            pl.BlockSpec((K // 2, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(xs, wp, s)


def kernel_supported(M: int, K: int, N: int, *, backend: str = None) -> bool:
    """True when the Pallas matvec path applies (single source of truth
    for the dispatch in int4_matmul and for tests)."""
    if backend is None:
        backend = jax.default_backend()
    return (backend == "tpu" and M <= _KERNEL_MAX_ROWS
            and K * N >= _KERNEL_MIN_ELEMS
            and K % 2 == 0 and (K // 2) % 8 == 0
            and _pick_block_n(K, N) is not None)


def int4_matmul(x, wp, s, *, force: str = None):
    """y = dequant_int4(wp, s) @ x along x's last dim.

    x: [..., K] float; wp: packed uint8 [K//2, N]; s: f32 [N].
    Kernel path for serving-shaped calls on big matrices (few rows,
    >= _KERNEL_MIN_ELEMS weights, TPU), XLA-fused two-plane dequant dot
    otherwise. force: 'kernel' | 'jnp' | None (tests/bench).
    """
    *lead, K = x.shape
    N = wp.shape[1]
    M = math.prod(lead) if lead else 1
    x2 = x.reshape(M, K)
    use_kernel = (force == "kernel" if force is not None
                  else kernel_supported(M, K, N))
    if use_kernel:
        y = _mv_call(x2.astype(jnp.bfloat16), wp,
                     s.reshape(1, N).astype(jnp.float32),
                     block_n=_pick_block_n(K, N),
                     interpret=_FORCE_INTERPRET)
    else:
        # concat-free two-plane form: XLA fuses each plane's bit-ops into
        # its dot operand (a concat would materialize the full bf16
        # matrix); f32 accumulation to match the kernel
        lo, hi = unpack_planes(wp)
        K2 = K // 2
        y = (jnp.dot(x2[:, :K2], lo, preferred_element_type=jnp.float32)
             + jnp.dot(x2[:, K2:], hi, preferred_element_type=jnp.float32)
             ) * s
    # output is f32 either way (kernel accumulates f32; the fallback's
    # scale multiply promotes) — matching the pre-kernel int4 path
    return y.reshape(*lead, N)
