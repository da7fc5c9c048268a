"""Fused single-token cache attention for the rollout (flash-decode).

The scan rollout's per-step attention (ops/attention.mha_step) reads the
FULL [T] KV cache every step through XLA fusions measured at ~50% of HBM
peak — and positions > t are masked out after being read, so over a whole
rollout HALF the cache traffic is wasted on invalid slots. This kernel:

- clamps the k-block index via scalar prefetch: blocks beyond position t
  map to the last valid block index, and Mosaic's block-revisit logic
  skips the re-DMA — average cache bytes fetched per step drop from T to
  ~(t+1), i.e. ~half over a rollout;
- fuses scores -> online softmax -> p@V in one pass (no [T] probability
  round-trip through HBM);
- masks invalid positions inside the valid blocks exactly like mha_step
  (k_pos <= t), f32 score/softmax accumulation.

The single query row is replicated to 8 sublanes (q is tiny; redundant
rows are free next to the cache stream). src_len == 0 only — the only
regime the scan engine serves (rollout/engine.is_scan_incremental).

Numerics match mha_step's XLA path to f32 tolerance (exactness tested in
interpret mode on CPU and on hardware); dispatch is gated by
``decode_supported`` and a measured A/B (BASELINE.md).

Reference behavior mirrored: utils/train_utils.py:202-207 rollout
semantics via the KV-cache equivalence argument in rollout/engine.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_QROWS = 8  # sublane-pad the single query row

# Tests only: force interpret-mode pallas_call through the public
# decode_attention path (CPU has no Mosaic) — lets the shard_map-wrapped
# serving path run on the virtual CPU mesh (tests/test_kernel_shard.py).
_FORCE_INTERPRET = False


def _decode_kernel(t_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scratch, l_scratch, acc_scratch, *,
                   scale: float, block_k: int, nk: int, t_actual: int,
                   precision):
    j = pl.program_id(1)
    t = t_ref[0]
    t_block = t // block_k

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when(j <= t_block)
    def _accumulate():
        q = q_ref[0]  # [QROWS, hd] (row-replicated single query)
        k = k_ref[0]  # [block_k, hd]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale  # [QROWS, bk]
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (_QROWS, block_k), 1)
        mask = jnp.logical_and(k_pos <= t, k_pos < t_actual)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scratch[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


def _decode_kernel_q8(t_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                      m_scratch, l_scratch, acc_scratch, *,
                      scale: float, block_k: int, nk: int, t_actual: int):
    """int8-cache variant (ops/attention.init_kv_cache): k/v blocks are
    int8 planes with per-token f32 scales — the key scale multiplies the
    score column after the q@k dot, the value scale folds into the
    probabilities before p@V, so nothing dequantizes through HBM."""
    j = pl.program_id(1)
    t = t_ref[0]
    t_block = t // block_k

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when(j <= t_block)
    def _accumulate():
        q = q_ref[0]                                   # [QROWS, hd] bf16
        k = k_ref[0].astype(jnp.bfloat16)              # [block_k, hd]
        v = v_ref[0].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [QROWS, bk]
        # Scales arrive sublane-replicated as [1, QROWS, bk] blocks
        # (Mosaic requires the block's second-to-last dim divisible by 8;
        # a [1, bk] row is not a legal block shape) — elementwise with
        # the QROWS-replicated scores.
        s = s * ks_ref[0]                              # [QROWS, bk]
        k_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (_QROWS, block_k), 1)
        mask = jnp.logical_and(k_pos <= t, k_pos < t_actual)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        pv = jax.lax.dot_general(
            (p * vs_ref[0]).astype(jnp.bfloat16), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scratch[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def _decode_call_q8(t_arr, qb, kb, vb, ksb, vsb, *, block_k: int,
                    interpret: bool):
    BH, _, hd = qb.shape
    T_pad = kb.shape[1]
    nk = T_pad // block_k
    kernel = functools.partial(_decode_kernel_q8, scale=hd ** -0.5,
                               block_k=block_k, nk=nk, t_actual=T_pad)

    def clamp(bh, j, t_ref):
        return (bh, jnp.minimum(j, t_ref[0] // block_k), 0)

    def clamp2(bh, j, t_ref):
        return (bh, 0, jnp.minimum(j, t_ref[0] // block_k))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nk),
        in_specs=[
            pl.BlockSpec((1, _QROWS, hd), lambda bh, j, t_ref: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, hd), clamp),
            pl.BlockSpec((1, block_k, hd), clamp),
            # Scales are [BH, QROWS, T_pad] (sublane-replicated rows —
            # Mosaic rejects (1, bk) blocks); see _decode_kernel_q8.
            pl.BlockSpec((1, _QROWS, block_k), clamp2),
            pl.BlockSpec((1, _QROWS, block_k), clamp2),
        ],
        out_specs=pl.BlockSpec((1, _QROWS, hd),
                               lambda bh, j, t_ref: (bh, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_QROWS, 1), jnp.float32),
            pltpu.VMEM((_QROWS, 1), jnp.float32),
            pltpu.VMEM((_QROWS, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, _QROWS, hd), jnp.float32),
        interpret=interpret,
    )(t_arr, qb, kb, vb, ksb, vsb)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "interpret"))
def _decode_call(t_arr, qb, kb, vb, *, block_k: int, interpret: bool):
    BH, _, hd = qb.shape
    T_pad = kb.shape[1]
    nk = T_pad // block_k
    scale = hd ** -0.5

    # f32 caches: HIGHEST so the dots match the XLA path's full-f32 VPU
    # multiply-reduce (the MXU's default bf16 passes cost ~2e-3 absolute,
    # measured on hardware; these dots are trivial next to the cache DMA).
    # bf16 caches: DEFAULT — Mosaic rejects an fp32 contract over bf16
    # operands ("Bad lhs type"), and bf16 inputs already bound the error.
    precision = (jax.lax.Precision.HIGHEST if kb.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_decode_kernel, scale=scale,
                               block_k=block_k, nk=nk, t_actual=T_pad,
                               precision=precision)

    def clamp(bh, j, t_ref):
        # Blocks beyond t revisit the last valid block: no re-DMA.
        return (bh, jnp.minimum(j, t_ref[0] // block_k), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nk),
        in_specs=[
            pl.BlockSpec((1, _QROWS, hd), lambda bh, j, t_ref: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, hd), clamp),
            pl.BlockSpec((1, block_k, hd), clamp),
        ],
        out_specs=pl.BlockSpec((1, _QROWS, hd),
                               lambda bh, j, t_ref: (bh, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_QROWS, 1), jnp.float32),
            pltpu.VMEM((_QROWS, 1), jnp.float32),
            pltpu.VMEM((_QROWS, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, _QROWS, hd), jnp.float32),
        interpret=interpret,
    )(t_arr, qb, kb, vb)


def decode_supported(B: int, T: int, n_heads: int, hd: int, *,
                     backend: str = None) -> bool:
    """Dispatch predicate for the fused decode-attention path (single
    source of truth for mha_step and tests). hd must be a lane multiple;
    cylinder's down-projected cross attention (hd=64) stays on XLA.
    Env override for A/B measurement: SEA_TPU_DECODE_KERNEL=0 disables."""
    import os
    from sea_tpu.ops.dispatch import attention_kernels_allowed
    if os.environ.get("SEA_TPU_DECODE_KERNEL") == "0":
        return False
    if not attention_kernels_allowed():
        # multi-device GSPMD trace (ops/dispatch.py): no partitioning
        # rule for pallas — the XLA cache attention partitions cleanly.
        return False
    if backend is None:
        backend = jax.default_backend()
    return (backend == "tpu" and hd % 128 == 0 and T >= 128
            and B * n_heads <= 64)


def decode_attention(q, cache_k, cache_v, t, *, block_k: int = 256,
                     interpret: bool = False, k_scale=None, v_scale=None):
    """softmax(q @ K[: t+1]^T / sqrt(hd)) @ V[: t+1], one token.

    q: [B, H, hd]; cache_k/cache_v: [B, H, T, hd] head-major (any float
    dtype — scores/softmax accumulate f32); t: scalar int32 absolute
    position. Returns [B, H, hd] f32. Head-major caches make the
    [B*H, T, hd] kernel view a FREE reshape; a time-major [B, T, H, hd]
    cache would force a full-cache relayout copy into the Pallas operand
    every rollout step (Pallas pins operand layouts, so XLA cannot fold
    the transpose away).

    k_scale/v_scale: f32 [B, H, T] per-token scales for int8 caches
    (ops/attention.init_kv_cache) — routes to the quantized kernel
    variant, which folds the scales into the score/probability math.
    """
    B, H, hd = q.shape
    T = cache_k.shape[2]
    interpret = interpret or _FORCE_INTERPRET

    def to_bh(x):
        return x.reshape(B * H, T, hd)

    block_k = min(block_k, max(128, T))
    nk = pl.cdiv(T, block_k)
    pad = nk * block_k - T
    kb, vb = to_bh(cache_k), to_bh(cache_v)
    if pad:
        kb = jnp.pad(kb, ((0, 0), (0, pad), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, pad), (0, 0)))
    t_arr = jnp.full((1,), t, dtype=jnp.int32)
    if k_scale is not None:
        qb = jnp.broadcast_to(q.reshape(B * H, 1, hd).astype(jnp.bfloat16),
                              (B * H, _QROWS, hd))
        ksb = k_scale.reshape(B * H, 1, T)
        vsb = v_scale.reshape(B * H, 1, T)
        if pad:
            ksb = jnp.pad(ksb, ((0, 0), (0, 0), (0, pad)))
            vsb = jnp.pad(vsb, ((0, 0), (0, 0), (0, pad)))
        # Sublane-replicate to QROWS rows: Mosaic requires the block's
        # second-to-last dim divisible by 8, so a 1-row scale block is
        # not lowerable; QROWS identical rows line up elementwise with
        # the row-replicated query scores (tiny arrays — 8x ~KBs).
        ksb = jnp.broadcast_to(ksb, (B * H, _QROWS, ksb.shape[2]))
        vsb = jnp.broadcast_to(vsb, (B * H, _QROWS, vsb.shape[2]))
        out = _decode_call_q8(t_arr, qb, kb, vb, ksb, vsb,
                              block_k=block_k, interpret=interpret)
        return out[:, 0, :].reshape(B, H, hd)
    qb = jnp.broadcast_to(q.reshape(B * H, 1, hd).astype(kb.dtype),
                          (B * H, _QROWS, hd))
    out = _decode_call(t_arr, qb, kb, vb, block_k=block_k,
                       interpret=interpret)
    return out[:, 0, :].reshape(B, H, hd)
