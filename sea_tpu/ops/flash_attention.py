"""Pallas TPU flash attention (forward) with offset-causal masking.

Replaces the [B, H, T, T] score materialization of the XLA path
(ops/attention.py attention_core) for long temporal sequences: the reference
materializes full attention matrices with preallocated [2024, 2024] masks
(base_blocks.py:173,191-197); here scores never leave VMEM — an online-
softmax (flash-attention-2 style) accumulation over key blocks.

Semantics exactly match attention_core:
  scores = q @ k^T * hd^-0.5, masked to k_pos <= q_pos + src_len when
  causal, f32 softmax, @ v.

Layout: q, k, v are [B, T, H, hd] (the framework's pre-head-transpose
layout). The kernel grids over (B*H, q_blocks, k_blocks) with the k-block
axis innermost, carrying running max / sum / accumulator in VMEM scratch.
Fully-masked k blocks are skipped with pl.when (no compute, though the
block DMA still runs — acceptable at T<=2024).

Backward: fused Pallas kernels (flash-attention-2 style) — scores are
recomputed blockwise from the saved per-row log-sum-exp, so both forward
and backward are O(T) in HBM. dQ grids over (BH, q, k); dK/dV grid over
(BH, k, q).

Numerical check: tests/test_flash_attention.py (interpret mode on CPU
against attention_core; real-mode smoke on TPU via bench paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block 256 measured fastest on v5e at T=2048 (1.15 ms vs 1.84 ms XLA,
# 1.67 ms at block 128) — see commit message / BASELINE.md notes.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30  # large finite negative: avoids NaN from (-inf) - (-inf)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scratch, l_scratch,
                acc_scratch, *, scale: float, causal: bool, src_len: int,
                t_actual: int, block_q: int, block_k: int):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

    # Skip key blocks entirely above the (offset) diagonal.
    if causal:
        block_needed = k_start <= q_start + block_q - 1 + src_len
    else:
        block_needed = True

    @pl.when(block_needed if causal else True)
    def _compute():
        q = q_ref[0]  # [block_q, hd]
        k = k_ref[0]  # [block_k, hd]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]

        q_pos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = k_pos < t_actual
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos + src_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [bq, bk]
        l_new = l_scratch[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    @pl.when(kj == nk - 1)
    def _finalize():
        # Rows that saw no valid key (can't happen for causal with
        # src_len >= 0 and t_actual > 0, but guard against l == 0).
        l = l_scratch[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            # Log-sum-exp per row, consumed by the backward kernels.
            # Stored [BH, Tpad, 1]: TPU block tiling requires the last two
            # block dims divisible by (8, 128) or equal to the array dims.
            lse_ref[0] = m_scratch[:] + jnp.log(l_safe)


def _flash_forward(q, k, v, *, causal: bool, src_len: int,
                   block_q: int, block_k: int, interpret: bool = False,
                   return_lse: bool = False):
    """q: [B, Tq, H, hd]; k, v: [B, Tk, H, hd] -> [B, Tq, H, hd]
    (+ log-sum-exp [B*H, Tq_padded] when return_lse)."""
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5

    # [B, T, H, hd] -> [B*H, T, hd]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], hd)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    block_q = min(block_q, _round_up(Tq))
    block_k = min(block_k, _round_up(Tk))
    nq = pl.cdiv(Tq, block_q)
    nk = pl.cdiv(Tk, block_k)

    # Pad T to block multiples (static shapes for the grid).
    pad_q = nq * block_q - Tq
    pad_k = nk * block_k - Tk
    if pad_q:
        qb = jnp.pad(qb, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kb = jnp.pad(kb, ((0, 0), (0, pad_k), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, pad_k), (0, 0)))

    if return_lse:
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, src_len=src_len,
            t_actual=Tk, block_q=block_q, block_k=block_k)
        out_shapes = (
            jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, nq * block_q, 1), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, block_q, hd), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        )
    else:
        kernel = functools.partial(
            lambda *refs, **kw: _fwd_kernel(*refs[:4], None, *refs[4:], **kw),
            scale=scale, causal=causal, src_len=src_len,
            t_actual=Tk, block_q=block_q, block_k=block_k)
        out_shapes = jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype)
        out_specs = pl.BlockSpec((1, block_q, hd), lambda b, i, j: (b, i, 0))

    res = pl.pallas_call(
        kernel,
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb)

    if return_lse:
        out, lse = res
        out = out[:, :Tq].reshape(B, H, Tq, hd).transpose(0, 2, 1, 3)
        return out, lse
    out = res[:, :Tq]
    return out.reshape(B, H, Tq, hd).transpose(0, 2, 1, 3)


def _round_up(x, m=128):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Reference oracle (tests) — the XLA attention path
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, *, causal: bool, src_len: int):
    from sea_tpu.ops.attention import attention_core
    return attention_core(q, k, v, causal=causal, src_len=src_len)


# ---------------------------------------------------------------------------
# Fused Pallas backward (flash-attention-2 style)
#
# With residuals O and per-row log-sum-exp L:
#   P  = exp(QK^T * scale - L)          (masked entries -> 0)
#   D  = rowsum(dO * O)
#   dV = P^T dO
#   dS = P * (dO V^T - D)
#   dQ = dS K * scale ;  dK = dS^T Q * scale
# Two kernels: dQ grids (BH, q_blocks, k_blocks) accumulating over k;
# dK/dV grids (BH, k_blocks, q_blocks) accumulating over q. Scores are
# recomputed per block in VMEM — O(T) HBM, like the forward.
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse, q_start, k_start, *, scale, causal, src_len,
                 tq_actual, tk_actual, block_q, block_k):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 0)
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32,
                                               (block_q, block_k), 1)
    mask = jnp.logical_and(q_pos < tq_actual, k_pos < tk_actual)
    if causal:
        mask = jnp.logical_and(mask, k_pos <= q_pos + src_len)
    p = jnp.exp(s - lse.reshape(block_q, 1))  # lse block is [block_q, 1]
    return jnp.where(mask, p, 0.0)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
                   acc, *, scale, causal, src_len, tq_actual, tk_actual,
                   block_q, block_k):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q_start = qi * block_q
    k_start = kj * block_k
    needed = (k_start <= q_start + block_q - 1 + src_len) if causal else True

    @pl.when(needed)
    def _compute():
        p = _recompute_p(q_ref[0], k_ref[0], lse_ref[0], q_start, k_start,
                         scale=scale, causal=causal, src_len=src_len,
                         tq_actual=tq_actual, tk_actual=tk_actual,
                         block_q=block_q, block_k=block_k)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum_ref[0].reshape(block_q, 1))
        acc[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(kj == nk - 1)
    def _finalize():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dk_ref,
                    dv_ref, acc_dk, acc_dv, *, scale, causal, src_len,
                    tq_actual, tk_actual, block_q, block_k):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    q_start = qi * block_q
    k_start = kj * block_k
    needed = (k_start <= q_start + block_q - 1 + src_len) if causal else True

    @pl.when(needed)
    def _compute():
        p = _recompute_p(q_ref[0], k_ref[0], lse_ref[0], q_start, k_start,
                         scale=scale, causal=causal, src_len=src_len,
                         tq_actual=tq_actual, tk_actual=tk_actual,
                         block_q=block_q, block_k=block_k)
        # dV += P^T dO
        acc_dv[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dsum_ref[0].reshape(block_q, 1))
        # dK += dS^T Q * scale
        acc_dk[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = acc_dk[:].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, *, causal: bool, src_len: int,
                    block_q: int, block_k: int, interpret: bool = False):
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], hd)

    block_q = min(block_q, _round_up(Tq))
    block_k = min(block_k, _round_up(Tk))
    nq = pl.cdiv(Tq, block_q)
    nk = pl.cdiv(Tk, block_k)
    pad_q = nq * block_q - Tq
    pad_k = nk * block_k - Tk

    qb, dob, ob = to_bh(q), to_bh(g), to_bh(out)
    kb, vb = to_bh(k), to_bh(v)
    if pad_q:
        qb = jnp.pad(qb, ((0, 0), (0, pad_q), (0, 0)))
        dob = jnp.pad(dob, ((0, 0), (0, pad_q), (0, 0)))
        ob = jnp.pad(ob, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kb = jnp.pad(kb, ((0, 0), (0, pad_k), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, pad_k), (0, 0)))
    # lse comes padded from the forward ([B*H, nq*block_q, 1]).
    dsum = jnp.sum(dob.astype(jnp.float32) * ob.astype(jnp.float32),
                   axis=-1, keepdims=True)

    kw = dict(scale=scale, causal=causal, src_len=src_len, tq_actual=Tq,
              tk_actual=Tk, block_q=block_q, block_k=block_k)

    spec_q = pl.BlockSpec((1, block_q, hd), lambda b, i, j: (b, i, 0))
    spec_k_for_dq = pl.BlockSpec((1, block_k, hd), lambda b, i, j: (b, j, 0))
    spec_row_q = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(B * H, nq, nk),
        in_specs=[spec_q, spec_k_for_dq, spec_k_for_dq, spec_q, spec_row_q,
                  spec_row_q],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        interpret=interpret,
    )(qb, kb, vb, dob, lse, dsum)

    # dK/dV: q-block axis innermost.
    spec_q_for_dkv = pl.BlockSpec((1, block_q, hd), lambda b, j, i: (b, i, 0))
    spec_k_fixed = pl.BlockSpec((1, block_k, hd), lambda b, j, i: (b, j, 0))
    spec_row_q2 = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(B * H, nk, nq),
        in_specs=[spec_q_for_dkv, spec_k_fixed, spec_k_fixed, spec_q_for_dkv,
                  spec_row_q2, spec_row_q2],
        out_specs=(spec_k_fixed, spec_k_fixed),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, nk * block_k, hd), k.dtype),
            jax.ShapeDtypeStruct((B * H, nk * block_k, hd), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, hd), jnp.float32),
                        pltpu.VMEM((block_k, hd), jnp.float32)],
        interpret=interpret,
    )(qb, kb, vb, dob, lse, dsum)

    def from_bh(x, T):
        return x[:, :T].reshape(B, H, T, hd).transpose(0, 2, 1, 3)

    return from_bh(dq, Tq), from_bh(dk, Tk), from_bh(dv, Tk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, causal: bool = True, src_len: int = 0,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    return _flash_forward(q, k, v, causal=causal, src_len=src_len,
                          block_q=block_q, block_k=block_k)


def _fwd(q, k, v, causal, src_len, block_q, block_k):
    out, lse = _flash_forward(q, k, v, causal=causal, src_len=src_len,
                              block_q=block_q, block_k=block_k,
                              return_lse=True)
    return out, (q, k, v, out, lse)


def _bwd(causal, src_len, block_q, block_k, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, causal=causal,
                           src_len=src_len, block_q=block_q,
                           block_k=block_k)


flash_attention.defvjp(_fwd, _bwd)


def flash_supported(q, k, *, causal: bool, dropout_rate: float,
                    deterministic: bool) -> bool:
    """Auto-dispatch policy for ops.attention.mha: use the Pallas kernel on
    TPU for long sequences without attention dropout. (Dropout on attention
    probabilities — the reference trains with dropout=0.1 on temporal —
    needs the probs materialized, so those train steps keep the XLA path;
    eval/rollout is always deterministic.)"""
    if jax.default_backend() not in ("tpu",):
        return False
    if dropout_rate > 0.0 and not deterministic:
        return False
    Tq, Tk = q.shape[1], k.shape[1]
    return Tq >= 256 and Tk >= 256
