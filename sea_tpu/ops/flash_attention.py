"""Pallas TPU flash attention: banded grid, fused backward, in-kernel dropout.

Replaces the [B, H, T, T] score materialization of the XLA path
(ops/attention.py attention_core) for long temporal sequences: the reference
materializes full attention matrices with preallocated [2024, 2024] masks
(base_blocks.py:173,191-197); here scores never leave VMEM — an online-
softmax (flash-attention-2 style) accumulation over key blocks.

Semantics exactly match attention_core:
  scores = q @ k^T * hd^-0.5, masked to k_pos <= q_pos + src_len when
  causal, f32 softmax, optional inverted dropout on the probabilities, @ v.

Layout: q, k, v are [B, T, H, hd] (the framework's pre-head-transpose
layout).

Banded grid: instead of a dense (B*H, nq, nk) grid where fully-masked
causal blocks still DMA their k/v tiles, the kernels run a FLATTENED grid
(B*H, n_pairs) over only the (q_block, k_block) pairs inside the causal
band. The pair lists are static (shapes are static under jit) and shipped
as scalar-prefetch arrays; BlockSpec index maps read them, so out-of-band
tiles are never fetched — ~2x less HBM traffic for causal at large T,
forward AND backward.

Dropout: the reference trains with attention-probability dropout
(base_blocks.py:191-197, p=0.1 on the cylinder config). Probabilities never
materialize here, so dropout runs INSIDE the kernels via a counter-based
hash over (seed, batch*head, global q position, global k position) — a
pure function of logical positions, so the forward and both backward
kernels regenerate bit-identical masks independent of grid iteration
order, block size, or vector layout. (The hardware PRNG was tried first
and produced layout-dependent bits across kernels — see
_dropout_scale_mask.)
The softmax denominator accumulates UNdropped probabilities (dropout applies
to the normalized probs, matching torch F.dropout-after-softmax); the
accumulator uses dropped ones. The standard flash backward identity
D = rowsum(dO * O) = rowsum(dP_dropped * dp) still holds with dropout, so
the backward needs no extra residuals:
  dV = (P*M)^T dO;  dS = P * (M * dO V^T - D);  dQ = dS K;  dK = dS^T Q,
with M the {0, 1/(1-rate)} mask. _dropout_mask_dense materializes the exact
in-kernel mask for oracle tests (tests/test_flash_attention.py TPU part,
tools/verify_flash_dropout.py).

Numerical check: tests/test_flash_attention.py (interpret mode on CPU
against attention_core for the deterministic paths; the dropout path needs
the hardware PRNG — interpret mode has no faithful emulation — and is
verified on-chip against an XLA oracle fed the extracted mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block 512 measured fastest on v5e at [2,2048,8,128] causal under the
# round-2 harness (min-of-trials, distinct inputs per repeat): fwd ~4.2-5.1
# ms and fwd+bwd ~5.0-5.6 ms vs 4.6-6.0 / 5.3-7.0 at block 256 — see
# BASELINE.md notes and tools/bench_flash.py.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30  # large finite negative: avoids NaN from (-inf) - (-inf)

# Tests only: force interpret-mode pallas_call through the PUBLIC
# flash_attention/custom-vjp path (CPU has no Mosaic). The sharded
# kernel-dispatch tests (tests/test_kernel_shard.py) flip this to run the
# exact shard_map-wrapped serving/training path on the virtual CPU mesh.
_FORCE_INTERPRET = False


# ---------------------------------------------------------------------------
# Banded-grid machinery
# ---------------------------------------------------------------------------

def _block_needed(qi, kj, *, causal, src_len, block_q, block_k):
    if not causal:
        return True
    return kj * block_k <= qi * block_q + block_q - 1 + src_len


def _band_pairs(nq, nk, *, causal, src_len, block_q, block_k,
                k_major: bool):
    """Static (qi, kj) block pairs inside the causal band.

    k_major=False: ordered by qi then kj (forward / dQ — the running
    softmax / dQ accumulator lives across consecutive kj of one row).
    k_major=True: ordered by kj then qi (dK/dV accumulators live across
    consecutive qi of one k column)."""
    pairs = []
    if k_major:
        for kj in range(nk):
            for qi in range(nq):
                if _block_needed(qi, kj, causal=causal, src_len=src_len,
                                 block_q=block_q, block_k=block_k):
                    pairs.append((qi, kj))
    else:
        for qi in range(nq):
            for kj in range(nk):
                if _block_needed(qi, kj, causal=causal, src_len=src_len,
                                 block_q=block_q, block_k=block_k):
                    pairs.append((qi, kj))
    qi_map = np.asarray([p[0] for p in pairs], np.int32)
    kj_map = np.asarray([p[1] for p in pairs], np.int32)
    return qi_map, kj_map


def _last_k(qi, *, causal, src_len, block_q, block_k, nk):
    """Largest in-band kj for row qi (traced int32)."""
    if not causal:
        return nk - 1
    return jnp.minimum(nk - 1,
                       (qi * block_q + block_q - 1 + src_len) // block_k)


def _first_q(kj, *, causal, src_len, block_q, block_k):
    """Smallest in-band qi for column kj (traced int32)."""
    if not causal:
        return jnp.int32(0)
    # ceil((k_start - src_len - (block_q - 1)) / block_q), clamped to 0.
    return jnp.maximum(0, -(-(kj * block_k - src_len - block_q + 1)
                            // block_q))


def dropout_scale_from_positions(seed0, seed1, bh, q_pos, k_pos, *,
                                 rate: float):
    """{0, 1/(1-rate)} dropout scale from GLOBAL logical positions.

    Pure integer hash of (seed words, batch*head, q position, k position)
    with murmur3-style mixing; works identically under Pallas (scalar bh,
    iota-built positions) and plain JAX (broadcast arrays) — ring attention
    (parallel/ring_attention.py) reuses it so sequence-parallel training
    drops the same attention probabilities regardless of how T is sharded.
    All integer inputs must be int32; broadcasting applies."""
    x = (q_pos * np.int32(-1640531527)        # 0x9E3779B9: golden ratio
         + k_pos * np.int32(0x3243F6A9)       # pi fractional bits
         + bh * np.int32(0x27D4EB2F)
         + seed0 * np.int32(0x165667B1)
         + seed1)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # murmur3 fmix32 x2 for avalanche.
    for mult in (np.uint32(0x85EBCA6B), np.uint32(0xC2B2AE35),
                 np.uint32(0x85EBCA6B), np.uint32(0xC2B2AE35)):
        u = u ^ (u >> np.uint32(16))
        u = u * mult
    u = u ^ (u >> np.uint32(16))
    threshold = np.uint32(min(2 ** 32 - 1, int(round(rate * 2.0 ** 32))))
    inv = np.float32(1.0 / (1.0 - rate))
    return jnp.where(u >= threshold, inv, np.float32(0.0))


def _dropout_scale_mask(seed_ref, bh, q_start, k_start, *, rate: float,
                        shape):
    """{0, 1/(1-rate)} mask block from a counter-based hash.

    Keyed on (user seed words, batch*head, GLOBAL q position, GLOBAL k
    position) and computed with ordinary vector ops (iota + murmur3-style
    integer mixing), so every kernel that regenerates a block gets
    bit-identical values regardless of grid order, block size, or vector
    layout — the property the fused backward relies on. (The hardware PRNG
    pltpu.prng_random_bits was observed to produce layout-dependent bit
    placement across kernels with different bodies, which silently broke
    fwd/bwd mask agreement; a logical-position hash cannot.)"""
    # seed words 2/3 carry GLOBAL position offsets (0 single-device;
    # ring attention passes each kv block's global origin so the hash is
    # identical no matter how the sequence is sharded around the ring).
    q_pos = (q_start + seed_ref[2]
             + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
    k_pos = (k_start + seed_ref[3]
             + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    return dropout_scale_from_positions(seed_ref[0], seed_ref[1], bh,
                                        q_pos, k_pos, rate=rate)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(qi_ref, kj_ref, seed_ref, bm_ref, q_ref, k_ref, v_ref,
                o_ref, lse_ref, m_scratch, l_scratch, acc_scratch, *,
                scale: float, causal: bool, src_len: int, t_actual: int,
                block_q: int, block_k: int, nk: int, dropout_rate: float):
    # bm_ref maps the LOCAL (batch*head) grid index to the GLOBAL one —
    # identity single-device; under shard_map (parallel/kernel_shard.py)
    # it carries mesh-axis offsets so the dropout hash keys on global
    # (b, h) and the sharded mask is bit-identical to the unsharded one.
    bh = bm_ref[pl.program_id(0)]
    t = pl.program_id(1)
    qi = qi_ref[t]
    kj = kj_ref[t]

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

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
    p = jnp.exp(s - m_new)  # [bq, bk] — UNdropped: feeds the denominator
    l_new = l_scratch[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        p_acc = p * _dropout_scale_mask(seed_ref, bh, q_start, k_start,
                                        rate=dropout_rate,
                                        shape=(block_q, block_k))
    else:
        p_acc = p
    pv = jax.lax.dot_general(
        p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(kj == _last_k(qi, causal=causal, src_len=src_len,
                           block_q=block_q, block_k=block_k, nk=nk))
    def _finalize():
        # Rows that saw no valid key (can't happen for causal with
        # src_len >= 0 and t_actual > 0, but guard against l == 0).
        l = l_scratch[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        if lse_ref is not None:
            # Log-sum-exp per row, consumed by the backward kernels.
            lse_ref[0] = m_scratch[:] + jnp.log(l_safe)


def _flash_forward(q, k, v, *, causal: bool, src_len: int,
                   block_q: int, block_k: int, interpret: bool = False,
                   return_lse: bool = False, dropout_rate: float = 0.0,
                   seed=None, bh_map=None, pos_off=None):
    """q: [B, Tq, H, hd]; k, v: [B, Tk, H, hd] -> [B, Tq, H, hd]
    (+ log-sum-exp [B*H, Tq_padded, 1] when return_lse).

    bh_map: int32 [B*H] local->global (batch*head) index map for the
    dropout hash (identity when None); see _fwd_kernel."""
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5
    interpret = interpret or _FORCE_INTERPRET
    if bh_map is None:
        bh_map = jnp.arange(B * H, dtype=jnp.int32)

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

    qi_map, kj_map = _band_pairs(nq, nk, causal=causal, src_len=src_len,
                                 block_q=block_q, block_k=block_k,
                                 k_major=False)
    seed_arr = _with_pos_off(_as_seed(seed), pos_off)

    kw = dict(scale=scale, causal=causal, src_len=src_len, t_actual=Tk,
              block_q=block_q, block_k=block_k, nk=nk,
              dropout_rate=dropout_rate)
    spec_q = pl.BlockSpec((1, block_q, hd),
                          lambda b, t, qm, km, sd, bm: (b, qm[t], 0))
    spec_k = pl.BlockSpec((1, block_k, hd),
                          lambda b, t, qm, km, sd, bm: (b, km[t], 0))
    spec_lse = pl.BlockSpec((1, block_q, 1),
                            lambda b, t, qm, km, sd, bm: (b, qm[t], 0))

    if return_lse:
        kernel = functools.partial(_fwd_kernel, **kw)
        out_shapes = (
            jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, nq * block_q, 1), jnp.float32),
        )
        out_specs = (spec_q, spec_lse)
    else:
        kernel = functools.partial(
            lambda *refs, **kws: _fwd_kernel(*refs[:8], None, *refs[8:],
                                             **kws), **kw)
        out_shapes = jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype)
        out_specs = spec_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B * H, len(qi_map)),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(qi_map, kj_map, seed_arr, bh_map, qb, kb, vb)

    if return_lse:
        out, lse = res
        out = out[:, :Tq].reshape(B, H, Tq, hd).transpose(0, 2, 1, 3)
        return out, lse
    out = res[:, :Tq]
    return out.reshape(B, H, Tq, hd).transpose(0, 2, 1, 3)


def _round_up(x, m=128):
    return ((x + m - 1) // m) * m


def _as_seed(seed):
    if seed is None:
        return jnp.zeros((2,), jnp.int32)
    seed = jnp.asarray(seed)
    if seed.dtype != jnp.int32:
        seed = jax.lax.bitcast_convert_type(seed, jnp.int32)
    seed = seed.reshape(-1)[:2]
    if seed.shape[0] < 2:
        # Scalar seeds: pad to the two words every kernel reads
        # (seed_ref[1] on a 1-word array would be an OOB SMEM read).
        seed = jnp.concatenate(
            [seed, jnp.zeros((2 - seed.shape[0],), jnp.int32)])
    # Words 2/3: global (q, k) dropout-position offsets, zero by default
    # (_with_pos_off overwrites them for the ring's rotated kv blocks).
    return jnp.concatenate([seed, jnp.zeros((2,), jnp.int32)])


def _with_pos_off(seed_arr, pos_off):
    """Write (q_off, k_off) global dropout-position offsets into seed
    words 2/3. pos_off: None or a pair of int32 scalars (may be traced —
    ring attention derives them from jax.lax.axis_index)."""
    if pos_off is None:
        return seed_arr
    q_off, k_off = pos_off
    return seed_arr.at[2].set(jnp.asarray(q_off, jnp.int32)) \
                   .at[3].set(jnp.asarray(k_off, jnp.int32))


# ---------------------------------------------------------------------------
# Reference oracle (tests) — the XLA attention path
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, *, causal: bool, src_len: int):
    from sea_tpu.ops.attention import attention_core
    return attention_core(q, k, v, causal=causal, src_len=src_len)


# ---------------------------------------------------------------------------
# Fused Pallas backward (flash-attention-2 style)
#
# With residuals O and per-row log-sum-exp L (M the dropout scale mask,
# identity when dropout_rate == 0):
#   P  = exp(QK^T * scale - L)          (masked entries -> 0)
#   D  = rowsum(dO * O)                 (= rowsum((P*M) * dO V^T))
#   dV = (P*M)^T dO
#   dS = P * (M * (dO V^T) - D)
#   dQ = dS K * scale ;  dK = dS^T Q * scale
# Two kernels: dQ over the band ordered (qi, kj) accumulating over kj;
# dK/dV over the band ordered (kj, qi) accumulating over qi. Scores are
# recomputed per block in VMEM — O(T) HBM, like the forward; out-of-band
# blocks are never scheduled, so no wasted DMA either.
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


def _bwd_dq_kernel(qi_ref, kj_ref, seed_ref, bm_ref, q_ref, k_ref, v_ref,
                   do_ref, lse_ref, dsum_ref, dq_ref, acc, *, scale, causal,
                   src_len, tq_actual, tk_actual, block_q, block_k, nk,
                   dropout_rate):
    bh = bm_ref[pl.program_id(0)]  # global (b, h) for the dropout hash
    t = pl.program_id(1)
    qi = qi_ref[t]
    kj = kj_ref[t]

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q_start = qi * block_q
    k_start = kj * block_k
    p = _recompute_p(q_ref[0], k_ref[0], lse_ref[0], q_start, k_start,
                     scale=scale, causal=causal, src_len=src_len,
                     tq_actual=tq_actual, tk_actual=tk_actual,
                     block_q=block_q, block_k=block_k)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = dp * _dropout_scale_mask(seed_ref, bh, q_start, k_start,
                                      rate=dropout_rate,
                                      shape=(block_q, block_k))
    ds = p * (dp - dsum_ref[0].reshape(block_q, 1))
    acc[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(kj == _last_k(qi, causal=causal, src_len=src_len,
                           block_q=block_q, block_k=block_k, nk=nk))
    def _finalize():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(qi_ref, kj_ref, seed_ref, bm_ref, q_ref, k_ref, v_ref,
                    do_ref, lse_ref, dsum_ref, dk_ref, dv_ref, acc_dk,
                    acc_dv, *, scale, causal, src_len, tq_actual, tk_actual,
                    block_q, block_k, nq, dropout_rate):
    bh = bm_ref[pl.program_id(0)]  # global (b, h) for the dropout hash
    t = pl.program_id(1)
    qi = qi_ref[t]
    kj = kj_ref[t]

    @pl.when(qi == _first_q(kj, causal=causal, src_len=src_len,
                            block_q=block_q, block_k=block_k))
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    q_start = qi * block_q
    k_start = kj * block_k
    p = _recompute_p(q_ref[0], k_ref[0], lse_ref[0], q_start, k_start,
                     scale=scale, causal=causal, src_len=src_len,
                     tq_actual=tq_actual, tk_actual=tk_actual,
                     block_q=block_q, block_k=block_k)
    if dropout_rate > 0.0:
        m = _dropout_scale_mask(seed_ref, bh, q_start, k_start,
                                rate=dropout_rate,
                                shape=(block_q, block_k))
        pd = p * m
    else:
        m = None
        pd = p
    # dV += (P*M)^T dO
    acc_dv[:] += jax.lax.dot_general(
        pd.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if m is not None:
        dp = dp * m
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
                    block_q: int, block_k: int, interpret: bool = False,
                    dropout_rate: float = 0.0, seed=None, bh_map=None,
                    pos_off=None):
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    scale = hd ** -0.5
    interpret = interpret or _FORCE_INTERPRET
    if bh_map is None:
        bh_map = jnp.arange(B * H, dtype=jnp.int32)

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
    seed_arr = _with_pos_off(_as_seed(seed), pos_off)

    kw = dict(scale=scale, causal=causal, src_len=src_len, tq_actual=Tq,
              tk_actual=Tk, block_q=block_q, block_k=block_k,
              dropout_rate=dropout_rate)

    spec_q = pl.BlockSpec((1, block_q, hd),
                          lambda b, t, qm, km, sd, bm: (b, qm[t], 0))
    spec_k = pl.BlockSpec((1, block_k, hd),
                          lambda b, t, qm, km, sd, bm: (b, km[t], 0))
    spec_row_q = pl.BlockSpec((1, block_q, 1),
                              lambda b, t, qm, km, sd, bm: (b, qm[t], 0))

    # dQ: band ordered (qi, kj) — kj innermost for the dQ accumulator.
    qi_map, kj_map = _band_pairs(nq, nk, causal=causal, src_len=src_len,
                                 block_q=block_q, block_k=block_k,
                                 k_major=False)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, nk=nk, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B * H, len(qi_map)),
            in_specs=[spec_q, spec_k, spec_k, spec_q, spec_row_q,
                      spec_row_q],
            out_specs=spec_q,
            scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, nq * block_q, hd), q.dtype),
        interpret=interpret,
    )(qi_map, kj_map, seed_arr, bh_map, qb, kb, vb, dob, lse, dsum)

    # dK/dV: band ordered (kj, qi) — qi innermost for the dK/dV accumulators.
    qi_map_t, kj_map_t = _band_pairs(nq, nk, causal=causal, src_len=src_len,
                                     block_q=block_q, block_k=block_k,
                                     k_major=True)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, nq=nq, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B * H, len(qi_map_t)),
            in_specs=[spec_q, spec_k, spec_k, spec_q, spec_row_q,
                      spec_row_q],
            out_specs=(spec_k, spec_k),
            scratch_shapes=[pltpu.VMEM((block_k, hd), jnp.float32),
                            pltpu.VMEM((block_k, hd), jnp.float32)],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, nk * block_k, hd), k.dtype),
            jax.ShapeDtypeStruct((B * H, nk * block_k, hd), v.dtype),
        ),
        interpret=interpret,
    )(qi_map_t, kj_map_t, seed_arr, bh_map, qb, kb, vb, dob, lse, dsum)

    # Key columns entirely above the causal band have NO (qi, kj) pairs in
    # the banded grid: their output blocks are never written (the kernel's
    # init/finalize never run there), so zero them explicitly — those
    # positions receive no gradient. Only reachable for Tk > Tq + src_len
    # (cross-attention shapes).
    if causal:
        band_k_end = min(nk * block_k, nq * block_q + src_len)
        if band_k_end < nk * block_k:
            col = jnp.arange(nk * block_k)[None, :, None] < band_k_end
            dk = jnp.where(col, dk, 0)
            dv = jnp.where(col, dv, 0)

    def from_bh(x, T):
        return x[:, :T].reshape(B, H, T, hd).transpose(0, 2, 1, 3)

    return from_bh(dq, Tq), from_bh(dk, Tk), from_bh(dv, Tk)


# ---------------------------------------------------------------------------
# Debug/oracle: materialize the exact in-kernel dropout mask
# ---------------------------------------------------------------------------

def _mask_kernel(seed_ref, bm_ref, m_ref, *, rate, block_q, block_k):
    m_ref[0] = _dropout_scale_mask(seed_ref, bm_ref[pl.program_id(0)],
                                   pl.program_id(1) * block_q,
                                   pl.program_id(2) * block_k,
                                   rate=rate, shape=(block_q, block_k))


def _dropout_mask_dense(BH: int, Tq: int, Tk: int, seed, rate: float, *,
                        block_q: int = DEFAULT_BLOCK_Q,
                        block_k: int = DEFAULT_BLOCK_K,
                        interpret: bool = False, bh_map=None):
    """[BH, Tq_pad, Tk_pad] scale mask identical to the kernels' (the hash
    is a pure function of logical positions, so this works in interpret
    mode too). Test/verification helper."""
    block_q = min(block_q, _round_up(Tq))
    block_k = min(block_k, _round_up(Tk))
    nq, nk = pl.cdiv(Tq, block_q), pl.cdiv(Tk, block_k)
    if bh_map is None:
        bh_map = jnp.arange(BH, dtype=jnp.int32)
    return pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate, block_q=block_q,
                          block_k=block_k),
        grid=(BH, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, block_q, block_k),
                               lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((BH, nq * block_q, nk * block_k),
                                       jnp.float32),
        interpret=interpret,
    )(_as_seed(seed), bh_map)


# ---------------------------------------------------------------------------
# custom_vjp plumbing + public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_p(q, k, v, seed, bh_map, causal, src_len, dropout_rate,
                       block_q, block_k):
    return _flash_forward(q, k, v, causal=causal, src_len=src_len,
                          block_q=block_q, block_k=block_k,
                          dropout_rate=dropout_rate, seed=seed,
                          bh_map=bh_map)


def _fwd(q, k, v, seed, bh_map, causal, src_len, dropout_rate, block_q,
         block_k):
    out, lse = _flash_forward(q, k, v, causal=causal, src_len=src_len,
                              block_q=block_q, block_k=block_k,
                              return_lse=True, dropout_rate=dropout_rate,
                              seed=seed, bh_map=bh_map)
    return out, (q, k, v, seed, bh_map, out, lse)


def _bwd(causal, src_len, dropout_rate, block_q, block_k, res, g):
    q, k, v, seed, bh_map, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal=causal,
                                 src_len=src_len, block_q=block_q,
                                 block_k=block_k, dropout_rate=dropout_rate,
                                 seed=seed, bh_map=bh_map)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    dbh = np.zeros(bh_map.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed, dbh


_flash_attention_p.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, causal: bool = True, src_len: int = 0,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K, *,
                    dropout_rate: float = 0.0, dropout_seed=None,
                    bh_map=None):
    """Flash attention with optional in-kernel attention-prob dropout.

    dropout_seed: int32 array (any shape; first two words used) — required
    when dropout_rate > 0. Derive it from the step's PRNGKey so every train
    step gets fresh masks.

    bh_map: int32 [B*H] local->global (batch*head) index map for the
    dropout hash. Defaults to identity; parallel/kernel_shard.py passes
    mesh-offset maps inside shard_map so a batch/head-sharded program
    drops exactly the same probabilities as the single-device one."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("flash_attention: dropout_rate > 0 requires a "
                         "dropout_seed (derive from the step PRNGKey)")
    seed = _as_seed(dropout_seed)
    B, _, H, _ = q.shape
    if bh_map is None:
        bh_map = jnp.arange(B * H, dtype=jnp.int32)
    return _flash_attention_p(q, k, v, seed, bh_map, causal, src_len,
                              float(dropout_rate), block_q, block_k)


def flash_supported(q, k, *, causal: bool, dropout_rate: float,
                    deterministic: bool, has_dropout_key: bool = False
                    ) -> bool:
    """Auto-dispatch policy for ops.attention.mha: use the Pallas kernel on
    TPU where it measures faster (BASELINE.md kernel table, v5e):

    - WITH attention-probability dropout (the reference trains the
      cylinder temporal with dropout=0.1): the in-kernel counter-hash
      mask beats XLA's materialized mask+PRNG from T>=256 (1.45x on the
      full cylinder T=399 step, 2.2x at T=2048). Needs a dropout key to
      seed the kernel PRNG.
    - WITHOUT dropout: XLA's fused attention is ~1.2-1.3x faster at the
      shipped short shapes (T=199/399, repeats-amortized sweep) and the
      banded-grid kernel only pulls ahead at long T (1.6-1.7x at
      T=2048), so require T>=1024.
    """
    from sea_tpu.ops.dispatch import attention_kernels_allowed
    if not attention_kernels_allowed():
        # Tracing inside a multi-device GSPMD program (ops/dispatch.py):
        # pallas has no partitioning rule there; XLA attention partitions
        # cleanly. shard_map paths (ring, pipeline) are unaffected.
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    Tq, Tk = q.shape[1], k.shape[1]
    if dropout_rate > 0.0 and not deterministic:
        return has_dropout_key and Tq >= 256 and Tk >= 256
    return Tq >= 1024 and Tk >= 1024
