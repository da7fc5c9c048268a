"""Ring attention: sequence-parallel causal attention over a device mesh.

The reference materializes full [T, T] attention with T <= 2024 on one
device (SURVEY §5.7) — fine at SEA's scale, and our Pallas flash kernel
already makes that O(T) in memory. This module is the documented growth
path made real: when T outgrows one chip, shard the sequence over a 'seq'
mesh axis and rotate key/value shards around the ring with
``jax.lax.ppermute`` (XLA lowers it to ICI sends), accumulating
online-softmax statistics exactly like flash attention — each device only
ever holds T/n of the sequence.

Semantics match ops.attention.attention_core (causal with the
tril(diagonal=src_len) offset) and are verified against it on the virtual
8-device mesh in tests/test_ring_attention.py.

Layout: q, k, v are [B, T, H, hd] with T divisible by the ring size; the
caller shards axis 1 over 'seq' (shard_map handles it here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attend(q, k, v, m, l, acc, q_off, k_off, *, scale, causal,
                  src_len, dropout_rate=0.0, dropout_seed=None):
    """One flash-style accumulation step of local q against one k/v block.

    q: [B, Tq, H, hd]; k/v: [B, Tk, H, hd]; m/l: [B, H, Tq, 1] running
    max / normalizer; acc: [B, Tq, H, hd] f32. Offsets are the blocks'
    global sequence positions.

    Dropout (training): the same counter-hash mask as the flash kernel
    (ops/flash_attention.dropout_scale_from_positions), keyed on GLOBAL
    (q, k) positions — so the mask is identical no matter how the sequence
    is sharded around the ring. The normalizer l accumulates UNdropped
    probabilities (dropout applies to the normalized probs, torch
    F.dropout-after-softmax semantics); only the value accumulation is
    masked.
    """
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        q_pos = q_off + jnp.arange(Tq)[:, None]
        k_pos = k_off + jnp.arange(Tk)[None, :]
        mask = k_pos <= q_pos + src_len
        s = jnp.where(mask[None, None], s, -1e30)
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [B,H,Tq,1]
    m_new = jnp.maximum(m, m_cur)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        from sea_tpu.ops.flash_attention import dropout_scale_from_positions
        shape4 = (B, H, Tq, Tk)
        bh = (jax.lax.broadcasted_iota(jnp.int32, shape4, 0) * H
              + jax.lax.broadcasted_iota(jnp.int32, shape4, 1))
        qp = q_off + jax.lax.broadcasted_iota(jnp.int32, shape4, 2)
        kp = k_off + jax.lax.broadcasted_iota(jnp.int32, shape4, 3)
        drop = dropout_scale_from_positions(dropout_seed[0], dropout_seed[1],
                                            bh, qp, kp, rate=dropout_rate)
        p_acc = p * drop
    else:
        p_acc = p
    pv = jnp.einsum("bhqk,bkhd->bqhd", p_acc.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    # alpha is [B,H,Tq,1]; acc is [B,Tq,H,hd].
    acc_new = acc * alpha.transpose(0, 2, 1, 3) + pv
    return m_new, l_new, acc_new


# ---------------------------------------------------------------------------
# Flash-kernel ring body (round-4 VERDICT item 6)
#
# The dense _block_attend einsum materializes [B, H, Tl, Tk] score blocks
# in XLA — exactly the buffer the single-chip path eliminates with the
# Pallas kernel. Here each (local-q x kv-block) pair runs the banded
# flash kernel instead (scores only ever exist as VMEM tiles), returning
# per-block (out, lse); blocks combine with the standard log-sum-exp
# merge. Gradients: a ring of the fused flash BACKWARD kernels — each
# pair's (dq, dk, dv) contribution is the restriction of the full
# attention backward to that block given the GLOBAL (out, lse), dk/dv
# accumulators rotate with their kv block and arrive home after a full
# cycle. Dropout stays bit-identical to the dense ring: the kernels hash
# the same GLOBAL (q, k) positions (seed words 2/3 carry each block's
# global origin, ops/flash_attention._with_pos_off).
# ---------------------------------------------------------------------------


def _pair_geometry(s, idx, n_dev, Tl):
    """Global offsets for ring step s: q block at idx*Tl, kv block
    originated (idx - s) mod n_dev."""
    q_off = idx * Tl
    k_off = ((idx - s) % n_dev) * Tl
    return q_off, k_off


def _flash_pair_fwd(q, k, v, seed, q_off, k_off, *, causal, dropout_rate):
    """One (q-shard x kv-block) pair through the flash kernel.
    Returns (out [B,Tl,H,hd], lse [B,H,Tl,1] f32)."""
    from sea_tpu.ops import flash_attention as fa
    B, Tl, H, hd = q.shape
    out, lse = fa._flash_forward(
        q, k, v, causal=causal, src_len=0,
        block_q=fa.DEFAULT_BLOCK_Q, block_k=fa.DEFAULT_BLOCK_K,
        return_lse=True, dropout_rate=dropout_rate, seed=seed,
        pos_off=(q_off, k_off))
    lse = lse[:, :Tl].reshape(B, H, Tl, 1)
    return out, lse


def _combine_blocks(out_acc, lse_acc, out_b, lse_b):
    """Log-sum-exp merge of two normalized partial attentions.
    out_*: [B,Tl,H,hd] (acc f32); lse_*: [B,H,Tl,1] f32."""
    lse_new = jnp.maximum(lse_acc, lse_b) + jnp.log1p(
        jnp.exp(-jnp.abs(lse_acc - lse_b)))
    # exp(-inf - -inf) guard: untouched rows keep lse -inf and weight 0.
    w_acc = jnp.exp(lse_acc - lse_new)
    w_b = jnp.exp(lse_b - lse_new)
    w_acc = jnp.where(jnp.isfinite(lse_acc), w_acc, 0.0)
    w_b = jnp.where(jnp.isfinite(lse_b), w_b, 0.0)
    to_bthd = lambda w: w.transpose(0, 2, 1, 3)  # [B,H,Tl,1]->[B,Tl,H,1]
    out_new = out_acc * to_bthd(w_acc) + out_b.astype(jnp.float32) \
        * to_bthd(w_b)
    return out_new, lse_new


def _ring_flash_fwd_impl(q, k, v, seed, axis, n_dev, causal, src_len,
                         dropout_rate):
    """Forward ring with flash-kernel pairs. src_len must be 0 for the
    causal path (the skip/full-block split below relies on it; gated in
    ring_attention)."""
    del src_len
    idx = jax.lax.axis_index(axis)
    B, Tl, H, hd = q.shape
    out_acc = jnp.zeros((B, Tl, H, hd), jnp.float32)
    lse_acc = jnp.full((B, H, Tl, 1), -jnp.inf, jnp.float32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    k_cur, v_cur = k, v
    for s in range(n_dev):
        if s:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
        q_off, k_off = _pair_geometry(s, idx, n_dev, Tl)

        def attend(args, s=s, q_off=q_off, k_off=k_off):
            oa, la, kc, vc = args
            ob, lb = _flash_pair_fwd(q, kc, vc, seed, q_off, k_off,
                                     causal=causal and s == 0,
                                     dropout_rate=dropout_rate)
            oa, la = _combine_blocks(oa, la, ob, lb)
            return oa, la

        if causal and s:
            # With src_len == 0, a rotated block is either fully below
            # the diagonal (k_off < q_off: attend unmasked) or fully
            # above (wrapped: skip).
            pred = k_off < q_off
            out_acc, lse_acc = jax.lax.cond(
                pred, attend, lambda a: (a[0], a[1]),
                (out_acc, lse_acc, k_cur, v_cur))
        else:
            out_acc, lse_acc = attend((out_acc, lse_acc, k_cur, v_cur))
    return out_acc.astype(q.dtype), lse_acc


def _pad_lse(lse, Tl):
    """[B,H,Tl,1] -> the padded [B*H, nq*block_q, 1] layout
    _flash_backward expects from the forward."""
    from sea_tpu.ops import flash_attention as fa
    B, H = lse.shape[0], lse.shape[1]
    block_q = min(fa.DEFAULT_BLOCK_Q, fa._round_up(Tl))
    nq = -(-Tl // block_q)
    pad = nq * block_q - Tl
    flat = lse.reshape(B * H, Tl, 1)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
    return flat


def _ring_flash_bwd_impl(q, k, v, seed, out, lse, g, axis, n_dev, causal,
                         dropout_rate):
    """Ring of fused flash-backward kernels (see module comment)."""
    from sea_tpu.ops import flash_attention as fa
    idx = jax.lax.axis_index(axis)
    B, Tl, H, hd = q.shape
    lse_pad = _pad_lse(lse, Tl)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    dq_acc = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)
    for s in range(n_dev):
        if s:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk_cur = jax.lax.ppermute(dk_cur, axis, perm)
            dv_cur = jax.lax.ppermute(dv_cur, axis, perm)
        q_off, k_off = _pair_geometry(s, idx, n_dev, Tl)

        def pair_grads(args, s=s, q_off=q_off, k_off=k_off):
            dqa, dka, dva, kc, vc = args
            dq_c, dk_c, dv_c = fa._flash_backward(
                q, kc, vc, out, lse_pad, g, causal=causal and s == 0,
                src_len=0, block_q=fa.DEFAULT_BLOCK_Q,
                block_k=fa.DEFAULT_BLOCK_K, dropout_rate=dropout_rate,
                seed=seed, pos_off=(q_off, k_off))
            return (dqa + dq_c.astype(jnp.float32),
                    dka + dk_c.astype(jnp.float32),
                    dva + dv_c.astype(jnp.float32))

        if causal and s:
            pred = k_off < q_off
            dq_acc, dk_cur, dv_cur = jax.lax.cond(
                pred, pair_grads, lambda a: (a[0], a[1], a[2]),
                (dq_acc, dk_cur, dv_cur, k_cur, v_cur))
        else:
            dq_acc, dk_cur, dv_cur = pair_grads(
                (dq_acc, dk_cur, dv_cur, k_cur, v_cur))
    # After n_dev - 1 rotations the accumulators sit one hop short of
    # their owners; one more send brings them home.
    dk_home = jax.lax.ppermute(dk_cur, axis, perm)
    dv_home = jax.lax.ppermute(dv_cur, axis, perm)
    return (dq_acc.astype(q.dtype), dk_home.astype(k.dtype),
            dv_home.astype(v.dtype))


def _make_ring_flash(axis, n_dev, causal, dropout_rate):
    """custom_vjp ring-flash attend for one shard_map body; closure args
    are static per trace."""
    @jax.custom_vjp
    def rf(q, k, v, seed):
        out, _ = _ring_flash_fwd_impl(q, k, v, seed, axis, n_dev, causal,
                                      0, dropout_rate)
        return out

    def rf_fwd(q, k, v, seed):
        out, lse = _ring_flash_fwd_impl(q, k, v, seed, axis, n_dev, causal,
                                        0, dropout_rate)
        return out, (q, k, v, seed, out, lse)

    def rf_bwd(res, g):
        q, k, v, seed, out, lse = res
        dq, dk, dv = _ring_flash_bwd_impl(q, k, v, seed, out, lse, g,
                                          axis, n_dev, causal, dropout_rate)
        import numpy as np
        dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
        return dq, dk, dv, dseed

    rf.defvjp(rf_fwd, rf_bwd)
    return rf


def _ring_flash_ok(causal, src_len) -> bool:
    """Flash ring applies when: causal rings have src_len == 0 (the
    skip/full split relies on it; every shipped config qualifies) and the
    backend runs Pallas (TPU, or interpret mode under test)."""
    import jax as _jax

    from sea_tpu.ops import flash_attention as fa
    if causal and src_len != 0:
        return False
    if fa._FORCE_INTERPRET:
        return True
    return _jax.default_backend() == "tpu"


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "seq",
                   causal: bool = True, src_len: int = 0,
                   dropout_rate: float = 0.0, dropout_seed=None,
                   impl: str = "auto"):
    """q, k, v: [B, T, H, hd] (replicated or already sharded on axis 1).

    Returns [B, T, H, hd], sharded on axis 1 over ``axis``. Inside the
    shard_map body every device starts with its own k/v shard and passes it
    around the ring; after n_dev steps each q shard has attended to the
    whole sequence with O(T/n) resident memory.

    ``dropout_rate`` > 0 (training) needs ``dropout_seed`` (int32[2] seed
    words, ops.attention._key_to_seed): attention-probability dropout via
    the flash kernel's global-position counter hash, identical for every
    ring size — the shipped cylinder recipe (dropout 0.1) trains
    sequence-parallel unmodified.
    """
    n_dev = mesh.shape[axis]
    B, T, H, hd = q.shape
    assert T % n_dev == 0, (T, n_dev)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("ring attention dropout needs dropout_seed "
                         "(int32[2] seed words)")
    if impl not in ("auto", "flash", "dense"):
        raise ValueError(f"ring_attention impl {impl!r}")
    if impl == "flash" and causal and src_len != 0:
        # The flash ring hard-codes src_len == 0 semantics (the
        # skip/full-block split and the kernel calls both assume it);
        # honoring the request would silently compute the wrong band.
        raise ValueError("ring_attention impl='flash' supports causal "
                         "rings only at src_len == 0 (use impl='dense' "
                         f"for src_len={src_len})")
    scale = hd ** -0.5
    spec = P(None, axis, None, None)

    if impl == "flash" or (impl == "auto"
                           and _ring_flash_ok(causal, src_len)):
        # Flash-kernel ring: scores never materialize in HBM — each pair
        # runs the banded Pallas kernel on VMEM tiles (round-4 VERDICT
        # item 6). Dropout masks are bit-identical to the dense ring
        # (same global-position hash). check_vma=False: pallas_call has
        # no varying-mesh-axes rule.
        rf = _make_ring_flash(axis, n_dev, causal, float(dropout_rate))
        shmapped = jax.shard_map(rf, mesh=mesh,
                                 in_specs=(spec, spec, spec, P()),
                                 out_specs=spec, check_vma=False)
        seed = (jnp.zeros((2,), jnp.int32) if dropout_seed is None
                else jnp.asarray(dropout_seed, jnp.int32))
        return shmapped(q, k, v, seed)

    def body(q_loc, k_loc, v_loc, seed):
        idx = jax.lax.axis_index(axis)
        Tl = q_loc.shape[1]
        q_off = idx * Tl
        # Mark the accumulators as device-varying over the ring axis (the
        # scan body makes them depend on this device's q/k blocks).
        # jax.lax.pvary is deprecated in favor of pcast(to='varying').
        if hasattr(jax.lax, "pcast"):
            def _vary(x):
                return jax.lax.pcast(x, axis, to="varying")
        else:  # pragma: no cover — older jax
            def _vary(x):
                return jax.lax.pvary(x, axis)
        m = _vary(jnp.full((B, H, Tl, 1), -1e30, jnp.float32))
        l = _vary(jnp.zeros((B, H, Tl, 1), jnp.float32))
        acc = _vary(jnp.zeros((B, Tl, H, hd), jnp.float32))

        def attend(args):
            m, l, acc, k_cur, v_cur, k_off = args
            return _block_attend(q_loc, k_cur, v_cur, m, l, acc, q_off,
                                 k_off, scale=scale, causal=causal,
                                 src_len=src_len, dropout_rate=dropout_rate,
                                 dropout_seed=seed)

        # Attend the local block, then rotate n_dev-1 times (rotating after
        # the final block would be a wasted ICI send of the full shard).
        m, l, acc = attend((m, l, acc, k_loc, v_loc, q_off))
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, s):
            m, l, acc, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            # After s rotations this block originated at (idx - s) mod n.
            k_off = ((idx - s) % n_dev) * Tl
            if causal:
                # Skip blocks entirely above the offset diagonal.
                pred = k_off <= q_off + Tl - 1 + src_len
                m, l, acc = jax.lax.cond(
                    pred, attend, lambda a: (a[0], a[1], a[2]),
                    (m, l, acc, k_cur, v_cur, k_off))
            else:
                m, l, acc = attend((m, l, acc, k_cur, v_cur, k_off))
            return (m, l, acc, k_cur, v_cur), None

        if n_dev > 1:
            (m, l, acc, _, _), _ = jax.lax.scan(
                step, (m, l, acc, k_loc, v_loc), jnp.arange(1, n_dev))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc / l_safe.transpose(0, 2, 1, 3)
        return out.astype(q_loc.dtype)

    shmapped = jax.shard_map(body, mesh=mesh,
                             in_specs=(spec, spec, spec, P()),
                             out_specs=spec)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((2,), jnp.int32)
    return shmapped(q, k, v, jnp.asarray(dropout_seed, jnp.int32))
