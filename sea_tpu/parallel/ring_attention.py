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


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "seq",
                   causal: bool = True, src_len: int = 0,
                   dropout_rate: float = 0.0, dropout_seed=None):
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
    scale = hd ** -0.5
    spec = P(None, axis, None, None)

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
