"""Pallas flash attention vs the XLA reference path.

Runs the kernel in interpret mode on CPU (bit-comparable semantics without
TPU hardware); real-mode execution is exercised by bench.py / TPU runs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.ops.attention import attention_core
from sea_tpu.ops.flash_attention import _flash_forward, _xla_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             dtype=jnp.float32)


@pytest.mark.parametrize("Tq,Tk,causal,src_len", [
    (256, 256, True, 0),
    (256, 256, False, 0),
    (300, 300, True, 0),     # non-multiple of block -> padding path
    (384, 384, True, 5),     # offset diagonal
    (128, 384, False, 0),    # cross-attention shapes
])
def test_flash_matches_xla(Tq, Tk, causal, src_len):
    B, H, hd = 2, 2, 64
    q = _rand((B, Tq, H, hd), 0)
    k = _rand((B, Tk, H, hd), 1)
    v = _rand((B, Tk, H, hd), 2)
    ref = attention_core(q, k, v, causal=causal, src_len=src_len)
    got = _flash_forward(q, k, v, causal=causal, src_len=src_len,
                         block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    B, T, H, hd = 1, 256, 2, 64
    q = _rand((B, T, H, hd), 3).astype(jnp.bfloat16)
    k = _rand((B, T, H, hd), 4).astype(jnp.bfloat16)
    v = _rand((B, T, H, hd), 5).astype(jnp.bfloat16)
    ref = attention_core(q, k, v, causal=True, src_len=0)
    got = _flash_forward(q, k, v, causal=True, src_len=0,
                         block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), atol=3e-2)


def test_flash_dropout_matches_oracle():
    """In-kernel dropout (counter-hash mask) fwd+bwd vs an XLA oracle fed
    the EXTRACTED mask — exact math in interpret mode on CPU. Proves the
    forward and both backward kernels regenerate the identical mask."""
    from sea_tpu.ops.flash_attention import (_dropout_mask_dense,
                                             _flash_backward,
                                             _flash_forward)
    B, T, H, hd = 1, 384, 2, 64
    rate, causal, src_len = 0.1, True, 0
    bq = bk = 128
    q = _rand((B, T, H, hd), 10)
    k = _rand((B, T, H, hd), 11)
    v = _rand((B, T, H, hd), 12)
    g = _rand((B, T, H, hd), 13)
    seed = jnp.asarray([123, 456], jnp.int32)

    mask = _dropout_mask_dense(B * H, T, T, seed, rate, block_q=bq,
                               block_k=bk, interpret=True)

    def oracle(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        qi = jnp.arange(T)[:, None]
        kj = jnp.arange(T)[None, :]
        s = jnp.where((kj <= qi + src_len)[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1) * mask.reshape(B, H, T, T)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32)

    ref, vjp = jax.vjp(oracle, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = _flash_forward(q, k, v, causal=causal, src_len=src_len,
                              block_q=bq, block_k=bk, interpret=True,
                              return_lse=True, dropout_rate=rate, seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal=causal,
                                 src_len=src_len, block_q=bq, block_k=bk,
                                 interpret=True, dropout_rate=rate,
                                 seed=seed)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=5e-5)

    # Seed-dependence + keep-rate sanity of the extracted mask itself.
    mask2 = _dropout_mask_dense(B * H, T, T, jnp.asarray([7, 8], jnp.int32),
                                rate, block_q=bq, block_k=bk, interpret=True)
    assert not np.array_equal(np.asarray(mask), np.asarray(mask2))
    keep = float((np.asarray(mask) > 0).mean())
    assert abs(keep - (1 - rate)) < 0.01, keep


def test_flash_gradient_matches_xla():
    """Fused Pallas backward vs differentiating the XLA path (interpret)."""
    from sea_tpu.ops.flash_attention import _flash_backward, _flash_forward

    # (128, 384, True, 0): Tk > Tq + src_len — key columns entirely above
    # the causal band have no grid pairs and must come back as EXPLICIT
    # zero gradients (regression: the banded grid used to leave those
    # output blocks unwritten).
    for Tq, Tk, causal, src_len in [(256, 256, True, 0),
                                    (300, 300, True, 3),
                                    (128, 384, False, 0),
                                    (128, 384, True, 0)]:
        B, H, hd = 1, 2, 64
        q = _rand((B, Tq, H, hd), 6)
        k = _rand((B, Tk, H, hd), 7)
        v = _rand((B, Tk, H, hd), 8)
        g = _rand((B, Tq, H, hd), 9)

        def f(q, k, v):
            return _xla_attention(q, k, v, causal=causal, src_len=src_len)

        _, vjp = jax.vjp(f, q, k, v)
        dq_ref, dk_ref, dv_ref = vjp(g)

        out, lse = _flash_forward(q, k, v, causal=causal, src_len=src_len,
                                  block_q=128, block_k=128, interpret=True,
                                  return_lse=True)
        dq, dk, dv = _flash_backward(q, k, v, out, lse, g, causal=causal,
                                     src_len=src_len, block_q=128,
                                     block_k=128, interpret=True)
        label = f"Tq={Tq},Tk={Tk},causal={causal},src_len={src_len}"
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                                   atol=5e-5, err_msg="dq " + label)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                                   atol=5e-5, err_msg="dk " + label)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                                   atol=5e-5, err_msg="dv " + label)


def test_scalar_dropout_seed_padded():
    """flash_attention accepts a scalar dropout_seed (docstring contract);
    _as_seed must pad to the four words every kernel reads (two seed
    words + the round-5 global-position offsets, zero by default)."""
    from sea_tpu.ops.flash_attention import _as_seed, _with_pos_off
    s = _as_seed(7)
    assert s.shape == (4,) and s.dtype == jnp.int32
    assert int(s[0]) == 7 and int(s[1]) == 0
    assert int(s[2]) == 0 and int(s[3]) == 0
    s2 = _as_seed(jnp.asarray([1, 2, 3], jnp.int32))
    assert s2.shape == (4,)
    s3 = _with_pos_off(s, (5, 9))
    assert [int(v) for v in s3] == [7, 0, 5, 9]
