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


def test_flash_gradient_matches_xla():
    """custom_vjp backward (XLA recompute) must match differentiating the
    XLA path directly."""
    from sea_tpu.ops.flash_attention import flash_attention
    B, T, H, hd = 1, 256, 2, 64
    q = _rand((B, T, H, hd), 6)
    k = _rand((B, T, H, hd), 7)
    v = _rand((B, T, H, hd), 8)

    def loss_flash(q, k, v):
        # interpret-mode forward via monkeypatched call is awkward; the
        # custom_vjp backward doesn't depend on the pallas forward, so test
        # the backward directly against XLA grad.
        return jnp.sum(_xla_attention(q, k, v, causal=True, src_len=0) ** 2)

    g_ref = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)

    from sea_tpu.ops.flash_attention import _bwd
    out = _xla_attention(q, k, v, causal=True, src_len=0)
    g = 2.0 * out  # d(sum(out^2))/d(out)
    g_got = _bwd(True, 0, 128, 128, (q, k, v), g)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
