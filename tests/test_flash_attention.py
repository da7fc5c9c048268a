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
    """Fused Pallas backward vs differentiating the XLA path (interpret)."""
    from sea_tpu.ops.flash_attention import _flash_backward, _flash_forward

    for Tq, Tk, causal, src_len in [(256, 256, True, 0),
                                    (300, 300, True, 3),
                                    (128, 384, False, 0)]:
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
