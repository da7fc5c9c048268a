"""Ring attention vs the single-device reference on the virtual 8-way mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sea_tpu.ops.attention import attention_core
from sea_tpu.parallel.ring_attention import ring_attention

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _seq_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


@requires_8
@pytest.mark.parametrize("causal,src_len", [(True, 0), (True, 3),
                                            (False, 0)])
def test_ring_matches_single_device(causal, src_len):
    B, T, H, hd = 2, 64, 2, 16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))

    ref = attention_core(q, k, v, causal=causal, src_len=src_len)
    mesh = _seq_mesh(8)
    got = ring_attention(q, k, v, mesh, causal=causal, src_len=src_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               err_msg=f"causal={causal} src_len={src_len}")


@requires_8
def test_ring_four_devices():
    B, T, H, hd = 1, 32, 2, 8
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, T, H, hd))
    ref = attention_core(q, q, q, causal=True, src_len=0)
    got = ring_attention(q, q, q, _seq_mesh(4), causal=True, src_len=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@requires_8
def test_ring_attention_gradients():
    """shard_map + ppermute is differentiable; gradients must match the
    single-device attention gradients."""
    B, T, H, hd = 1, 16, 2, 8
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    mesh = _seq_mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True,
                                      src_len=0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_core(q, k, v, causal=True, src_len=0) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"d{name}")
