"""Fused single-token cache attention (ops/decode_attention.py).

The Pallas kernel itself needs a real TPU; CPU tests run it in interpret
mode against the mha_step XLA math it replaces, and pin the dispatch
predicate. On-hardware exactness and the rollout-level A/B live behind
the TPU skip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.ops.decode_attention import decode_attention, decode_supported


def _ref(q, K, V, t):
    """mha_step's XLA math at src_len=0: f32 scores, k<=t mask, softmax.

    K/V are head-major [B, H, T, hd] — the cache layout (free kernel view).
    """
    hd = q.shape[-1]
    T = K.shape[2]
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32),
                   K.astype(jnp.float32)) * hd ** -0.5
    s = jnp.where(jnp.arange(T)[None, None, :] <= t, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p, V.astype(jnp.float32))


@pytest.mark.parametrize("B,T,H,hd,t,dt", [
    (1, 250, 8, 256, 0, jnp.float32),      # first step: 1 valid slot
    (1, 250, 8, 256, 123, jnp.bfloat16),   # int4-serving cache dtype
    (2, 399, 8, 128, 398, jnp.float32),    # last step: every slot valid
    (3, 40, 2, 128, 17, jnp.bfloat16),     # T below one block -> padded
])
def test_interpret_matches_xla_math(B, T, H, hd, t, dt):
    key = jax.random.PRNGKey(T + t)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, hd), jnp.float32)
    K = jax.random.normal(k2, (B, H, T, hd), jnp.float32).astype(dt)
    V = jax.random.normal(k3, (B, H, T, hd), jnp.float32).astype(dt)
    got = decode_attention(q, K, V, jnp.int32(t), interpret=True)
    want = _ref(q.astype(dt).astype(jnp.float32), K, V, t)
    tol = 1e-5 if dt == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=tol)


def test_interpret_inside_scan():
    """The kernel must trace under lax.scan with a traced position t —
    exactly how the rollout engine drives it."""
    B, T, H, hd = 1, 160, 2, 128
    key = jax.random.PRNGKey(0)
    K = jax.random.normal(key, (B, H, T, hd))
    V = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, hd))
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, H, hd))

    def step(carry, t):
        return carry, decode_attention(q, K, V, t, interpret=True)

    _, outs = jax.lax.scan(step, 0, jnp.arange(T, dtype=jnp.int32))
    for t in (0, 77, T - 1):
        np.testing.assert_allclose(np.asarray(outs[t]),
                                   np.asarray(_ref(q, K, V, t)),
                                   rtol=0, atol=1e-5)


def test_gspmd_trace_gate():
    """Inside attention_kernels_disabled (how the multi-device GSPMD step
    constructors trace), both Pallas dispatch predicates must refuse, and
    the thread-local flag must restore on exit — even nested."""
    from sea_tpu.ops.dispatch import (attention_kernels_allowed,
                                      attention_kernels_disabled)
    from sea_tpu.ops.flash_attention import flash_supported
    q = jnp.zeros((2, 2048, 8, 128))
    assert attention_kernels_allowed()
    with attention_kernels_disabled(True):
        assert not decode_supported(1, 250, 8, 256, backend="tpu")
        assert not flash_supported(q, q, causal=True, dropout_rate=0.0,
                                   deterministic=True)
        with attention_kernels_disabled(False):  # inner no-op keeps it off
            assert not attention_kernels_allowed()
    assert attention_kernels_allowed()
    with attention_kernels_disabled(False):  # inactive gate changes nothing
        assert decode_supported(1, 250, 8, 256, backend="tpu")


def test_dispatch_predicate(monkeypatch):
    assert decode_supported(1, 250, 8, 256, backend="tpu")
    assert decode_supported(1, 399, 8, 128, backend="tpu")
    assert not decode_supported(1, 250, 8, 256, backend="cpu")
    assert not decode_supported(1, 399, 8, 64, backend="tpu")   # hd % 128
    assert not decode_supported(1, 64, 8, 128, backend="tpu")   # tiny T
    assert not decode_supported(16, 250, 8, 128, backend="tpu")  # B*H cap
    monkeypatch.setenv("SEA_TPU_DECODE_KERNEL", "0")
    assert not decode_supported(1, 250, 8, 256, backend="tpu")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel needs a real TPU")
def test_kernel_matches_xla_on_hardware():
    key = jax.random.PRNGKey(5)
    for dt in (jnp.float32, jnp.bfloat16):
        B, T, H, hd = 1, 250, 8, 256
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, hash(dt.__name__) % 97), 3)
        q = jax.random.normal(k1, (B, H, hd), jnp.float32)
        K = jax.random.normal(k2, (B, H, T, hd), jnp.float32).astype(dt)
        V = jax.random.normal(k3, (B, H, T, hd), jnp.float32).astype(dt)
        got = decode_attention(q, K, V, jnp.int32(123))
        want = _ref(q.astype(dt).astype(jnp.float32), K, V, 123)
        tol = 1e-5 if dt == jnp.float32 else 3e-2
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=tol)


def _quantize_cache(K, V):
    """Per-token symmetric int8 quantization, the mha_step write path."""
    from sea_tpu.ops.attention import _quantize_token
    B, H, T, hd = K.shape
    kq, ks = jax.vmap(_quantize_token, in_axes=2, out_axes=2)(K)
    vq, vs = jax.vmap(_quantize_token, in_axes=2, out_axes=2)(V)
    return kq, ks, vq, vs


def test_int8_cache_kernel_matches_xla_math():
    """The quantized decode-kernel variant (per-token scales folded into
    the score/probability math) must match the dequantized XLA oracle in
    interpret mode — the kernel never materializes a dequantized cache."""
    B, T, H, hd = 2, 250, 4, 128
    key = jax.random.PRNGKey(21)
    q = jax.random.normal(key, (B, H, hd), jnp.float32)
    K = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, hd))
    V = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, hd))
    kq, ks, vq, vs = _quantize_cache(K, V)
    for t in (0, 123, 249):
        got = decode_attention(q, kq, vq, jnp.int32(t), k_scale=ks,
                               v_scale=vs, interpret=True)
        want = _ref(q, kq.astype(jnp.float32) * ks[..., None],
                    vq.astype(jnp.float32) * vs[..., None], t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=3e-2, err_msg=f"t={t}")
        # And close to the UNquantized attention: int8 noise only.
        exact = _ref(q, K, V, t)
        err = np.linalg.norm(np.asarray(got) - np.asarray(exact)) \
            / np.linalg.norm(np.asarray(exact))
        assert err < 0.05, (t, err)


def test_int8_cache_rollout_close_to_f32():
    """End-to-end scan rollout with cache_dtype=int8: the engine carries
    int8 planes + per-token scales through the scan and stays close to
    the f32-cache rollout (per-step quantization noise only)."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan
    cfg = TemporalModelConfig(
        num_layers=1, embed_dim=32, n_heads=2, block_size=64,
        scale_ratio=2, src_len=0, num_fields=2, down_proj=2, dropout=0.0,
        exchange_mode="sea", ib_scale_mode="mlp", ib_addition_mode="add",
        ib_mlp_layers=1, ib_num=1, add_info_after_cross=True, ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(30), cfg)
    B, T = 2, 8
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(31),
                                 (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(32), (B, T, cfg.ib_num))
    ref = np.asarray(rollout_scan(params, cfg, x0, ib))
    got = np.asarray(rollout_scan(params, cfg, x0, ib,
                                  cache_dtype=jnp.int8))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-8)
    assert rel < 0.05, rel
    assert not np.array_equal(got, ref)  # int8 genuinely active
