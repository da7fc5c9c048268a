"""Fused AdaLN-modulate kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sea_tpu.ops.fused_adaln as fadaln
import sea_tpu.ops.layers as L


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(fadaln, "_FORCE_INTERPRET", True)


def _inputs(B=3, T=37, E=128, dtype=jnp.float32, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (B, T, E), dtype)
    cw = (1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                        (B, 1, E))).astype(dtype)
    cb = (0.1 * jax.random.normal(jax.random.fold_in(key, 2),
                                  (B, 1, E))).astype(dtype)
    params = {"w": jnp.ones((E,), dtype) * 1.3,
              "b": jnp.full((E,), 0.2, dtype)}
    return params, x, cw, cb


def _xla_modulate(params, x, cw, cb):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normalized = (xf - mean) * jax.lax.rsqrt(var + L.LN_EPS)
    out = normalized * (params["w"] + cw) + (params["b"] + cb)
    return out.astype(x.dtype)


def test_fused_forward_matches_xla(interpret):
    params, x, cw, cb = _inputs()
    want = _xla_modulate(params, x, cw, cb)
    got = fadaln.fused_adaln_modulate(x, cw, cb, params["w"], params["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_forward_bf16(interpret):
    params, x, cw, cb = _inputs(dtype=jnp.bfloat16)
    want = _xla_modulate(params, x, cw, cb)
    got = fadaln.fused_adaln_modulate(x, cw, cb, params["w"], params["b"])
    assert got.dtype == jnp.bfloat16
    # f32 reduction order differs between the kernel and XLA's tree
    # reduce, so ~2% of outputs land one bf16 ULP apart (rel 2^-7);
    # anything beyond 1 ULP would be a real bug.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2 ** -7, atol=2 ** -7)


def test_fused_gradients_match_xla(interpret):
    """The hand-written LN backward (dx + per-trajectory cond reductions
    + summed base deltas) == autodiff of the XLA path."""
    params, x, cw, cb = _inputs(T=19)

    def loss_fused(x, cw, cb, w, b):
        out = fadaln.fused_adaln_modulate(x, cw, cb, w, b)
        return jnp.sum(out * out * 0.5 + out)

    def loss_xla(x, cw, cb, w, b):
        out = _xla_modulate({"w": w, "b": b}, x, cw, cb)
        return jnp.sum(out * out * 0.5 + out)

    args = (x, cw, cb, params["w"], params["b"])
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b_, name in zip(g_fused, g_xla, ("dx", "dcw", "dcb", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_dispatch_gates(interpret):
    """adaln_modulate routes through the kernel exactly for the
    training-shaped time-constant calls."""
    params, x, cw, cb = _inputs()
    calls = []
    orig = fadaln.fused_adaln_modulate

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    fused_mod = fadaln.fused_adaln_modulate
    try:
        fadaln.fused_adaln_modulate = counting
        # Rebind the name layers imports lazily.
        out = L.adaln_modulate(params, x, cw, cb)
        assert calls, "kernel not dispatched for the training shape"
        want = _xla_modulate(params, x, cw, cb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-6)
        calls.clear()
        # Per-token cond (no hoist): XLA path.
        cw_full = jnp.broadcast_to(cw, x.shape)
        L.adaln_modulate(params, x, cw_full, jnp.broadcast_to(cb, x.shape))
        assert not calls
        # Serving step shape [B, E]: XLA path.
        L.adaln_modulate(params, x[:, 0], cw[:, 0], cb[:, 0])
        assert not calls
    finally:
        fadaln.fused_adaln_modulate = fused_mod


def test_adaln_full_matches_with_kernel(interpret):
    """Model-level: layers.adaln (cond MLP + modulate) with the kernel on
    equals the pure-XLA computation with the kernel off."""
    E, cond_dim = 128, 3
    key = jax.random.PRNGKey(7)
    p = L.init_adaln(key, E, cond_dim)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, E))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (2, 1, cond_dim))
    got = L.adaln(p, x, cond)
    try:
        L.FUSED_ADALN = False
        want = L.adaln(p, x, cond)
    finally:
        L.FUSED_ADALN = True
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
