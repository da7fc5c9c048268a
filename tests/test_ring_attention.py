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
@pytest.mark.heavy
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


# ---------------------------------------------------------------------------
# Model-level: the ring wired through temporal_forward (seq_mesh argument)
# ---------------------------------------------------------------------------

def _model_cfg(dropout=0.0):
    # 1 layer: a second layer doubles XLA compile time on the 1-core CI
    # host without exercising any new attention site.
    from sea_tpu.configs.base import TemporalModelConfig
    return TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                               block_size=32, scale_ratio=2, num_fields=2,
                               down_proj=2, dropout=dropout,
                               exchange_mode="sea", ib_scale_mode="mlp",
                               ib_addition_mode="add", ln_type="adaln")


@requires_8
@pytest.mark.heavy
def test_temporal_forward_seq_mesh_matches_single_device():
    """The FULL temporal model (self-attn + SEA exchange + ib + adaln)
    with every attention running as a ring over 8 sequence shards equals
    the single-device forward."""
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    cfg = _model_cfg()
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    B, T = 2, 64
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (B, T, cfg.ib_num))

    ref = temporal_forward(params, cfg, x, ib)
    got = temporal_forward(params, cfg, x, ib, seq_mesh=_seq_mesh(8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


@requires_8
@pytest.mark.heavy
def test_seq_parallel_train_step_long_T():
    """T=2048 (past the reference's [2024^2] mask-buffer cap,
    base_blocks.py:173) trains sequence-parallel: forward + grad through
    the model on the 8-device ring, loss finite, params update, and the
    gradient matches the single-device gradient."""
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    from sea_tpu.parallel.mesh import make_seq_mesh
    from sea_tpu.parallel.train_step import make_seq_parallel_train_step
    from sea_tpu.train.optim import make_optimizer

    cfg = _model_cfg()
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    # Host copies: device_put may alias these buffers into the step's
    # donated placed params, deleting the originals after the first step.
    params_np = jax.tree.map(np.asarray, params)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    mesh = make_seq_mesh(8)
    step, pp, po, place = make_seq_parallel_train_step(mesh, cfg, tx, params)

    B, T = 1, 2048
    key = jax.random.PRNGKey(2)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    pp2, po2, stats = step(pp, po, *place(src, tgt, ib),
                           jax.random.PRNGKey(9))
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["grad_norm"]))
    # Params actually moved.
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params_np),
                                jax.tree.leaves(pp2)))
    assert moved
    params = jax.tree.map(jnp.asarray, params_np)

    # Gradient parity vs single-device at a smaller T (full [T,T] scores
    # on one CPU device stay cheap).
    T2 = 64
    src2, tgt2 = src[:, :T2], tgt[:, :T2]
    ib2 = ib[:, :T2]

    def loss_ring(p):
        return jnp.mean((temporal_forward(p, cfg, src2, ib2, seq_mesh=mesh)
                         - tgt2) ** 2)

    def loss_ref(p):
        return jnp.mean((temporal_forward(p, cfg, src2, ib2) - tgt2) ** 2)

    g_ring = jax.grad(loss_ring)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------------------
# In-ring dropout: the flash kernel's global-position counter-hash mask
# runs inside the ring, so the shipped cylinder recipe (attention dropout
# 0.1, configs/cylinder_flow.py) trains sequence-parallel unmodified.
# ---------------------------------------------------------------------------

def _dense_dropout_oracle(q, k, v, seed, rate, *, causal, src_len):
    """attention_core semantics with the counter-hash mask applied to the
    normalized probabilities — the exact math the ring must reproduce."""
    from sea_tpu.ops.flash_attention import dropout_scale_from_positions
    B, T, H, hd = q.shape
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
    if causal:
        mask = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None] + src_len)
        scores = jnp.where(mask[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    shape4 = (B, H, T, T)
    bh = (jax.lax.broadcasted_iota(jnp.int32, shape4, 0) * H
          + jax.lax.broadcasted_iota(jnp.int32, shape4, 1))
    qp = jax.lax.broadcasted_iota(jnp.int32, shape4, 2)
    kp = jax.lax.broadcasted_iota(jnp.int32, shape4, 3)
    drop = dropout_scale_from_positions(seed[0], seed[1], bh, qp, kp,
                                        rate=rate)
    return jnp.einsum("bhqk,bkhd->bqhd", probs * drop, v)


@requires_8
def test_ring_dropout_matches_dense_oracle():
    """Ring attention with dropout equals the dense computation with the
    same counter-hash mask, for 4- and 8-way rings — the mask is a pure
    function of global positions, independent of sharding."""
    B, T, H, hd = 2, 64, 2, 16
    rate = 0.1
    seed = jnp.asarray([12345, -987], jnp.int32)
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    ref = _dense_dropout_oracle(q, k, v, seed, rate, causal=True, src_len=0)
    for n in (4, 8):
        got = ring_attention(q, k, v, _seq_mesh(n), causal=True, src_len=0,
                             dropout_rate=rate, dropout_seed=seed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, err_msg=f"ring size {n}")


@requires_8
def test_ring_dropout_mask_statistics():
    """The in-ring mask drops ~rate of the probability mass and is
    inverted-scaled: output expectation matches the no-dropout output.
    Checked via the mask itself (v = identity rows trick): zero fraction
    within 3 sigma of rate, surviving entries scaled by 1/(1-rate)."""
    from sea_tpu.ops.flash_attention import dropout_scale_from_positions
    rate = 0.1
    shape = (1, 1, 256, 256)
    bh = jnp.zeros(shape, jnp.int32)
    qp = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    kp = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    m = dropout_scale_from_positions(jnp.int32(7), jnp.int32(-3), bh, qp, kp,
                                     rate=rate)
    m = np.asarray(m).reshape(-1)
    n = m.size
    zero_frac = float((m == 0.0).mean())
    sigma = (rate * (1 - rate) / n) ** 0.5
    assert abs(zero_frac - rate) < 3 * sigma, (zero_frac, rate)
    nz = m[m != 0.0]
    np.testing.assert_allclose(nz, 1.0 / (1.0 - rate), rtol=1e-6)
    # Different seeds decorrelate.
    m2 = np.asarray(dropout_scale_from_positions(
        jnp.int32(8), jnp.int32(-3), bh, qp, kp, rate=rate)).reshape(-1)
    agree = float(((m == 0) == (m2 == 0)).mean())
    assert agree < 0.9, agree  # ~ (1-r)^2 + r^2 = 0.82 expected


@requires_8
@pytest.mark.heavy
def test_ring_dropout_gradients_match_dense():
    B, T, H, hd = 1, 32, 2, 8
    rate = 0.1
    seed = jnp.asarray([55, 77], jnp.int32)
    key = jax.random.PRNGKey(13)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    mesh = _seq_mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True, src_len=0,
                                      dropout_rate=rate,
                                      dropout_seed=seed) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dense_dropout_oracle(q, k, v, seed, rate,
                                             causal=True, src_len=0) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"d{name}")


@requires_8
def test_seq_parallel_train_step_with_dropout():
    """The cylinder-style recipe (attention dropout 0.1) trains
    sequence-parallel: one step, finite loss, params move."""
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.parallel.mesh import make_seq_mesh
    from sea_tpu.parallel.train_step import make_seq_parallel_train_step
    from sea_tpu.train.optim import make_optimizer
    cfg = _model_cfg(dropout=0.1)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    params_np = jax.tree.map(np.asarray, params)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    step, pp, po, place = make_seq_parallel_train_step(make_seq_mesh(8), cfg,
                                                       tx, params)
    B, T = 1, 64
    key = jax.random.PRNGKey(2)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    pp2, _, stats = step(pp, po, *place(src, tgt, ib), jax.random.PRNGKey(3))
    assert np.isfinite(float(stats["loss"]))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params_np),
                                jax.tree.leaves(pp2)))
    assert moved


@requires_8
def test_seq_parallel_step_compute_dtype_tracks_single_device():
    """compute_dtype wires through the sequence-parallel step (it was
    silently f32-only before): for 'bfloat16_mixed' and 'bfloat16_shadow'
    the ring step's loss tracks the single-device step's loss at the same
    policy (dropout off; ring attention runs bf16 with f32 accumulators),
    and params move. Shadow additionally keeps its invariant
    shadow == to_bf16(params) on the ring."""
    import dataclasses
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.parallel.mesh import make_seq_mesh
    from sea_tpu.parallel.train_step import make_seq_parallel_train_step
    from sea_tpu.train.optim import ShadowOptState, make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.utils.precision import to_bf16
    cfg = _model_cfg(dropout=0.0)
    B, T = 1, 64
    key = jax.random.PRNGKey(2)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    rng = jax.random.PRNGKey(3)

    for policy in ("bfloat16_mixed", "bfloat16_shadow"):
        tx = make_optimizer(dataclasses.replace(
            TrainConfig(learning_rate=1e-3), compute_dtype=policy))
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        step1 = make_train_step(cfg, tx, compute_dtype=policy)
        _, _, stats1 = step1(jax.tree.map(jnp.copy, params),
                             tx.init(params), src, tgt, ib, rng)

        stepN, pp, po, place = make_seq_parallel_train_step(
            make_seq_mesh(8), cfg, tx, params, compute_dtype=policy)
        if policy == "bfloat16_shadow":
            assert isinstance(po, ShadowOptState)
        pN, oN, statsN = stepN(pp, po, *place(src, tgt, ib), rng)
        np.testing.assert_allclose(float(statsN["loss"]),
                                   float(stats1["loss"]), rtol=5e-3)
        if policy == "bfloat16_shadow":
            for a, b in zip(jax.tree.leaves(oN.shadow),
                            jax.tree.leaves(to_bf16(pN))):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Flash-kernel ring (round-5: banded Pallas pairs instead of dense einsum)
# ---------------------------------------------------------------------------

@pytest.fixture
def interpret_flash(monkeypatch):
    from sea_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "_FORCE_INTERPRET", True)


@requires_8
@pytest.mark.parametrize("causal", [True, False])
def test_ring_flash_matches_dense(interpret_flash, causal):
    B, T, H, hd = 2, 64, 2, 16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    mesh = _seq_mesh(8)
    ref = ring_attention(q, k, v, mesh, causal=causal, src_len=0,
                         impl="dense")
    got = ring_attention(q, k, v, mesh, causal=causal, src_len=0,
                         impl="flash")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    oracle = attention_core(q, k, v, causal=causal, src_len=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               atol=2e-5)


@requires_8
@pytest.mark.heavy
def test_ring_flash_gradients_match_dense(interpret_flash):
    """The ring-of-flash-backward-kernels custom VJP == the dense ring's
    autodiff gradients."""
    B, T, H, hd = 1, 32, 2, 8
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    mesh = _seq_mesh(4)

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mesh, causal=True,
                                          src_len=0, impl=impl) ** 2)
        return f

    g_flash = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss("dense"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"d{name}")


@requires_8
@pytest.mark.heavy
def test_ring_flash_dropout_matches_dense(interpret_flash):
    """In-kernel dropout hashes the same GLOBAL positions as the dense
    ring (seed words 2/3 carry the block origins), so masks — and hence
    outputs and gradients — agree across implementations."""
    B, T, H, hd = 1, 32, 2, 8
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    mesh = _seq_mesh(4)
    seed = jnp.asarray([123, 456], jnp.int32)
    kw = dict(causal=True, src_len=0, dropout_rate=0.3, dropout_seed=seed)
    ref = ring_attention(q, k, v, mesh, impl="dense", **kw)
    got = ring_attention(q, k, v, mesh, impl="flash", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mesh, impl=impl,
                                          **kw) ** 2)
        return f

    g_flash = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss("dense"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_dense, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")
