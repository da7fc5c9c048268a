"""Pipeline-parallel (GPipe over a 'pipe' mesh axis) tests on the virtual
8-CPU mesh.

The reference has no distributed execution (SURVEY §2.10); PP is rebuild-only
capability for deep temporal stacks. Verifies that
- the pipelined forward is numerically equal to the single-device forward,
- the pipelined train step reduces the same loss and produces the same
  updated params as the single-device step (dropout off),
- the dropout-on forward is invariant to the number of pipeline stages
  (masks keyed per (microbatch, global layer)),
- param stack/unstack round-trips the checkpoint layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.configs.base import TemporalModelConfig, TrainConfig
from sea_tpu.models.temporal import init_temporal, temporal_forward
from sea_tpu.parallel.pipeline import (make_pipe_mesh,
                                       make_pipeline_train_step,
                                       pipeline_forward,
                                       stack_pipeline_params,
                                       unstack_pipeline_params)
from sea_tpu.train.optim import make_optimizer

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(num_layers=4, dropout=0.0):
    return TemporalModelConfig(num_layers=num_layers, embed_dim=32,
                               n_heads=2, block_size=64, scale_ratio=2,
                               num_fields=2, down_proj=2, dropout=dropout,
                               exchange_mode="sea", ib_scale_mode="mlp",
                               ib_addition_mode="add", ln_type="adaln")


def _data(cfg, B=4, T=6, seed=1):
    key = jax.random.PRNGKey(seed)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    return src, tgt, ib


def test_stack_unstack_roundtrip():
    cfg = _cfg(num_layers=3)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    back = unstack_pipeline_params(stack_pipeline_params(params),
                                   cfg.num_layers)
    jax.tree.map(np.testing.assert_array_equal, params, back)


@requires_8
def test_pipeline_forward_matches_single_device():
    cfg = _cfg(num_layers=4)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    src, _, ib = _data(cfg)
    ref = temporal_forward(params, cfg, src, ib)
    mesh = make_pipe_mesh(n_pipe=4, n_data=2)
    out = pipeline_forward(stack_pipeline_params(params), cfg, src, ib,
                           mesh=mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@requires_8
def test_pipeline_forward_microbatch_invariance():
    cfg = _cfg(num_layers=2)
    params = stack_pipeline_params(init_temporal(jax.random.PRNGKey(0), cfg))
    src, _, ib = _data(cfg)
    mesh = make_pipe_mesh(n_pipe=2)
    a = pipeline_forward(params, cfg, src, ib, mesh=mesh, n_microbatches=1)
    b = pipeline_forward(params, cfg, src, ib, mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)


@requires_8
def test_pipeline_dropout_stage_invariance():
    """The sampled dropout network depends only on (microbatch, layer) —
    not on how many stages the layer stack is cut into."""
    cfg = _cfg(num_layers=4, dropout=0.3)
    params = stack_pipeline_params(init_temporal(jax.random.PRNGKey(0), cfg))
    src, _, ib = _data(cfg)
    rng = jax.random.PRNGKey(7)
    outs = []
    for n_pipe in (2, 4):
        mesh = make_pipe_mesh(n_pipe=n_pipe)
        outs.append(pipeline_forward(params, cfg, src, ib, mesh=mesh,
                                     n_microbatches=2, rng=rng,
                                     deterministic=False))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=2e-5, atol=2e-5)
    # And dropout is actually active (differs from the deterministic pass).
    det = pipeline_forward(params, cfg, src, ib,
                           mesh=make_pipe_mesh(n_pipe=2), n_microbatches=2)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(det))


@requires_8
@pytest.mark.heavy
def test_pipeline_train_step_matches_single_device():
    cfg = _cfg(num_layers=4)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    src, tgt, ib = _data(cfg, B=8)
    rng = jax.random.PRNGKey(3)

    from sea_tpu.train.train_temporal import make_train_step
    step1 = make_train_step(cfg, tx)
    p1, _, stats1 = step1(jax.tree.map(jnp.copy, params), tx.init(params),
                          src, tgt, ib, rng)

    mesh = make_pipe_mesh(n_pipe=4, n_data=2)
    step, pp, opt, place = make_pipeline_train_step(
        mesh, cfg, tx, params, n_microbatches=2)
    pp2, _, stats2 = step(pp, opt, *place(src, tgt, ib), rng)

    np.testing.assert_allclose(float(stats2["loss"]), float(stats1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(stats2["grad_norm"]),
                               float(stats1["grad_norm"]), rtol=1e-4)
    back = unstack_pipeline_params(jax.device_get(pp2), cfg.num_layers)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=5e-4, atol=1e-5),
        back, jax.device_get(p1))


@requires_8
@pytest.mark.heavy
def test_pipeline_composes_with_bf16_shadow():
    """PP + compute_dtype='bfloat16_shadow': forward/backward on the
    stacked bf16 shadow carried in the optimizer state; loss finite and
    params actually move."""
    cfg = _cfg(num_layers=2)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(learning_rate=1e-3, compute_dtype="bfloat16_shadow")
    tx = make_optimizer(tcfg)
    src, tgt, ib = _data(cfg, B=4)
    mesh = make_pipe_mesh(n_pipe=2, n_data=2)
    step, pp, opt, place = make_pipeline_train_step(
        mesh, cfg, tx, params, n_microbatches=2,
        compute_dtype="bfloat16_shadow")
    assert all(a.dtype == jnp.bfloat16
               for a in jax.tree.leaves(opt.shadow))
    # Snapshot every leaf before the step (donated buffers); some leaves
    # are parity-preserved dead params with zero grads, so assert that at
    # least one LIVE leaf moved rather than a particular one.
    before = [np.asarray(a) for a in jax.device_get(jax.tree.leaves(pp))]
    pp, opt, stats = step(pp, opt, *place(src, tgt, ib),
                          jax.random.PRNGKey(3))
    assert np.isfinite(float(stats["loss"]))
    after = jax.device_get(jax.tree.leaves(pp))
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


@requires_8
def test_pipeline_validates_divisibility():
    cfg = _cfg(num_layers=3)
    params = stack_pipeline_params(init_temporal(jax.random.PRNGKey(0), cfg))
    src, _, ib = _data(cfg)
    mesh = make_pipe_mesh(n_pipe=2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward(params, cfg, src, ib, mesh=mesh, n_microbatches=2)
    cfg4 = _cfg(num_layers=4)
    params4 = stack_pipeline_params(
        init_temporal(jax.random.PRNGKey(0), cfg4))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward(params4, cfg4, src, ib, mesh=mesh,
                         n_microbatches=3)
