"""Activation-aware quantization calibration (utils/calibration.py).

The reference has no serving quantization (torch f32 end to end,
utils/train_utils.py evaluates the trained module directly) — this is
TPU-rebuild serving surface: capture per-input-channel moments on a few
teacher-forced windows, then pick int4 scales by diagonal-Hessian-weighted
error and fold the systematic output error into biases.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sea_tpu.ops.layers import init_linear, linear
from sea_tpu.utils.calibration import (calibrate_temporal,
                                       capture_activation_stats)
from sea_tpu.utils.precision import (fuse_attention_projections,
                                     quantize_weights_int4)


def test_capture_stats_values_and_paths():
    """Recorder accumulates exact E[x], E[x^2] per input channel across
    calls, resolves identities to tree paths (dicts + lists), skips
    traced calls, and uninstalls on context exit."""
    key = jax.random.PRNGKey(0)
    tree = {"a": init_linear(key, 8, 4),
            "blocks": [init_linear(jax.random.fold_in(key, 1), 6, 2)]}
    xa1 = jax.random.normal(jax.random.fold_in(key, 2), (3, 8))
    xa2 = jax.random.normal(jax.random.fold_in(key, 3), (5, 8))
    xb = jax.random.normal(jax.random.fold_in(key, 4), (2, 7, 6))

    with capture_activation_stats() as rec:
        linear(tree["a"], xa1)
        linear(tree["a"], xa2)
        linear(tree["blocks"][0], xb)
        jax.jit(linear)(tree["a"], xa1)  # traced: must record nothing
        stats = rec.resolve(tree)

    assert set(stats) == {("a",), ("blocks", 0)}
    xa = jnp.concatenate([xa1, xa2], axis=0)
    assert stats[("a",)]["count"] == 8  # jitted call not counted
    np.testing.assert_allclose(np.asarray(stats[("a",)]["mean"]),
                               np.asarray(jnp.mean(xa, axis=0)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[("a",)]["sq"]),
                               np.asarray(jnp.mean(xa * xa, axis=0)),
                               rtol=1e-5)
    xb2 = xb.reshape(-1, 6)
    assert stats[("blocks", 0)]["count"] == 14
    np.testing.assert_allclose(np.asarray(stats[("blocks", 0)]["sq"]),
                               np.asarray(jnp.mean(xb2 * xb2, axis=0)),
                               rtol=1e-5)
    # hook uninstalled: recording stops after the context
    from sea_tpu.ops import layers as _layers
    assert _layers._CALIBRATION is None


def test_calibrated_int4_beats_plain_mse():
    """With strongly non-uniform input-channel scales, the activation-
    weighted clip search + bias correction must reduce the quantized
    layer's OUTPUT error vs the plain weight-MSE quantizer (same storage
    format either way)."""
    key = jax.random.PRNGKey(42)
    K, N = 512, 256
    p = init_linear(key, K, N, init="torch_default")
    # per-channel input scales spanning 3 decades
    sigma = jnp.logspace(-1.5, 1.5, K)
    x_cal = jax.random.normal(jax.random.fold_in(key, 1), (256, K)) * sigma
    x_test = jax.random.normal(jax.random.fold_in(key, 2), (256, K)) * sigma

    tree = {"lin": p}
    with capture_activation_stats() as rec:
        linear(tree["lin"], x_cal)
        stats = rec.resolve(tree)

    q_plain = quantize_weights_int4(tree, min_size=K * N)["lin"]
    q_cal = quantize_weights_int4(tree, min_size=K * N,
                                  act_stats=stats)["lin"]
    assert q_cal["w_p4"].dtype == jnp.uint8  # same serving storage

    exact = linear(p, x_test)
    err_plain = float(jnp.linalg.norm(linear(q_plain, x_test) - exact))
    err_cal = float(jnp.linalg.norm(linear(q_cal, x_test) - exact))
    assert err_cal < err_plain, (err_cal, err_plain)

    # bias correction kills the systematic (mean) output error
    mean_err_plain = jnp.mean(linear(q_plain, x_cal) - linear(p, x_cal),
                              axis=0)
    mean_err_cal = jnp.mean(linear(q_cal, x_cal) - linear(p, x_cal),
                            axis=0)
    assert float(jnp.linalg.norm(mean_err_cal)) < 0.2 * float(
        jnp.linalg.norm(mean_err_plain))

    # bias_correct=False keeps the original bias untouched
    q_nb = quantize_weights_int4(tree, min_size=K * N, act_stats=stats,
                                 bias_correct=False)["lin"]
    np.testing.assert_array_equal(np.asarray(q_nb["b"]), np.asarray(p["b"]))


def test_calibrate_temporal_end_to_end():
    """calibrate_temporal on the fused serving layout reaches every
    quantizable linear (incl. the fused qkv/kv mats), and the calibrated
    params serve through the scan rollout."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan

    cfg = TemporalModelConfig(
        num_layers=1, embed_dim=16, n_heads=2, block_size=32, scale_ratio=2,
        src_len=0, num_fields=2, down_proj=2, dropout=0.0,
        exchange_mode="sea", ib_scale_mode="mlp", ib_addition_mode="add",
        ib_mlp_layers=1, ib_num=1, add_info_after_cross=True,
        ln_type="adaln")
    params = fuse_attention_projections(
        init_temporal(jax.random.PRNGKey(0), cfg))
    B, T = 2, 6
    key = jax.random.PRNGKey(7)
    data = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (B, T, cfg.ib_num))

    stats = calibrate_temporal(params, cfg, [(data, ib)])
    # the fused self-attention projection of block 0 / field 0 was seen
    assert any("qkv" in path for path in stats), sorted(stats)[:5]

    qp = quantize_weights_int4(params, min_size=1, act_stats=stats)
    # every quantized linear with stats gained/updated a bias
    def check(node, path=()):
        if isinstance(node, dict):
            if "w_p4" in node and path in stats:
                assert "b" in node, path
            for k, v in node.items():
                check(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                check(v, path + (i,))
    check(qp)

    out = rollout_scan(qp, cfg, data[:, 0], ib)
    assert out.shape == (B, T, cfg.num_fields, cfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(out)))
