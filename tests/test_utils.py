"""Utility coverage: profiling timer, multihost no-op init, precision."""

import jax
import jax.numpy as jnp
import numpy as np


def test_step_timer():
    import time
    from sea_tpu.utils.profiling import StepTimer
    t = StepTimer(skip=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0.005
    assert s["steps_per_sec"] > 0


def test_trace_writes_profile(tmp_path):
    from sea_tpu.utils.profiling import annotate, trace
    with trace(str(tmp_path)):
        with annotate("mul"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os
    found = any("plugins" in root or f.endswith((".pb", ".json.gz", ".xplane.pb"))
                for root, _, fs in os.walk(tmp_path) for f in fs)
    assert found, "no trace artifacts written"


def test_multihost_single_process_noop():
    from sea_tpu.parallel.multihost import initialize_multihost, is_primary
    initialize_multihost()  # must not raise single-process
    assert is_primary()


def test_cast_weights_bf16_selectivity():
    """Only the "w" of big linear param dicts casts — biases, small
    weights, int buffers, and bare arrays (PE tables) stay untouched."""
    from sea_tpu.utils.precision import cast_weights_bf16
    tree = {"lin": {"w": jnp.zeros((512, 512)), "b": jnp.zeros((512,))},
            "small": {"w": jnp.zeros((4, 4))},
            "int_lin": {"w": jnp.zeros((512, 512), jnp.int32)},
            "pool_pe": jnp.zeros((5000, 512))}
    out = cast_weights_bf16(tree)
    assert out["lin"]["w"].dtype == jnp.bfloat16
    assert out["lin"]["b"].dtype == jnp.float32
    assert out["small"]["w"].dtype == jnp.float32
    assert out["int_lin"]["w"].dtype == jnp.int32
    # Buffers outside linear dicts (sinusoidal PE tables) never cast.
    assert out["pool_pe"].dtype == jnp.float32


def test_masked_metrics_match_unmasked_on_full_batch():
    from sea_tpu.train import metrics as M
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (4, 3, 5))
    truth = jax.random.normal(jax.random.fold_in(key, 1), (4, 3, 5))
    np.testing.assert_allclose(float(M.masked_mse(pred, truth, 4)),
                               float(M.mse(pred, truth)), rtol=1e-6)
    np.testing.assert_allclose(float(M.masked_r2(pred, truth, 4)),
                               float(M.r2(pred, truth)), rtol=1e-5)
    # Masked over k rows == plain over the k-row slice (padding ignored).
    np.testing.assert_allclose(float(M.masked_mse(pred, truth, 3)),
                               float(M.mse(pred[:3], truth[:3])), rtol=1e-6)
    np.testing.assert_allclose(float(M.masked_r2(pred, truth, 3)),
                               float(M.r2(pred[:3], truth[:3])), rtol=1e-5)
    mu = jax.random.normal(jax.random.fold_in(key, 2), (4, 2))
    lv = jax.random.normal(jax.random.fold_in(key, 3), (4, 2))
    ref_kl = -0.5 * float(jnp.sum(1 + lv[:3] - mu[:3] ** 2 - jnp.exp(lv[:3])))
    np.testing.assert_allclose(float(M.masked_kl(mu, lv, 3)), ref_kl,
                               rtol=1e-5)


def test_eval_compiles_once_on_ragged_split():
    """A ragged val split (7 windows, batch 4) drives the padded eval loop
    through ONE XLA compilation; the masked loss equals the exact per-window
    average."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.data.datasets import padded_batch_iterator
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    from sea_tpu.train.train_temporal import make_eval_step

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    n, T = 7, 5
    src = np.asarray(jax.random.normal(key, (n, T, 2, 16)))
    tgt = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                       (n, T, 2, 16)))
    ib = np.asarray(jax.random.normal(jax.random.fold_in(key, 2),
                                      (n, T, cfg.ib_num)))

    step = make_eval_step(cfg)
    losses, counts = [], []
    for (s, t, b), k in padded_batch_iterator([src, tgt, ib], 4):
        losses.append(float(step(params, jnp.asarray(s), jnp.asarray(t),
                                 jnp.asarray(b), jnp.asarray(k))))
        counts.append(k)
    assert counts == [4, 3]
    assert step._cache_size() == 1, step._cache_size()

    out = temporal_forward(params, cfg, jnp.asarray(src), jnp.asarray(ib))
    per = np.mean((np.asarray(out) - tgt) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(losses[0], per[:4].mean(), rtol=1e-5)
    np.testing.assert_allclose(losses[1], per[4:].mean(), rtol=1e-5)


def test_int8_weight_quantization():
    from sea_tpu.ops.layers import init_linear, linear
    from sea_tpu.utils.precision import quantize_weights_int8
    key = jax.random.PRNGKey(0)
    p = init_linear(key, 512, 512)
    q = quantize_weights_int8({"lin": p}, min_size=512 * 512)["lin"]
    assert q["w_q"].dtype == jnp.int8 and "w" not in q and "b" in q
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 512))
    got = linear(q, x)
    # Oracle: explicit dequantized weights through the plain path.
    wd = (q["w_q"].astype(jnp.bfloat16).astype(jnp.float32)
          * q["w_s"])
    ref = linear({"w": wd, "b": q["b"]}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=2e-3)
    # Relative quantization error of the matmul itself stays small.
    exact = linear(p, x)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, rel
    # Small / non-linear leaves are untouched.
    ln = {"w": jnp.ones((512,))}
    assert "w" in quantize_weights_int8({"ln": ln})["ln"]


def test_int4_weight_quantization():
    """int4 mirrors int8 ([-7, 7] grid) with a proportionally looser
    error bound; storage is packed-nibble uint8 (w_p4, two input rows
    per byte — utils/precision.py), consumed by linear() through
    ops/quant_matmul.int4_matmul. Odd input dims stay unquantized (no
    nibble pairing)."""
    from sea_tpu.ops.layers import init_linear, linear
    from sea_tpu.utils.precision import quantize_weights_int4
    key = jax.random.PRNGKey(0)
    p = init_linear(key, 512, 512)
    q = quantize_weights_int4({"lin": p}, min_size=512 * 512)["lin"]
    assert (q["w_p4"].dtype == jnp.uint8 and q["w_p4"].shape == (256, 512)
            and "w" not in q and "b" in q)
    # odd input dim -> vetoed, weight left untouched
    p_odd = init_linear(key, 513, 512)
    q_odd = quantize_weights_int4({"lin": p_odd}, min_size=1)["lin"]
    assert "w" in q_odd and "w_p4" not in q_odd
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 512))
    got = jax.jit(linear)(q, x)
    exact = linear(p, x)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    # 4-bit weight-only is a lossy serving mode by nature: max-scaled
    # symmetric int4 on gaussian weights has an analytic matmul error of
    # ~max|w|/(7*sqrt(12)*sigma) ~= 14-15%; the quantizer's per-column
    # MSE-optimal clip search (utils/precision.py) cuts that to ~10-11%.
    # This pins the EXPECTED noise floor, not a small-drift claim —
    # trained-weight drift is measured on-chip before anyone serves int4.
    assert 0.06 < rel < 0.14, rel
    # ...and the clip search must actually beat plain max-scaling.
    from sea_tpu.ops.quant_matmul import pack_int4
    w = p["w"]
    s_max = jnp.max(jnp.abs(w), axis=0) / 7.0
    q_max = jnp.clip(jnp.round(w / s_max), -7, 7)
    got_max = x @ (q_max * s_max) + p["b"]
    rel_max = float(jnp.linalg.norm(got_max - exact)
                    / jnp.linalg.norm(exact))
    assert rel < rel_max, (rel, rel_max)
    # Small / non-linear leaves are untouched.
    ln = {"w": jnp.ones((512,))}
    assert "w" in quantize_weights_int4({"ln": ln})["ln"]


def test_int4_rollout_close_to_f32():
    """Serving-mode int4 rollout stays within its (looser) budget on
    random weights; trained-weight drift is quantified separately
    on-chip (tools/measure_bf16_drift.py --dtype int4)."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan
    from sea_tpu.utils.precision import quantize_weights_int4
    cfg = TemporalModelConfig(num_layers=1, embed_dim=64, n_heads=2,
                              block_size=128, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    qparams = quantize_weights_int4(params, min_size=64 * 64)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 2, 64))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    ref = rollout_scan(params, cfg, x0, ib)
    got = rollout_scan(qparams, cfg, x0, ib)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.25, rel
    # The int4 SERVING config adds bf16 KV caches; the cache cast is
    # noise next to the 4-bit weight grid.
    got16 = rollout_scan(qparams, cfg, x0, ib, cache_dtype=jnp.bfloat16)
    rel16 = float(jnp.linalg.norm(got16 - ref) / jnp.linalg.norm(ref))
    assert rel16 < 0.25, rel16
    dcache = float(jnp.linalg.norm(got16 - got) / jnp.linalg.norm(got))
    assert dcache < 0.02, dcache


def test_int8_rollout_close_to_f32():
    """Serving-mode int8 rollout stays close to the f32 rollout on random
    weights (trained-weight drift is quantified separately on-chip)."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan
    from sea_tpu.utils.precision import quantize_weights_int8
    cfg = TemporalModelConfig(num_layers=1, embed_dim=64, n_heads=2,
                              block_size=128, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    qparams = quantize_weights_int8(params, min_size=64 * 64)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 2, 64))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    ref = rollout_scan(params, cfg, x0, ib)
    got = rollout_scan(qparams, cfg, x0, ib)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_restore_pytree_preserves_namedtuples_and_checks_shapes(tmp_path):
    """Review regressions: (1) optax namedtuple states must keep their
    type through save/restore (a plain tuple breaks tx.update on resume);
    (2) a shape-mismatched checkpoint leaf raises instead of silently
    reshape-scrambling the weights."""
    import optax
    from sea_tpu.utils.checkpoint import restore_pytree, save_pytree
    params = {"w": jnp.ones((3, 4))}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"params": params, "opt_state": opt_state})
    restored = restore_pytree(path, {"params": params,
                                     "opt_state": opt_state})
    # The restored state must be usable by the optimizer directly.
    grads = {"w": jnp.ones((3, 4))}
    updates, _ = tx.update(grads, restored["opt_state"], restored["params"])
    assert updates["w"].shape == (3, 4)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="shape"):
        restore_pytree(path, {"params": {"w": jnp.ones((4, 3))},
                              "opt_state": opt_state})


def test_scaler_restores_persisted_feature_range(tmp_path):
    from sea_tpu.data.scaler import MinMaxScaler
    sc = MinMaxScaler(feature_range=(-1.0, 1.0), name="s",
                      save_dir=str(tmp_path))
    data = np.linspace(0, 10, 7)
    sc.fit(data)
    # A config edited between fit and load must not silently mis-scale.
    sc2 = MinMaxScaler(feature_range=(0.0, 1.0), name="s",
                       save_dir=str(tmp_path))
    sc2.load_values()
    assert sc2.feature_range == (-1.0, 1.0)
    np.testing.assert_allclose(sc2.inverse_transform(sc.transform(data)),
                               data, atol=1e-6)


def test_plot_field_variants(tmp_path):
    """All four plot entry points (modular_testing.py:231-325 family)
    write a file without a display."""
    from sea_tpu.utils.plotting import (plot_all_fields_2d,
                                        plot_all_fields_3d, plot_fields_2d,
                                        plot_fields_3d)
    rng = np.random.RandomState(0)
    data = rng.randn(3, 50, 2).astype(np.float32)
    x, y, z = rng.rand(3, 50).astype(np.float32)
    import os
    p1 = str(tmp_path / "f2d.png")
    plot_fields_2d(data, x, y, 1, 2, filename=p1)
    p2 = str(tmp_path / "f3d.png")
    plot_fields_3d(data, x, y, z, 0, 0, filename=p2)
    p3 = str(tmp_path / "all2d.png")
    plot_all_fields_2d(data, x, y, 1, filename=p3)
    p4 = str(tmp_path / "all3d.png")
    plot_all_fields_3d(data, x, y, z, 1, filename=p4)
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 0


def test_stats_accumulator_matches_host_sums():
    """StatsAccumulator (on-device epoch aggregation) must reproduce the
    old per-batch ``float()`` averaging exactly, skip the nested
    per-tensor dict, and accept bare-scalar eval losses."""
    from sea_tpu.train.metrics import StatsAccumulator
    rng = np.random.RandomState(0)
    batches = [{"loss": jnp.float32(rng.rand()),
                "grad_norm": jnp.float32(rng.rand()),
                "tensors": {"w": jnp.float32(rng.rand())}}
               for _ in range(5)]
    acc = StatsAccumulator()
    for b in batches:
        acc.add(b)
    m = acc.means()
    assert set(m) == {"loss", "grad_norm"}
    np.testing.assert_allclose(
        m["loss"], np.mean([float(b["loss"]) for b in batches]), rtol=1e-6)
    np.testing.assert_allclose(
        m["grad_norm"],
        np.mean([float(b["grad_norm"]) for b in batches]), rtol=1e-6)

    bare = StatsAccumulator()
    for v in (jnp.float32(1.0), jnp.float32(3.0)):
        bare.add(v)
    assert bare.means() == {"loss": 2.0}
    assert StatsAccumulator().means() == {}


def test_bf16_mu_checkpoint_roundtrip(tmp_path):
    """adam_mu_dtype='bfloat16' opt states must survive the npz format:
    np.savez stores ml_dtypes.bfloat16 as raw void ('|V2'), so leaves are
    widened to f32 on save and cast back on restore (exact both ways).
    Legacy checkpoints that DID save '|V2' are rescued by a view."""
    import io

    import ml_dtypes
    import optax
    from sea_tpu.utils.checkpoint import restore_pytree, save_pytree
    params = {"w": jnp.ones((4, 3))}
    tx = optax.adamw(1e-3, mu_dtype=jnp.bfloat16)
    st = tx.init(params)
    grads = {"w": jnp.full((4, 3), 0.25)}
    _, st = tx.update(grads, st, params)
    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"opt_state": st})
    r = restore_pytree(path, {"opt_state": st})
    mu = r["opt_state"][0].mu["w"]
    assert mu.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(np.asarray(mu),
                                  np.asarray(st[0].mu["w"]))

    # Legacy file: raw-void bf16 bytes (pre-fix writer).
    raw = np.asarray(st[0].mu["w"])  # ml_dtypes.bfloat16 ndarray
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, **{"mu/w": raw})
    got = restore_pytree(legacy, {"mu": {"w": st[0].mu["w"]}})
    assert got["mu"]["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(np.asarray(got["mu"]["w"]), raw)


def test_orbax_rebuild_matches_by_field_name():
    """_rebuild_like must pair orbax dicts to optax namedtuples by FIELD
    NAME, not traversal order, and validate leaf shapes."""
    import optax
    import pytest
    from sea_tpu.utils.checkpoint import _rebuild_like
    params = {"w": jnp.ones((2, 2))}
    st = optax.adamw(1e-3).init(params)
    adam = st[0]
    restored = {"nu": {"w": np.full((2, 2), 2.0)},
                "count": np.asarray(7, np.int32),
                "mu": {"w": np.full((2, 2), 1.0)}}  # scrambled key order
    rebuilt = _rebuild_like(adam, restored)
    assert type(rebuilt) is type(adam)
    assert float(rebuilt.count) == 7
    assert float(rebuilt.mu["w"][0, 0]) == 1.0
    assert float(rebuilt.nu["w"][0, 0]) == 2.0
    with pytest.raises(ValueError, match="shape"):
        _rebuild_like(adam, {**restored,
                             "mu": {"w": np.zeros((3, 3))}})
    with pytest.raises(KeyError, match="missing"):
        _rebuild_like(adam, {"mu": restored["mu"]})


def test_latent_service_with_params_overrides_decode():
    """with_params (the staged --precision path) must actually change the
    weights decode_dataset uses."""
    from sea_tpu.configs.cylinder_flow import get_case
    from sea_tpu.data.latents import LatentService
    from sea_tpu.models.spatial import init_spatial
    case = get_case()
    cfg = case.spatial.with_n_inp(8)
    p1 = init_spatial(jax.random.PRNGKey(0), cfg)
    p2 = init_spatial(jax.random.PRNGKey(1), cfg)
    svc = LatentService(cfg, p1, batch_size=4)
    z = np.random.RandomState(0).randn(
        2, case.mesh.num_patches, cfg.num_groups,
        cfg.embed_dim).astype(np.float32)
    d1 = svc.decode_dataset(z)
    svc2 = svc.with_params(p2)
    d2 = svc2.decode_dataset(z)
    assert svc.params is p1  # original untouched
    assert not np.allclose(d1, d2)


def test_set_seed_seeds_all_host_rngs():
    """Reference main.py:14-21 parity: one switch seeds random/numpy/torch
    and returns a jax key derived from the same value."""
    import random
    from sea_tpu.utils.seeding import set_seed
    key1 = set_seed(123)
    a_py, a_np = random.random(), np.random.rand()
    key2 = set_seed(123)
    assert random.random() == a_py
    assert np.random.rand() == a_np
    assert jnp.array_equal(key1, key2)
    assert jnp.array_equal(key1, jax.random.PRNGKey(123))
    import os
    assert os.environ["PYTHONHASHSEED"] == "123"
    import torch
    t1 = torch.rand(3)
    set_seed(123)
    assert torch.equal(torch.rand(3), t1)


def test_wandb_tracker_log_model(monkeypatch):
    """Regression (VERDICT r3 weak #5): WandbErrorTracker.log_model was an
    inherited no-op — a caller porting reference code
    (train_encoder.py:196 error_tracker.log_model(...)) silently got
    nothing. It must record the model description (the wandb.watch
    equivalent) on the run config; both train drivers now call it."""
    import sys
    import types

    import numpy as np

    recorded = {}

    class _Config:
        @staticmethod
        def update(info, allow_val_change=False):
            recorded.update(info)

    class _Run:
        config = _Config()

    fake = types.SimpleNamespace(init=lambda **kw: _Run(),
                                 log=lambda *a, **k: None,
                                 finish=lambda: None)
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from sea_tpu.train.tracking import MultiTracker, WandbErrorTracker
    t = WandbErrorTracker("proj", "run")
    params = {"a": np.zeros((2, 3)), "b": np.zeros((4,))}
    t.log_model(params, "MSE", "adamw")
    assert recorded == {"model/num_tensors": 2, "model/num_params": 10,
                        "model/criterion": "MSE",
                        "model/optimizer": "adamw"}
    # MultiTracker forwards log_model to every member.
    recorded.clear()
    MultiTracker(t).log_model(params, "Vloss", "adafactor")
    assert recorded["model/criterion"] == "Vloss"
