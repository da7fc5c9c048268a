"""End-to-end two-stage training on tiny synthetic data.

The minimum end-to-end slice of SURVEY §7: synthetic cylinder-like data ->
partition -> train stage-1 AE a few epochs -> encode latents -> train
stage-2 SEA temporal model -> scan rollout eval -> decoded rel-MSE +
artifacts. Exercises every layer except multi-chip.
"""

import os

import numpy as np
import pytest

from sea_tpu.configs.base import (CaseConfig, MeshConfig, RunConfig,
                                  SpatialModelConfig, SplitConfig,
                                  TemporalModelConfig, TrainConfig)
from sea_tpu.data.synthetic import cylinder_like


def tiny_case(tmp_path) -> CaseConfig:
    mesh = MeshConfig(m=3, n=3)  # P = 4
    spatial = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=16,
                                 num_layers=1, embed_dim=4, n_heads=2,
                                 block_size=64, dropout=0.0)
    temporal = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                                   block_size=64, scale_ratio=2,
                                   num_fields=2, down_proj=2, dropout=0.0,
                                   exchange_mode="sea", ib_scale_mode="mlp",
                                   ib_addition_mode="add", ln_type="adaln")
    return CaseConfig(
        mesh=mesh, spatial=spatial, temporal=temporal,
        spatial_split=SplitConfig(train_fraction=0.7, val_fraction=0.2),
        temporal_split=SplitConfig(train_fraction=0.5, val_fraction=0.25),
        spatial_train=TrainConfig(batch_size=8, epoch_num=2,
                                  validation_interval=1),
        temporal_train=TrainConfig(batch_size=2, eval_batch_size=2,
                                   epoch_num=2, validation_interval=1,
                                   full_eval_interval=2, dataset_src_len=7),
        run=RunConfig(save_dir=str(tmp_path), perform_initial_test=True))


@pytest.fixture(scope="module")
def synth():
    return cylinder_like(tr=4, T=8, n_nodes=120, seed=3)


@pytest.mark.heavy
def test_two_stage_training_e2e(tmp_path, synth):
    from sea_tpu.train.train_spatial import train as train_spatial
    from sea_tpu.train.train_temporal import train as train_temporal
    from sea_tpu.train.tracking import CSVErrorTracker

    case = tiny_case(tmp_path)
    tracker = CSVErrorTracker(str(tmp_path), "e2e")
    sparams, sdata = train_spatial(case, tracker, data=synth)
    assert os.path.exists(
        os.path.join(tmp_path, "encoder_decoder_cylinder_flow_run1.npz"))

    tparams, tdata = train_temporal(case, data=synth,
                                    spatial_params=sparams)
    assert os.path.exists(
        os.path.join(tmp_path, "temporal_cylinder_flow_run1.npz"))
    # Full-eval artifacts: rollout CSV + error plot + checkpoint.
    assert os.path.exists(
        os.path.join(tmp_path, "rollout_error_cylinder_flow_run1.csv"))
    assert os.path.exists(
        os.path.join(tmp_path, "temporal_Checkpoint_cylinder_flow_run1.npz"))

    # Metrics CSV recorded both phases, incl. grad/param observability
    # (the wandb.watch equivalent).
    rows = open(os.path.join(tmp_path, "e2e_metrics.csv")).read()
    assert "train" in rows and "val" in rows
    assert "Grad_Norm" in rows and "Param_Norm" in rows


@pytest.mark.heavy
def test_non_primary_process_writes_nothing(tmp_path, synth, monkeypatch):
    """Multi-host hygiene: on a non-primary process the training drivers
    train (metrics still flow) but write no checkpoints or eval artifacts —
    only process 0 touches the filesystem."""
    import sea_tpu.train.evaluate as ev
    import sea_tpu.train.train_spatial as ts
    import sea_tpu.train.train_temporal as tt
    monkeypatch.setattr(ts, "is_primary", lambda: False)
    monkeypatch.setattr(tt, "is_primary", lambda: False)
    monkeypatch.setattr(ev, "is_primary", lambda: False)

    case = tiny_case(tmp_path)
    sparams, _ = ts.train(case, data=synth, epochs=1)
    tparams, _ = tt.train(case, data=synth, spatial_params=sparams, epochs=2)
    assert tparams is not None
    # Only the scaler fit by MeshProcessor (data prep, every process needs
    # it) may exist; no checkpoints, CSVs, or plots.
    leftover = [f for f in os.listdir(tmp_path)
                if not f.startswith("scaler")]
    assert leftover == [], leftover


def test_spatial_eval_flow(tmp_path, synth):
    from sea_tpu.train.train_spatial import train as train_spatial
    from sea_tpu.train.evaluate import test_encoder_decoder

    case = tiny_case(tmp_path)
    sparams, sdata = train_spatial(case, data=synth, epochs=1)
    results = test_encoder_decoder(sparams, case, sdata.test,
                                   sdata.mesh_processor,
                                   spatial_cfg=sdata.spatial_cfg,
                                   save_artifacts=True)
    for key in ("mse_patched", "mse_unpatched", "relative_mse"):
        assert np.isfinite(results[key]), key


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.utils.checkpoint import restore_pytree, save_pytree

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, {"params": params})
    restored = restore_pytree(path, {"params": params})
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(restored["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax pytree checkpointing (the multi-host-capable path): params +
    opt-state trees round-trip losslessly through save/restore."""
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.utils.checkpoint import (restore_checkpoint_orbax,
                                          save_checkpoint_orbax)
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    path = save_checkpoint_orbax(str(tmp_path / "ckpt"), {"params": params})
    restored = restore_checkpoint_orbax(path, {"params": params})
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_checkpoint_restores_opt_state(tmp_path):
    """load_full_checkpoint returns optimizer state (optax namedtuples
    intact) when the checkpoint has one, and None otherwise — both npz and
    orbax formats."""
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.utils.checkpoint import (load_full_checkpoint,
                                          save_checkpoint)

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    opt = tx.init(params)
    # Make the moments non-trivial so the roundtrip is meaningful.
    grads = jax.tree.map(lambda x: x + 0.25, params)
    updates, opt = tx.update(grads, opt, params)

    for use_orbax in (False, True):
        path = save_checkpoint(str(tmp_path), f"temporal{use_orbax}", "c",
                               "r", params, opt_state=opt,
                               meta={"epoch": 3}, use_orbax=use_orbax)
        rparams, ropt, meta = load_full_checkpoint(path, params,
                                                   tx.init(params))
        assert ropt is not None, use_orbax
        assert jax.tree.structure(ropt) == jax.tree.structure(opt)
        for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(ropt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(meta["epoch"]) == 3
        # tx.update works on the restored state (namedtuple types intact).
        tx.update(grads, jax.tree.map(jnp_asarray, ropt), params)

    # params-only checkpoint -> opt comes back None.
    path = save_checkpoint(str(tmp_path), "ponly", "c", "r", params)
    _, ropt, _ = load_full_checkpoint(path, params, tx.init(params))
    assert ropt is None


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


@pytest.mark.heavy
def test_sharded_resume_continues_training(tmp_path):
    """Round-2 verdict item #7: train sharded -> checkpoint -> restore
    params AND opt state onto the mesh -> training continues (loss finite,
    moments non-zero on the mesh)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sea_tpu.parallel.mesh import make_mesh
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import train as train_temporal
    from sea_tpu.train.train_spatial import train as train_spatial
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.utils.checkpoint import (checkpoint_path,
                                          load_full_checkpoint)

    case = tiny_case(tmp_path)
    mesh = make_mesh(n_data=4, n_model=2)
    # The DP axis rounds the batch up to 4, so this test needs >= 8
    # trajectories (temporal train fraction 0.5, one window each) — the
    # shared 4-trajectory fixture leaves zero full batches.
    synth = cylinder_like(tr=12, T=8, n_nodes=120, seed=5)
    sparams, _ = train_spatial(case, data=synth, epochs=1)
    train_temporal(case, data=synth, spatial_params=sparams, epochs=1,
                   mesh=mesh)
    path = checkpoint_path(str(tmp_path), "temporal",
                           case.run.case_name, case.run.run_name)
    template = init_temporal(jax.random.PRNGKey(0), case.temporal)
    tx = make_optimizer(case.temporal_train)
    rparams, ropt, meta = load_full_checkpoint(path, template,
                                               tx.init(template))
    assert ropt is not None and int(meta["epoch"]) == 1
    # Moments actually carry information from epoch 1.
    mu_norm = sum(float(np.abs(np.asarray(x)).sum())
                  for x in jax.tree.leaves(ropt[0].mu))
    assert mu_norm > 0.0
    # Continue on the mesh with the restored optimizer.
    params2, _ = train_temporal(case, data=synth, spatial_params=sparams,
                                epochs=1, mesh=mesh, init_params=rparams,
                                init_opt_state=ropt)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params2))


def test_per_tensor_observability_driver(tmp_path, synth):
    """log_per_tensor=True flows through the spatial driver into the CSV
    tracker as a "tensors" phase with Grad_Norm/<path> + Param_Norm/<path>
    rows (the wandb.watch substitute on the product surface)."""
    import dataclasses
    from sea_tpu.train.tracking import CSVErrorTracker
    from sea_tpu.train.train_spatial import train as train_spatial

    case = tiny_case(tmp_path)
    case = case.replace(spatial_train=dataclasses.replace(
        case.spatial_train, log_per_tensor=True))
    tracker = CSVErrorTracker(str(tmp_path), "pt")
    train_spatial(case, tracker, data=synth, epochs=1)
    rows = [r.split(",") for r in
            open(os.path.join(tmp_path, "pt_metrics.csv")).read()
            .strip().splitlines()[1:]]
    tensor_rows = [r for r in rows if r[0] == "tensors"]
    assert any(r[2].startswith("Grad_Norm/") for r in tensor_rows)
    assert any(r[2].startswith("Param_Norm/") for r in tensor_rows)
    assert all(np.isfinite(float(r[3])) for r in tensor_rows)


def test_device_resident_batching_matches_host_batching(tmp_path, synth):
    """TrainConfig.device_resident_data (train split uploaded once,
    minibatches gathered on-device with the SAME index stream as host
    batching) must be numerically identical to the host path: same final
    params after 2 epochs."""
    import dataclasses
    import jax
    from sea_tpu.train.train_spatial import train as train_spatial
    from sea_tpu.train.train_temporal import train as train_temporal

    case = tiny_case(tmp_path)
    sparams, _ = train_spatial(case, data=synth)

    results = {}
    for flag in (True, False):
        case_f = case.replace(
            run=dataclasses.replace(case.run,
                                    save_dir=str(tmp_path / f"r{flag}")),
            temporal_train=dataclasses.replace(
                case.temporal_train, device_resident_data=flag))
        os.makedirs(str(tmp_path / f"r{flag}"), exist_ok=True)
        tparams, _ = train_temporal(case_f, data=synth,
                                    spatial_params=sparams)
        results[flag] = tparams
    for a, b in zip(jax.tree.leaves(results[True]),
                    jax.tree.leaves(results[False])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_device_resident_matches_host(tmp_path, synth):
    """Spatial driver: device-resident batching is bit-identical to host
    batching (same shared index stream)."""
    import dataclasses
    import jax
    from sea_tpu.train.train_spatial import train as train_spatial
    case = tiny_case(tmp_path)
    results = {}
    for flag in (True, False):
        case_f = case.replace(
            run=dataclasses.replace(case.run,
                                    save_dir=str(tmp_path / f"s{flag}")),
            spatial_train=dataclasses.replace(
                case.spatial_train, device_resident_data=flag))
        os.makedirs(str(tmp_path / f"s{flag}"), exist_ok=True)
        sparams, _ = train_spatial(case_f, data=synth)
        results[flag] = sparams
    for a, b in zip(jax.tree.leaves(results[True]),
                    jax.tree.leaves(results[False])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
