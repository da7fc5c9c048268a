"""Multi-chip through the USER surface: `python -m sea_tpu.cli ... --mesh`.

Round-2 verdict item #1: the parallel stack must be reachable from the CLI,
not only as a library. These tests drive cli.main() on the virtual 8-device
CPU mesh with the real shipped cylinder_flow preset (tiny synthetic data),
covering --mesh DxM, --mesh auto, and --seq_parallel N.
"""

import os

import jax
import pytest

from sea_tpu import cli

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_flag_parsing_errors(capsys):
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
                  "--mesh", "4by2"])
    assert "--mesh" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "test", "--synthetic",
                  "--seq_parallel", "4"])
    assert "--seq_parallel" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
                  "--mesh", "4x2", "--seq_parallel", "4"])
    assert "mutually exclusive" in capsys.readouterr().err


@requires_8
@pytest.mark.heavy
def test_cli_trains_both_stages_on_explicit_mesh(tmp_path):
    """encoder + temporal training sharded 4x2 (DP x TP) from the command
    line; checkpoints land under the usual family names."""
    save = str(tmp_path)
    cli.main(["cylinder_flow", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "4x2"])
    assert os.path.exists(
        os.path.join(save, "encoder_decoder_cylinder_flow_run1.npz"))
    cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "4x2"])
    assert os.path.exists(
        os.path.join(save, "temporal_cylinder_flow_run1.npz"))


@requires_8
@pytest.mark.heavy
def test_cli_seq_parallel_training(tmp_path):
    """--seq_parallel 8: the time axis of the shipped cylinder recipe
    (dropout 0.1 -> in-ring counter-hash dropout) shards over the ring."""
    save = str(tmp_path)
    cli.main(["cylinder_flow", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--seq_parallel", "8"])
    assert os.path.exists(
        os.path.join(save, "temporal_cylinder_flow_run1.npz"))


def test_pp_flag_parsing_errors(capsys):
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "test", "--synthetic",
                  "--pp", "2"])
    assert "--pp" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
                  "--pp", "2", "--seq_parallel", "4"])
    assert "mutually exclusive" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
                  "--pp", "2", "--mesh", "4x2"])
    assert "mutually exclusive" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow", "temporal", "train", "--synthetic",
                  "--pp", "1"])
    assert "at least 2 stages" in capsys.readouterr().err


@requires_8
@pytest.mark.heavy
def test_cli_pipeline_parallel_training(tmp_path):
    """--pp 4: the deep smoke preset's 4-layer stack shards over a
    ('data'=2, 'pipe'=4) mesh from the command line; the checkpoint lands
    in the standard (unstacked) family layout and the 1-layer shipped
    preset fails with the helpful divisibility error."""
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke_deep", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    # M=2 microbatches: 2 (mb) x 2 ('data') = batch 4 fits the 5 synthetic
    # training windows (the M=S default would round the batch up to 8).
    cli.main(["cylinder_flow_smoke_deep", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--pp", "4",
              "--pp_microbatches", "2"])
    path = os.path.join(save, "temporal_cylinder_flow_run1.npz")
    assert os.path.exists(path)
    # Standard layout: loadable against the plain init template.
    import jax as _jax
    from sea_tpu.configs.cylinder_flow_smoke_deep import get_case
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.utils.checkpoint import load_params
    case = get_case()
    load_params(path, init_temporal(_jax.random.PRNGKey(0), case.temporal))
    with pytest.raises(ValueError, match="divisible by the pipe size"):
        cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
                  "--epochs", "1", "--save_dir", save, "--pp", "2"])


@requires_8
def test_mesh_auto_resolution():
    """'auto' spans all 8 virtual devices; 'none' and test modes stay
    single-device."""
    import argparse
    parser = argparse.ArgumentParser()

    class A:
        mode, seq_parallel, mesh, pp = "train", 0, "auto", 0
        model_type = "temporal"
    mesh, seq, pipe = cli._resolve_meshes(parser, A())
    assert seq is None and pipe is None and mesh is not None
    assert mesh.shape["data"] == len(jax.devices())
    A.mesh = "none"
    assert cli._resolve_meshes(parser, A()) == (None, None, None)
    A.mesh, A.mode = "auto", "test"
    assert cli._resolve_meshes(parser, A()) == (None, None, None)
    A.mode, A.pp = "train", 4
    mesh, seq, pipe = cli._resolve_meshes(parser, A())
    assert mesh is None and seq is None
    assert pipe.shape["pipe"] == 4
    assert pipe.shape["data"] == len(jax.devices()) // 4


@pytest.mark.heavy
def test_cli_fused_serving_with_precision(tmp_path, capsys):
    """`temporal test --precision int8` runs the fused on-device serving
    program (rollout + decode + unpatch as ONE jit) with int8 weights in
    BOTH stages, and prints the same metrics contract as the staged path
    (VERDICT r2 item 6)."""
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    capsys.readouterr()
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--precision", "int8"])
    out = capsys.readouterr().out
    assert "int8 weights" in out and "rollout + decode" in out
    assert "encoded_rel_mse" in out and "decoded_rel_mse" in out
    # Serving artifacts (CSV + plots) land under the save dir.
    assert os.path.exists(os.path.join(
        save, "rollout_error_cylinder_flow_run1.csv"))
    # int4 serves through the same fused program (packed-nibble w_p4
    # storage, per-call kernel/XLA dispatch — utils/precision.py).
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--precision", "int4",
              "--no_drift_check"])
    out = capsys.readouterr().out
    assert "int4 weights" in out and "decoded_rel_mse" in out
    # single-chip int4 serving calibrates by default (activation-aware
    # scales + bias correction, utils/calibration.py); opt-out flag works
    assert "int4 calibration" in out
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--precision", "int4", "--no_calibrate",
              "--no_drift_check"])
    out = capsys.readouterr().out
    assert "int4 weights" in out and "int4 calibration" not in out
    # int8 KV caches (--kv_cache int8): per-token-scaled planes carried
    # through the fused serving program. An EXPLICIT cache dtype must
    # force the scan engine — the prefix engine has no KV cache, so
    # silently routing there would measure nothing (review finding).
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--kv_cache", "int8"])
    out = capsys.readouterr().out
    assert "decoded_rel_mse" in out
    assert "scan engine forced" in out


@pytest.mark.heavy
def test_cli_precision_drift_gate(tmp_path, capsys):
    """VERDICT r3 item 7: quantized serving measures the LOADED
    checkpoint's teacher-forced drift at load time (drift numbers do not
    transfer between checkpoints) and aborts over budget with an
    actionable message; --no_drift_check opts out."""
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    capsys.readouterr()
    # Generous budget: gate prints the measured drift and serving runs.
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--precision", "int8",
              "--drift_budget", "1.0"])
    out = capsys.readouterr().out
    assert "teacher-forced drift" in out and "decoded_rel_mse" in out
    # Impossible budget: abort before any rollout, with the override hint.
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
                  "--save_dir", save, "--precision", "int8",
                  "--drift_budget", "1e-9"])
    captured = capsys.readouterr()
    assert "exceeds the budget" in captured.err
    assert "decoded_rel_mse" not in captured.out
    # Explicit opt-out skips the measurement entirely.
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--precision", "int8",
              "--no_drift_check"])
    out = capsys.readouterr().out
    assert "teacher-forced drift" not in out and "decoded_rel_mse" in out


@requires_8
@pytest.mark.heavy
def test_cli_sharded_serving_matches_single_device(tmp_path, capsys):
    """`temporal test --mesh 4x2` shards the serving rollout
    (trajectories over 'data', tensor-parallel params over 'model') and
    reproduces the single-device fused path's metrics. The synthetic
    test split (2 trajectories) does NOT divide the data axis — the
    pad-and-trim path is exercised."""
    import re
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    capsys.readouterr()
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save])
    single = capsys.readouterr().out
    cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
              "--save_dir", save, "--mesh", "4x2"])
    sharded = capsys.readouterr().out
    assert "sharded serving" in sharded

    def metric(out, key):
        return float(re.search(rf"{key}: ([0-9.eE+-]+)", out).group(1))
    for key in ("encoded_rel_mse", "decoded_rel_mse"):
        assert abs(metric(single, key) - metric(sharded, key)) \
            <= 1e-3 * max(1.0, abs(metric(single, key)))


def test_cli_train_recipe_flags(tmp_path, capsys):
    """--compute_dtype/--batch_size/--adam_mu_dtype surface the measured
    training recipe (BASELINE.md MFU rows) on the CLI: training runs
    under the override (bf16_shadow selects the shadow optimizer wrapper,
    so the override must be applied before checkpoint templates), and the
    flags are rejected outside train modes."""
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none",
              "--compute_dtype", "bf16_shadow", "--batch_size", "2",
              "--adam_mu_dtype", "bf16", "--optimizer", "adafactor"])
    assert os.path.exists(
        os.path.join(save, "temporal_cylinder_flow_run1.npz"))
    capsys.readouterr()
    # Resume under the same recipe: the opt template includes the shadow
    # wrapper AND the adafactor state structure.
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none",
              "--compute_dtype", "bf16_shadow", "--optimizer", "adafactor",
              "--model_path",
              os.path.join(save, "temporal_cylinder_flow_run1.npz")])
    assert "Continuing training" in capsys.readouterr().out
    # Resume the SHADOW checkpoint without the recipe flag: the optimizer
    # structure mismatches — params resume with a fresh optimizer and a
    # loud warning naming the likely cause, not a bare KeyError.
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none",
              "--model_path",
              os.path.join(save, "temporal_cylinder_flow_run1.npz")])
    out = capsys.readouterr().out
    assert "FRESH" in out and "compute_dtype" in out
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
                  "--save_dir", save, "--compute_dtype", "bf16_mixed"])
    assert "--compute_dtype" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
                  "--save_dir", save, "--batch_size", "0"])
    assert "--batch_size" in capsys.readouterr().err


def test_cli_generate_mode(tmp_path):
    """`temporal generate`: arbitrary-horizon surrogate simulation from
    the CLI — horizon past the dataset window (ib tail held), decoded
    fields written to --output; generate-only flags rejected elsewhere."""
    import numpy as np
    save = str(tmp_path)
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    cli.main(["cylinder_flow_smoke", "temporal", "train", "--synthetic",
              "--epochs", "1", "--save_dir", save, "--mesh", "none"])
    out = os.path.join(save, "gen.npy")
    cli.main(["cylinder_flow_smoke", "temporal", "generate", "--synthetic",
              "--save_dir", save, "--horizon", "55", "--output", out])
    fields = np.load(out)
    assert fields.ndim == 3 and fields.shape[0] == 55
    assert np.isfinite(fields).all()
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
                  "--save_dir", save, "--horizon", "10"])
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "encoder", "generate",
                  "--synthetic", "--save_dir", save])
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "generate",
                  "--synthetic", "--save_dir", save, "--mesh", "2x2"])


def test_cli_profile_flag(tmp_path):
    """--profile captures a jax.profiler trace of one steady-state epoch
    (epoch 2) during training; rejected outside train modes."""
    prof = tmp_path / "trace"
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "2", "--save_dir", str(tmp_path),
              "--mesh", "none", "--profile", str(prof)])
    traces = list(prof.rglob("*.xplane.pb"))
    assert traces, f"no xplane trace written under {prof}"
    with pytest.raises(SystemExit):
        cli.main(["cylinder_flow_smoke", "temporal", "test", "--synthetic",
                  "--save_dir", str(tmp_path), "--profile", str(prof)])


def test_cli_platform_flag(tmp_path):
    """--platform pins the JAX backend before any device access (the
    JAX_PLATFORMS env route can be rewritten to a priority list by
    launcher environments; jax.config.update is authoritative). In this
    suite the backend is already cpu, so --platform cpu must train
    cleanly and leave the backend on cpu."""
    cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
              "--epochs", "1", "--save_dir", str(tmp_path),
              "--mesh", "none", "--platform", "cpu"])
    assert jax.default_backend() == "cpu"
    assert os.path.exists(
        os.path.join(str(tmp_path), "encoder_decoder_cylinder_flow_run1.npz"))


def test_python_dash_m_package_entry(capsys):
    """`python -m sea_tpu ...` is the reference's `python main.py ...`
    surface (main.py:42-47): the package __main__ delegates to cli.main."""
    import runpy
    import sys
    argv = sys.argv
    sys.argv = ["sea_tpu", "--help"]
    try:
        with pytest.raises(SystemExit) as e:
            runpy.run_module("sea_tpu", run_name="__main__",
                             alter_sys=False)
        assert e.value.code in (0, None)
    finally:
        sys.argv = argv
    assert "temporal" in capsys.readouterr().out


@pytest.mark.heavy
def test_cli_seed_flag_is_deterministic(tmp_path):
    """`--seed N` makes the whole CLI run reproducible: two encoder
    trainings with the same seed produce bit-identical checkpoints
    (splits, synthetic data, model init, and batch order all derive from
    the one value); a different seed produces a different one."""
    import numpy as np

    def run(save, seed):
        cli.main(["cylinder_flow_smoke", "encoder", "train", "--synthetic",
                  "--epochs", "2", "--save_dir", save, "--mesh", "none",
                  "--seed", str(seed)])
        path = os.path.join(save,
                            "encoder_decoder_cylinder_flow_run1.npz")
        with np.load(path) as z:
            return {k: z[k].copy() for k in z.files}

    a = run(str(tmp_path / "a"), 11)
    b = run(str(tmp_path / "b"), 11)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    c = run(str(tmp_path / "c"), 12)
    assert any(not np.array_equal(a[k], c[k]) for k in a
               if a[k].shape == c[k].shape)
