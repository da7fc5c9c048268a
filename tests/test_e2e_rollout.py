"""Fully on-device rollout eval must match the staged (numpy) pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from sea_tpu.configs.base import (CaseConfig, MeshConfig, RunConfig,
                                  SpatialModelConfig, TemporalModelConfig,
                                  TrainConfig)
from sea_tpu.data.datasets import apply_sea_layout, make_temporal_windows
from sea_tpu.data.latents import LatentService, transform_latents_to_temporal
from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.data.synthetic import cylinder_like
from sea_tpu.models.spatial import init_spatial
from sea_tpu.models.temporal import init_temporal
from sea_tpu.rollout.e2e import make_e2e_rollout_eval
from sea_tpu.train.evaluate import full_autoregressive_evaluation


import pytest


@pytest.mark.parametrize("scaled,exchange", [(False, "sea"), (True, "sea"),
                                             (False, "pool")])
def test_on_device_eval_matches_staged_pipeline(tmp_path, scaled, exchange):
    fields, coords, ib = cylinder_like(tr=2, T=9, n_nodes=150)
    tr, T, N, F = fields.shape
    mesh_cfg = MeshConfig(m=3, n=3,
                          scale_feature_range=(-1.0, 1.0) if scaled else None)
    mp = MeshProcessor(mesh_cfg, [[0, 1], [2]], coords,
                       save_dir=str(tmp_path))
    _, patched = mp.patchify_and_scale(fields.reshape(tr * T, N, F))
    tokens = apply_sea_layout(patched, "isolate")

    scfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=8,
                              num_layers=1, embed_dim=4, n_heads=2,
                              block_size=32).with_n_inp(mp.cells_per_patch)
    sparams = init_spatial(jax.random.PRNGKey(0), scfg)
    svc = LatentService(scfg, sparams)
    lat = transform_latents_to_temporal(svc.encode_dataset(tokens), tr, T,
                                        mp.num_patches, 2)

    tcfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                               block_size=32, scale_ratio=2, num_fields=2,
                               down_proj=2, dropout=0.0,
                               exchange_mode=exchange,
                               ib_scale_mode="mlp", ib_addition_mode="add",
                               ln_type="ln" if exchange == "pool"
                               else "adaln")
    tparams = init_temporal(jax.random.PRNGKey(1), tcfg)

    windows = make_temporal_windows(lat, fields, ib, src_len=T - 1)
    case = CaseConfig(mesh=mesh_cfg, spatial=scfg, temporal=tcfg,
                      run=RunConfig(save_dir=str(tmp_path)))

    # Staged (numpy) pipeline.
    staged = full_autoregressive_evaluation(tparams, case, windows, svc, mp,
                                            save_artifacts=False)

    # Fully on-device pipeline.
    run = make_e2e_rollout_eval(tcfg, scfg, mp.partition,
                                scalers=mp.scalers,
                                field_groups=mp.field_groups)
    decoded, rel, enc_rel = run(tparams, sparams,
                                jnp.asarray(windows.src[:, 0]),
                                jnp.asarray(windows.ib),
                                jnp.asarray(windows.tgt_original),
                                jnp.asarray(windows.tgt))
    per_time = np.asarray(rel).mean(axis=0)

    np.testing.assert_allclose(per_time,
                               staged["decoded_rel_mse_per_time"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(rel).mean()),
                               staged["decoded_rel_mse"], rtol=1e-4)
    np.testing.assert_allclose(float(enc_rel), staged["encoded_rel_mse"],
                               rtol=1e-4)

    # The driver-level wrapper (what the CLI `temporal test` runs) must
    # agree too, including with reduced-precision decode weights.
    from sea_tpu.train.evaluate import fused_autoregressive_evaluation
    fused = fused_autoregressive_evaluation(tparams, case, windows, svc, mp,
                                            save_artifacts=False)
    np.testing.assert_allclose(fused["decoded_rel_mse"],
                               staged["decoded_rel_mse"], rtol=1e-4)
    np.testing.assert_allclose(fused["encoded_rel_mse"],
                               staged["encoded_rel_mse"], rtol=1e-4)
    from sea_tpu.utils.precision import cast_weights_bf16
    fused_bf16 = fused_autoregressive_evaluation(
        cast_weights_bf16(tparams), case, windows, svc, mp,
        spatial_params=cast_weights_bf16(sparams), save_artifacts=False)
    # Tiny models fall below the bf16 cast size threshold unless forced;
    # the call is exercising the plumbing — drift stays bounded either way.
    assert np.isfinite(fused_bf16["decoded_rel_mse"])
    assert abs(fused_bf16["decoded_rel_mse"] - staged["decoded_rel_mse"]) \
        <= 0.05 * (abs(staged["decoded_rel_mse"]) + 1e-6)


def test_generate_matches_eval_and_extends(tmp_path):
    """generate_trajectory == the fused eval's decoded fields at the
    window horizon; a LONGER horizon (ib tail held) reproduces those
    first T steps exactly (causality) and stays finite beyond them."""
    fields, coords, ib = cylinder_like(tr=2, T=9, n_nodes=150)
    tr, T, N, F = fields.shape
    mesh_cfg = MeshConfig(m=3, n=3)
    mp = MeshProcessor(mesh_cfg, [[0, 1], [2]], coords,
                       save_dir=str(tmp_path))
    _, patched = mp.patchify_and_scale(fields.reshape(tr * T, N, F))
    tokens = apply_sea_layout(patched, "isolate")
    scfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=8,
                              num_layers=1, embed_dim=4, n_heads=2,
                              block_size=32).with_n_inp(mp.cells_per_patch)
    sparams = init_spatial(jax.random.PRNGKey(0), scfg)
    svc = LatentService(scfg, sparams)
    lat = transform_latents_to_temporal(svc.encode_dataset(tokens), tr, T,
                                        mp.num_patches, 2)
    tcfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                               block_size=32, scale_ratio=2, num_fields=2,
                               down_proj=2, dropout=0.0,
                               exchange_mode="sea", ib_scale_mode="mlp",
                               ib_addition_mode="add", ln_type="adaln")
    tparams = init_temporal(jax.random.PRNGKey(1), tcfg)
    windows = make_temporal_windows(lat, fields, ib, src_len=T - 1)
    case = CaseConfig(mesh=mesh_cfg, spatial=scfg, temporal=tcfg,
                      run=RunConfig(save_dir=str(tmp_path)))

    run = make_e2e_rollout_eval(tcfg, scfg, mp.partition,
                                scalers=mp.scalers,
                                field_groups=mp.field_groups)
    decoded, _, _ = run(tparams, sparams, jnp.asarray(windows.src[:, 0]),
                        jnp.asarray(windows.ib),
                        jnp.asarray(windows.tgt_original),
                        jnp.asarray(windows.tgt))

    from sea_tpu.train.evaluate import generate_trajectory
    H = windows.ib.shape[1]
    gen = generate_trajectory(tparams, case, windows, svc, mp,
                              trajectory=1)
    np.testing.assert_allclose(gen, np.asarray(decoded[1]),
                               rtol=1e-5, atol=1e-6)
    # Horizon past the data: first H steps identical, tail finite.
    gen_long = generate_trajectory(tparams, case, windows, svc, mp,
                                   trajectory=1, horizon=H + 6)
    assert gen_long.shape[0] == H + 6
    np.testing.assert_allclose(gen_long[:H], gen, rtol=1e-5, atol=1e-6)
    assert np.isfinite(gen_long).all()
    # Horizon inside the data: a prefix of the full run.
    gen_short = generate_trajectory(tparams, case, windows, svc, mp,
                                    trajectory=1, horizon=3)
    np.testing.assert_allclose(gen_short, gen[:3], rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        generate_trajectory(tparams, case, windows, svc, mp, trajectory=9)
