"""Evaluation flows: full autoregressive rollout eval and stage-1 test.

Mirrors reference utils/train_utils.py:
- full_autoregressive_evaluation (:186-312): rollout the temporal model over
  a test set, compute encoded (latent) rel-MSE, decode through the frozen
  stage-1 model, un-patch/un-scale, compute decoded rel-MSE per (time,
  field), write the rollout CSV + field plots + error-vs-time plot.
- test_encoder_decoder (:364-431): stage-1 reconstruction quality with
  MSE before/after un-patching and rel-MSE, plus sample field plots.

The rollout itself runs on the scan+KV-cache engine (rollout/engine.py)
instead of the reference's O(T^2) prefix-recompute loop.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from sea_tpu.configs.base import CaseConfig
from sea_tpu.data.datasets import invert_sea_layout
from sea_tpu.data.latents import (LatentService, inverse_transform_latents)
from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.parallel.multihost import is_primary
from sea_tpu.rollout.engine import rollout
from sea_tpu.train import metrics as M
from sea_tpu.utils.plotting import (plot_all_fields_2d, plot_all_fields_3d,
                                    plot_rollout_error)


def autoregressive_validation(params, case: CaseConfig, windows, *,
                               sample: int = 0):
    """Cheap rollout check on ONE sample (train_utils.py:154-184): rollout
    the window, return (mse_loss, mean rel-MSE over time) in latent space."""
    src = jnp.asarray(windows.src[sample:sample + 1])
    tgt = jnp.asarray(windows.tgt[sample:sample + 1])
    ib = jnp.asarray(windows.ib[sample:sample + 1])
    preds = rollout(params, case.temporal, src[:, 0], ib)
    loss = float(M.mse(preds, tgt))
    rel = float(jnp.mean(M.relative_mse_with_time(preds, tgt, axis=3)))
    return loss, rel


def full_autoregressive_evaluation(params, case: CaseConfig, windows,
                                   latent_service: LatentService,
                                   mesh_processor: MeshProcessor, *,
                                   spatial_params=None, epoch: int = 0,
                                   plot_traj: bool = True,
                                   save_artifacts: bool = True,
                                   cache_dtype=jnp.float32,
                                   mesh=None) -> Dict[str, Any]:
    """windows: TemporalWindows (src, tgt, tgt_original, ib).

    Returns {encoded_rel_mse, decoded_rel_mse, decoded_rel_mse_per_time
    [T, F]} averaged over the set.

    ``spatial_params`` overrides the latent service's decoder weights
    (reduced-precision serving casts), same contract as
    fused_autoregressive_evaluation — the CLI's staged fallback relies
    on this so ``--precision`` applies to the decode stage too.

    ``mesh``: optional jax.sharding.Mesh — trajectories are sharded over
    its 'data' axis (each chip rolls out its shard; the trajectory count
    is padded up to a multiple of the axis and the padding trimmed) and
    params follow the tensor-parallel specs over 'model'
    (parallel/train_step.make_sharded_rollout). Scan-incremental configs
    only; others fall back to the single-device prefix engine.
    """
    tcfg = case.temporal
    if spatial_params is not None:
        latent_service = latent_service.with_params(spatial_params)
    src = jnp.asarray(windows.src)
    tgt = np.asarray(windows.tgt)
    ib = jnp.asarray(windows.ib)
    B, T = src.shape[0], src.shape[1]

    from sea_tpu.rollout.engine import is_scan_incremental
    if mesh is not None and is_scan_incremental(tcfg):
        from sea_tpu.parallel.train_step import make_sharded_rollout
        run, placed_params, place = make_sharded_rollout(
            mesh, tcfg, params, cache_dtype=cache_dtype)
        n_data = mesh.shape["data"]
        pad = (-B) % n_data
        x0, ib_p = np.asarray(src[:, 0]), np.asarray(ib)
        if pad:  # repeat the last trajectory; trimmed below
            x0 = np.concatenate([x0, np.repeat(x0[-1:], pad, 0)], axis=0)
            ib_p = np.concatenate([ib_p, np.repeat(ib_p[-1:], pad, 0)],
                                  axis=0)
        preds_dev = run(placed_params, *place(x0, ib_p))[:B]
    else:
        preds_dev = rollout(params, tcfg, src[:, 0], ib,
                            cache_dtype=cache_dtype)  # [B,T,G,E]
    encoded_rel_mse = float(jnp.mean(
        M.relative_mse(preds_dev, jnp.asarray(tgt))))
    preds = np.asarray(preds_dev)

    # Decode through the frozen stage-1 model.
    P = case.mesh.num_patches
    lat = inverse_transform_latents(preds, P)  # [B*T, P, G, D]
    decoded = latent_service.decode_dataset(lat)  # [B*T, P, F, C]
    decoded = invert_sea_layout(decoded, case.run.sea_layout)  # [B*T,P,C,F]
    flat = mesh_processor.inverse_scale_and_unpatch(decoded)  # [B*T, N, F]
    N, F = flat.shape[1], flat.shape[2]
    decoded_fields = flat.reshape(B, T, N, F)

    original = np.asarray(windows.tgt_original)  # [B, T, N, F]
    rel = np.asarray(M.relative_mse_with_time(
        jnp.asarray(decoded_fields), jnp.asarray(original)))  # [B, T, F]
    per_time = rel.mean(axis=0)  # [T, F]
    decoded_rel_mse = float(per_time.mean())

    # Artifact writes happen on process 0 only (multi-host hygiene).
    if save_artifacts and is_primary():
        _write_rollout_artifacts(case, mesh_processor, per_time, original,
                                 decoded_fields, epoch=epoch,
                                 plot_traj=plot_traj)

    return {"encoded_rel_mse": encoded_rel_mse,
            "decoded_rel_mse": decoded_rel_mse,
            "decoded_rel_mse_per_time": per_time}


def _write_rollout_artifacts(case, mesh_processor, per_time, original,
                             decoded_fields, *, epoch: int,
                             plot_traj: bool) -> None:
    """Rollout CSV + per-timestep field plots (train_utils.py:242-285)."""
    T = original.shape[1]
    save_dir = case.run.save_dir
    os.makedirs(save_dir, exist_ok=True)
    csv_path = os.path.join(
        save_dir,
        f"rollout_error_{case.run.case_name}_{case.run.run_name}.csv")
    with open(csv_path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["Time Step"] + [f"Field {i+1}"
                                         for i in range(per_time.shape[1])])
        for i, row in enumerate(per_time):
            writer.writerow([i + 1] + list(row))
    # Field plots for 5 seeded random timesteps (train_utils.py:242-276).
    rng = np.random.RandomState(case.temporal_split.random_seed)
    n_samples = min(5, T)
    sample_idx = rng.choice(T, n_samples, replace=False)
    coords = mesh_processor.coordinates
    for idx in sample_idx:
        if case.mesh.dimension == "2D":
            plot_all_fields_2d(original[0], coords[:, 0], coords[:, 1],
                               int(idx), filename=os.path.join(
                save_dir, f"temporal_original_data_{idx}_{epoch}.png"))
            plot_all_fields_2d(decoded_fields[0], coords[:, 0],
                               coords[:, 1], int(idx),
                               filename=os.path.join(
                save_dir, f"temporal_decoded_data_{idx}_{epoch}.png"))
        else:
            plot_all_fields_3d(original[0], coords[:, 0], coords[:, 1],
                               coords[:, 2], int(idx),
                               filename=os.path.join(
                save_dir, f"temporal_original_data_{idx}_{epoch}.png"))
            plot_all_fields_3d(decoded_fields[0], coords[:, 0],
                               coords[:, 1], coords[:, 2], int(idx),
                               filename=os.path.join(
                save_dir, f"temporal_decoded_data_{idx}_{epoch}.png"))
    if plot_traj:
        plot_rollout_error(per_time, os.path.join(
            save_dir,
            f"rollout_error_{case.run.case_name}_"
            f"{case.run.run_name}.png"))


def fused_autoregressive_evaluation(params, case: CaseConfig, windows,
                                    latent_service: LatentService,
                                    mesh_processor: MeshProcessor, *,
                                    spatial_params=None, epoch: int = 0,
                                    plot_traj: bool = True,
                                    save_artifacts: bool = True,
                                    cache_dtype=jnp.float32,
                                    engine: str = "auto") -> Dict[str, Any]:
    """Serving-mode evaluation: rollout + decode + un-patch + metrics as ONE
    compiled on-device program (rollout/e2e.py) — no host bounce between
    stages (the reference bounces latents GPU->CPU->GPU,
    train_utils.py:220-230). Same metrics/artifacts contract as
    full_autoregressive_evaluation. Handles EVERY config: non-incremental
    ones (attention-mode ib / src_len != 0) dispatch to the masked
    bucketed prefix engine (exact reference semantics) + the compiled
    tail below.

    ``spatial_params`` overrides the latent service's decoder weights —
    the CLI passes reduced-precision (bf16/int8) casts here so
    ``--precision`` applies end-to-end (temporal rollout AND decode).

    Engine selection (rollout.engine.select_engine) applies here too:
    for f32 weights at trajectory batch 1, the rollout runs on the
    bucketed prefix engine (~1.5x faster on-chip, BASELINE.md) followed
    by the same compiled decode/metrics tail — device-resident
    throughout, identical metrics.
    """
    from sea_tpu.rollout.e2e import make_e2e_rollout_eval, make_eval_tail
    from sea_tpu.rollout.engine import rollout, select_engine
    sparams = spatial_params if spatial_params is not None \
        else latent_service.params
    src = jnp.asarray(windows.src)
    ib = jnp.asarray(windows.ib)
    original = np.asarray(windows.tgt_original)
    if engine == "auto":
        engine = select_engine(case.temporal, src.shape[0], ib.shape[1],
                               params)
        if engine == "prefix" and cache_dtype != jnp.float32:
            # A caller-supplied cache dtype is a request for the KV-cache
            # engine; the prefix engine has no cache, so honoring the
            # request beats silently ignoring it (round-4 advisor
            # finding — mirrors the CLI's --kv_cache guard). Only the
            # scan-incremental configs CAN honor it; otherwise warn.
            from sea_tpu.rollout.engine import is_scan_incremental
            if is_scan_incremental(case.temporal):
                print(f"cache_dtype={np.dtype(cache_dtype).name}: scan "
                      "engine forced (the prefix engine has no KV cache)")
                engine = "scan"
            else:
                print(f"cache_dtype={np.dtype(cache_dtype).name} ignored: "
                      "non-incremental config serves on the prefix engine, "
                      "which has no KV cache")
    if engine == "scan":
        run = make_e2e_rollout_eval(
            case.temporal, latent_service.cfg, mesh_processor.partition,
            sea_layout=case.run.sea_layout, scalers=mesh_processor.scalers,
            field_groups=mesh_processor.field_groups,
            cache_dtype=cache_dtype)
        fields, rel, enc_rel = run(params, sparams, src[:, 0], ib,
                                   jnp.asarray(original),
                                   jnp.asarray(windows.tgt))
    else:  # prefix engine: chunked rollout programs + compiled tail
        preds = rollout(params, case.temporal, src[:, 0], ib, engine=engine)
        tail = make_eval_tail(
            latent_service.cfg, mesh_processor.partition,
            sea_layout=case.run.sea_layout, scalers=mesh_processor.scalers,
            field_groups=mesh_processor.field_groups)
        fields, rel, enc_rel = tail(sparams, preds, jnp.asarray(original),
                                    jnp.asarray(windows.tgt))
    per_time = np.asarray(rel).mean(axis=0)  # [T, F]
    decoded_rel_mse = float(per_time.mean())
    if save_artifacts and is_primary():
        _write_rollout_artifacts(case, mesh_processor, per_time, original,
                                 np.asarray(fields), epoch=epoch,
                                 plot_traj=plot_traj)
    return {"encoded_rel_mse": float(enc_rel),
            "decoded_rel_mse": decoded_rel_mse,
            "decoded_rel_mse_per_time": per_time}


def generate_trajectory(params, case: CaseConfig, windows,
                        latent_service: LatentService,
                        mesh_processor: MeshProcessor, *,
                        trajectory: int = 0,
                        horizon: Optional[int] = None,
                        spatial_params=None,
                        cache_dtype=jnp.float32) -> np.ndarray:
    """Arbitrary-horizon surrogate SIMULATION (no ground truth): roll the
    temporal model ``horizon`` steps from a test window's initial latent
    state and decode to physical fields [H, N, F] in one compiled program
    (rollout/e2e.make_generate). Beyond the window's length the ib
    conditioning holds its last value — the shipped cases condition on
    per-trajectory constants (e.g. Reynolds number). The reference has no
    generation surface at all; its rollout exists only inside evaluation
    against a loader's targets (train_utils.py:186-312)."""
    from sea_tpu.rollout.e2e import make_generate
    n = len(windows.src)
    if not 0 <= trajectory < n:
        raise ValueError(f"trajectory index {trajectory} out of range "
                         f"(the test split has {n} windows)")
    gen = make_generate(
        case.temporal, latent_service.cfg, mesh_processor.partition,
        sea_layout=case.run.sea_layout, scalers=mesh_processor.scalers,
        field_groups=mesh_processor.field_groups, cache_dtype=cache_dtype)
    sparams = spatial_params if spatial_params is not None \
        else latent_service.params
    x0 = jnp.asarray(windows.src[trajectory, 0])[None]  # [1, G, E]
    ib = np.asarray(windows.ib[trajectory])  # [T, ib_num]
    H = horizon if horizon is not None else ib.shape[0]
    ib_h = ib[:H] if H <= ib.shape[0] else np.concatenate(
        [ib, np.repeat(ib[-1:], H - ib.shape[0], axis=0)], axis=0)
    fields = gen(params, sparams, x0, jnp.asarray(ib_h)[None])
    return np.asarray(fields[0])  # [H, N, F]


def test_encoder_decoder(spatial_params, case: CaseConfig, tokens,
                         mesh_processor: MeshProcessor, *,
                         save_artifacts: bool = True,
                         spatial_cfg=None) -> Dict[str, float]:
    """tokens: [B, P, F, C] test snapshots (layout already applied).

    Mirror of test_encoder_decoder (train_utils.py:364-431).
    """
    cfg = spatial_cfg or case.spatial
    svc = LatentService(cfg, spatial_params,
                        batch_size=case.run.spatial_batch_size)
    z = svc.encode_dataset(tokens)
    recon = svc.decode_dataset(z)

    pre_unpatch_mse = float(np.mean((recon - tokens) ** 2))

    decoded = invert_sea_layout(recon, case.run.sea_layout)
    original = invert_sea_layout(np.asarray(tokens), case.run.sea_layout)
    decoded_flat = mesh_processor.inverse_scale_and_unpatch(decoded)
    original_flat = mesh_processor.inverse_scale_and_unpatch(original)

    post_unpatch_mse = float(np.mean((decoded_flat - original_flat) ** 2))
    rel = float(np.mean(np.asarray(M.relative_mse(
        jnp.asarray(decoded_flat), jnp.asarray(original_flat), axis=1))))

    if save_artifacts and is_primary():
        save_dir = case.run.save_dir
        os.makedirs(save_dir, exist_ok=True)
        rng = np.random.RandomState(case.spatial_split.random_seed)
        n = min(5, original_flat.shape[0])
        coords = mesh_processor.coordinates
        for idx in rng.choice(original_flat.shape[0], n, replace=False):
            if case.mesh.dimension == "2D":
                plot_all_fields_2d(original_flat, coords[:, 0], coords[:, 1],
                                   int(idx), filename=os.path.join(
                    save_dir, f"original_data_{idx}.png"))
                plot_all_fields_2d(decoded_flat, coords[:, 0], coords[:, 1],
                                   int(idx), filename=os.path.join(
                    save_dir, f"decoded_data_{idx}.png"))
            else:
                plot_all_fields_3d(original_flat, coords[:, 0], coords[:, 1],
                                   coords[:, 2], int(idx),
                                   filename=os.path.join(
                    save_dir, f"original_data_{idx}.png"))
                plot_all_fields_3d(decoded_flat, coords[:, 0], coords[:, 1],
                                   coords[:, 2], int(idx),
                                   filename=os.path.join(
                    save_dir, f"decoded_data_{idx}.png"))

    print(f"Test Loss before inverse scaling and unpatching: "
          f"{pre_unpatch_mse:.6f}")
    print(f"Test Loss after inverse scaling and unpatching: "
          f"{post_unpatch_mse:.6f}")
    print(f"Test Relative MSE after inverse scaling and unpatching: "
          f"{rel:.6f}")
    return {"mse_patched": pre_unpatch_mse, "mse_unpatched": post_unpatch_mse,
            "relative_mse": rel}
