"""Stage-1 (spatial autoencoder) training driver.

Mirror of reference train/train_encoder.py: load data, snapshot-level
shuffled split (:84-105), MeshProcessor patchify (:107-109), SEA layout
(:121-132), AdamW + MSE (or Vloss when variational), epoch loop with R^2
tracking (:226), periodic validation (:247-289), best-val-recon checkpoint
(:299-308), wall-clock total (:310-312).

TPU-native: the train step is one jit-compiled program with donated
(params, opt_state); data-parallel over a device mesh via NamedSharding
(batch sharded on the 'data' axis, params replicated — XLA inserts the
gradient all-reduce over ICI).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sea_tpu.configs.base import CaseConfig, SpatialModelConfig
from sea_tpu.data.datasets import apply_sea_layout, \
    device_resident_budget, padded_batch_iterator, split_indices
from sea_tpu.data.io import load_case_data
from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.models.spatial import init_spatial, spatial_forward
from sea_tpu.parallel.multihost import is_primary
from sea_tpu.train import metrics as M
from sea_tpu.train.optim import make_optimizer
from sea_tpu.train.tracking import BaseErrorTracker, NoOpErrorTracker
from sea_tpu.utils.checkpoint import (multihost_checkpointing,
                                      save_checkpoint, snapshot_tree)


@dataclasses.dataclass
class SpatialData:
    train: np.ndarray  # [B, P, F, C]
    val: np.ndarray
    test: np.ndarray
    mesh_processor: MeshProcessor
    spatial_cfg: SpatialModelConfig  # with n_inp derived


def process_data(case: CaseConfig, *, data=None) -> SpatialData:
    """data: optional (fields [tr,T,N,F], coords, ib) tuple to bypass file
    loading (tests / synthetic runs)."""
    if data is None:
        fields, coords, _ = load_case_data(case.run.field_data_path,
                                           case.run.coordinates_path,
                                           case.run.input_path)
    else:
        fields, coords, _ = data
    tr, T, N, F = fields.shape
    snapshots = fields.reshape(tr * T, N, F)

    train_idx, val_idx, test_idx = split_indices(
        tr * T, case.spatial_split.train_fraction,
        case.spatial_split.val_fraction, case.spatial_split.random_seed)

    mp = MeshProcessor(case.mesh, case.spatial.field_groups, coords,
                       save_dir=case.run.save_dir)
    _, patched = mp.patchify_and_scale(
        snapshots, fit_scalers=True,
        perform_initial_test=case.run.perform_initial_test)
    tokens = apply_sea_layout(patched, case.run.sea_layout)  # [B,P,F,C]

    scfg = case.spatial.with_n_inp(mp.cells_per_patch)
    return SpatialData(train=tokens[train_idx], val=tokens[val_idx],
                       test=tokens[test_idx], mesh_processor=mp,
                       spatial_cfg=scfg)


def make_train_step(cfg: SpatialModelConfig, tx, *, kl_weight_min=0.0,
                    kl_weight_max=0.0, total_steps: int = 1,
                    compute_dtype: str = "float32",
                    log_norms: bool = True, per_tensor: bool = False):
    from sea_tpu.utils.precision import train_cast
    cast_p, cast_x = train_cast(compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, iteration):
        def loss_fn(p):
            p = cast_p(p)
            (x,) = cast_x(batch)
            if cfg.variational:
                recon, mu, logvar = spatial_forward(p, cfg, x, rng=rng,
                                                    deterministic=False)
                # Loss terms (incl. KL's exp(logvar)) in f32 vs the f32
                # batch, whatever the forward's compute dtype.
                total, recon_loss, kl = M.vloss(
                    batch, recon.astype(jnp.float32),
                    mu.astype(jnp.float32), logvar.astype(jnp.float32),
                    kl_weight_min=kl_weight_min,
                    kl_weight_max=kl_weight_max, iteration=iteration,
                    total_steps=total_steps)
                return total, (recon, recon_loss, kl)
            recon = spatial_forward(p, cfg, x, rng=rng,
                                    deterministic=False)
            loss = M.mse(recon.astype(jnp.float32), batch)
            return loss, (recon, loss, jnp.zeros(()))
        (loss, (recon, recon_loss, kl)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        # Observability (wandb.watch equivalent, train_utils.py:75-76):
        # global grad/param norms computed inside the jitted step — one
        # scalar readback, no per-tensor host traffic.
        from sea_tpu.parallel.train_step import _norm_stats
        stats = {"loss": loss, "recon_loss": recon_loss, "kl_loss": kl,
                 **_norm_stats(grads, params, log_norms, per_tensor)}
        params = optax.apply_updates(params, updates)
        stats["r2"] = M.r2(recon, batch)
        return params, opt_state, stats
    return step


def make_eval_step(cfg: SpatialModelConfig, *, kl_weight_min=0.0,
                   kl_weight_max=0.0, total_steps: int = 1):
    """Eval batches arrive padded to a fixed size with ``n_valid`` real
    rows (data/datasets.padded_batch_iterator): the masked metrics ignore
    the padding, and jit compiles exactly once per eval loop."""
    @jax.jit
    def step(params, batch, n_valid, iteration):
        if cfg.variational:
            recon, mu, logvar = spatial_forward(params, cfg, batch)
            kl_weight = M.kl_anneal_weight(kl_weight_min, kl_weight_max,
                                           iteration, total_steps)
            recon_loss = M.masked_mse(recon, batch, n_valid)
            kl = M.masked_kl(mu, logvar, n_valid)
            total = recon_loss + kl_weight * kl
        else:
            recon = spatial_forward(params, cfg, batch)
            total = recon_loss = M.masked_mse(recon, batch, n_valid)
            kl = jnp.zeros(())
        return {"loss": total, "recon_loss": recon_loss, "kl_loss": kl,
                "r2": M.masked_r2(recon, batch, n_valid)}
    return step


def train(case: CaseConfig,
          error_tracker: Optional[BaseErrorTracker] = None, *,
          data=None, seed: int = 0,
          epochs: Optional[int] = None,
          init_params=None, init_opt_state=None, mesh=None,
          precomputed: Optional[SpatialData] = None,
          profile_dir: Optional[str] = None
          ) -> Tuple[Any, SpatialData]:
    """Returns (best params, data). ``epochs`` overrides the config (for
    quick end-to-end slices); ``init_params`` resumes from a checkpoint
    (reference load_pretrained, train_encoder.py:162-165); ``mesh`` runs
    the loop data-parallel over a device mesh (variational loss not
    supported on the sharded path yet); ``precomputed`` skips
    process_data when the caller already ran it (resume paths);
    ``profile_dir`` captures a jax.profiler device trace of one
    steady-state epoch (epoch 2, past the compile — CLI: --profile)."""
    tracker = error_tracker or NoOpErrorTracker()
    tcfg = case.spatial_train
    sd = precomputed if precomputed is not None else process_data(case,
                                                                  data=data)
    cfg = sd.spatial_cfg

    rng = jax.random.PRNGKey(seed)
    rng, init_key = jax.random.split(rng)
    params = init_params if init_params is not None \
        else init_spatial(init_key, cfg)
    tx = make_optimizer(tcfg)
    # Reference train_encoder.py:196: register the model with the tracker
    # (wandb.watch equivalent — static description + per-tensor norm
    # stream; see tracking.WandbErrorTracker.log_model).
    tracker.log_model(params, "Vloss" if cfg.variational else "MSE",
                      tcfg.optimizer)

    # KL-anneal horizon follows the *actual* epoch count (``epochs``
    # overrides the config), matching total_steps semantics at
    # train_encoder.py:171.
    n_epochs = epochs if epochs is not None else tcfg.epoch_num
    place_batch = None
    batch_size = tcfg.batch_size
    if mesh is not None:
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
        if batch_size != tcfg.batch_size:
            print(f"note: batch size {tcfg.batch_size} -> {batch_size} "
                  f"(next multiple of the mesh data axis {n_data})")
    # Anneal horizon counts the loop's ACTUAL optimizer steps — the
    # mesh-rounded batch size and drop_remainder batching both shrink
    # steps/epoch, and a horizon computed from the configured batch size
    # would leave the KL weight short of kl_weight_max at the end.
    total_steps = max(1, n_epochs * max(1, len(sd.train) // batch_size))
    if mesh is not None:
        from sea_tpu.parallel.train_step import \
            make_sharded_spatial_train_step
        train_step, params, opt_state, place_batch = \
            make_sharded_spatial_train_step(
                mesh, cfg, tx, params, compute_dtype=tcfg.compute_dtype,
                kl_weight_min=tcfg.kl_weight_min,
                kl_weight_max=tcfg.kl_weight_max, total_steps=total_steps,
                init_opt_state=init_opt_state, log_norms=tcfg.log_norms,
                per_tensor=tcfg.log_per_tensor)
    else:
        opt_state = (jax.tree.map(jnp.asarray, init_opt_state)
                     if init_opt_state is not None else tx.init(params))
        train_step = make_train_step(cfg, tx,
                                     kl_weight_min=tcfg.kl_weight_min,
                                     kl_weight_max=tcfg.kl_weight_max,
                                     total_steps=total_steps,
                                     compute_dtype=tcfg.compute_dtype,
                                     log_norms=tcfg.log_norms,
                                     per_tensor=tcfg.log_per_tensor)
    eval_step = make_eval_step(cfg, kl_weight_min=tcfg.kl_weight_min,
                               kl_weight_max=tcfg.kl_weight_max,
                               total_steps=total_steps)

    best_val = float("inf")
    # Copy before the first train step: donate_argnums invalidates
    # the initial buffers, and best_params must survive a run where
    # validation never improves.
    best_params = snapshot_tree(params)
    iteration = 0
    start = time.time()

    # Device-resident train split (TrainConfig.device_resident_data):
    # upload once, gather shuffled minibatches on-device — identical
    # batch order/numerics to host batching (shared index stream), one
    # host->device transfer per run instead of per step. Single-device
    # path only; see train_temporal for the same pattern.
    resident = val_resident = None
    if (getattr(tcfg, "device_resident_data", False)
            and place_batch is None
            and sd.train.nbytes + sd.val.nbytes
            <= device_resident_budget(
                getattr(tcfg, "device_resident_max_bytes", 4 << 30))):
        resident = jnp.asarray(sd.train)
        val_resident = jnp.asarray(sd.val)

    @jax.jit
    def _gather(data, idx):
        return jnp.take(data, idx, axis=0)

    from sea_tpu.data.datasets import batch_index_iterator

    for epoch in range(1, n_epochs + 1):
        # On-device stat accumulation: the loop stays fully async (no
        # per-batch device->host fence); one readback per epoch.
        acc = M.StatsAccumulator()
        last_stats = None
        profiling = profile_dir and epoch == min(2, n_epochs)
        if profiling:
            jax.profiler.start_trace(profile_dir)
        for sel in batch_index_iterator(len(sd.train), batch_size,
                                        shuffle=True,
                                        seed=case.spatial_split.random_seed,
                                        epoch=epoch, drop_remainder=True):
            rng, step_key = jax.random.split(rng)
            if resident is not None:
                batch = _gather(resident, jnp.asarray(sel))
            else:
                batch = (place_batch(sd.train[sel])
                         if place_batch is not None
                         else jnp.asarray(sd.train[sel]))
            params, opt_state, stats = train_step(
                params, opt_state, batch, step_key,
                jnp.asarray(iteration))
            acc.add(stats)
            iteration += 1
            last_stats = stats
        if acc.count == 0:
            raise ValueError(
                f"train split has fewer than one batch of {batch_size} "
                f"snapshots" + (" (batch was rounded up for the device "
                                "mesh; use a smaller --mesh data axis)"
                                if mesh is not None else ""))
        agg = acc.means()  # single device->host readback fences the epoch
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace (epoch {epoch}) written to {profile_dir}")
        train_metrics = {"Loss": agg["loss"],
                         "Recon_Loss": agg["recon_loss"],
                         "R2": agg["r2"],
                         "Grad_Norm": agg["grad_norm"],
                         "Param_Norm": agg["param_norm"]}
        if cfg.variational:
            train_metrics["KL_Loss"] = agg["kl_loss"]
        tracker.record_error("train", epoch, train_metrics)
        if last_stats is not None and "tensors" in last_stats:
            # Per-tensor observability (TrainConfig.log_per_tensor): one
            # norm per grad/param tensor from the epoch's last batch.
            tracker.record_error("tensors", epoch, {
                k: float(v) for k, v in last_stats["tensors"].items()})

        if epoch % tcfg.validation_interval == 0 or epoch == n_epochs:
            vacc = M.StatsAccumulator()
            if val_resident is not None:
                from sea_tpu.data.datasets import padded_batch_index_iterator
                for idx, n_valid in padded_batch_index_iterator(
                        len(sd.val), tcfg.batch_size):
                    vacc.add(eval_step(params,
                                       _gather(val_resident,
                                               jnp.asarray(idx)),
                                       jnp.asarray(n_valid),
                                       jnp.asarray(iteration)))
            else:
                for (batch,), n_valid in padded_batch_iterator(
                        [sd.val], tcfg.batch_size):
                    vacc.add(eval_step(params, jnp.asarray(batch),
                                       jnp.asarray(n_valid),
                                       jnp.asarray(iteration)))
            vagg = vacc.means()
            val_metrics = {"Loss": vagg["loss"],
                           "Recon_Loss": vagg["recon_loss"],
                           "R2": vagg["r2"]}
            if cfg.variational:
                val_metrics["KL_Loss"] = vagg["kl_loss"]
            tracker.record_error("val", epoch, val_metrics)
            print(f"Epoch {epoch}/{n_epochs} train Loss "
                  f"{train_metrics['Loss']:.8f} R2 {train_metrics['R2']:.6f}"
                  f" | val Loss {val_metrics['Loss']:.8f}")

            # Best-val-recon checkpoint (train_encoder.py:299-308).
            # Process 0 writes; params are replicated so it holds the
            # full state (multi-host hygiene, parallel/multihost.py).
            if val_metrics["Recon_Loss"] < best_val:
                best_val = val_metrics["Recon_Loss"]
                best_params = snapshot_tree(params)
                # Orbax saves are collective on a pod (see train_temporal).
                if is_primary() or multihost_checkpointing():
                    save_checkpoint(
                        case.run.save_dir, "encoder_decoder",
                        case.run.case_name, case.run.run_name, best_params,
                        opt_state=snapshot_tree(opt_state),
                        meta={"epoch": epoch, "val_loss": best_val},
                        use_orbax=multihost_checkpointing())
                    print("--- New Best Model Saved ---")

    print(f"Total training time: {time.time() - start:.2f} seconds")
    tracker.finish()
    return best_params, sd
