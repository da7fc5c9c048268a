"""Stage-2 (temporal State-Exchange transformer) training driver.

Mirror of reference train/train_temporal.py: trajectory-level split
(:113-132), patchify all snapshots (:135-136), frozen-encoder latent pass
(:163-165) reshaped to [tr, T, G, P*D], window datasets (:49-75), AdamW +
teacher-forced next-step MSE (:252-262), periodic validation (:273-292),
full autoregressive eval every ``full_eval_interval`` epochs with its own
best-rollout checkpoint (:295-320), and a best-val-loss checkpoint
(:330-339).

TPU-native: jit train step with donated (params, opt_state); the full eval
uses the scan+KV-cache rollout engine.
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

from sea_tpu.configs.base import CaseConfig, TemporalModelConfig
from sea_tpu.data.datasets import (TemporalWindows, apply_sea_layout,
                                   batch_index_iterator,
                                   device_resident_budget,
                                   make_temporal_windows,
                                   padded_batch_index_iterator,
                                   padded_batch_iterator, split_indices)
from sea_tpu.data.io import load_case_data
from sea_tpu.data.latents import (LatentService,
                                  transform_latents_to_temporal)
from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.models.temporal import init_temporal, temporal_forward
from sea_tpu.parallel.multihost import is_primary
from sea_tpu.train import metrics as M
from sea_tpu.train.evaluate import full_autoregressive_evaluation
from sea_tpu.train.optim import make_optimizer
from sea_tpu.train.tracking import BaseErrorTracker, NoOpErrorTracker
from sea_tpu.utils.checkpoint import (checkpoint_path, load_params,
                                      multihost_checkpointing,
                                      save_checkpoint, snapshot_tree)


@dataclasses.dataclass
class TemporalData:
    train: TemporalWindows
    val: TemporalWindows
    test: TemporalWindows
    mesh_processor: MeshProcessor
    latent_service: LatentService
    # Raw per-trajectory arrays for epoch-wise window resampling when
    # dataset_time_shifting is on (reference reshuffles shift per item
    # per epoch, data_processors.py:436-439).
    train_raw: tuple = None  # (latents, fields, ib) for the train split


def process_data(case: CaseConfig, *, data=None,
                 spatial_params=None) -> TemporalData:
    """Load + split at trajectory level, patchify, run the frozen stage-1
    encoder, window. ``spatial_params`` must be provided (or loadable from
    the encoder_decoder checkpoint saved by train_spatial)."""
    if data is None:
        fields, coords, ib = load_case_data(case.run.field_data_path,
                                            case.run.coordinates_path,
                                            case.run.input_path)
    else:
        fields, coords, ib = data
    if ib is None:
        raise ValueError("temporal training requires input/boundary data")
    tr, T, N, F = fields.shape

    train_idx, val_idx, test_idx = split_indices(
        tr, case.temporal_split.train_fraction,
        case.temporal_split.val_fraction, case.temporal_split.random_seed)

    mp = MeshProcessor(case.mesh, case.spatial.field_groups, coords,
                       save_dir=case.run.save_dir)
    _, patched = mp.patchify_and_scale(
        fields.reshape(tr * T, N, F), fit_scalers=True,
        perform_initial_test=case.run.perform_initial_test)
    tokens = apply_sea_layout(patched, case.run.sea_layout)  # [tr*T,P,F,C]

    scfg = case.spatial.with_n_inp(mp.cells_per_patch)
    if spatial_params is None:
        from sea_tpu.models.spatial import init_spatial
        template = init_spatial(jax.random.PRNGKey(0), scfg)
        path = checkpoint_path(case.run.save_dir, "encoder_decoder",
                               case.run.case_name, case.run.run_name)
        spatial_params = load_params(path, template)
    svc = LatentService(scfg, spatial_params,
                        batch_size=case.run.spatial_batch_size)

    latents = svc.encode_dataset(tokens)  # [tr*T, P, G, D]
    temporal_tokens = transform_latents_to_temporal(
        latents, tr, T, mp.num_patches, scfg.num_groups)  # [tr,T,G,P*D]

    tcfg = case.temporal_train

    def windows(idx):
        return make_temporal_windows(temporal_tokens[idx], fields[idx],
                                     ib[idx], tcfg.dataset_src_len,
                                     tcfg.dataset_overlap)

    return TemporalData(train=windows(train_idx), val=windows(val_idx),
                        test=windows(test_idx), mesh_processor=mp,
                        latent_service=svc,
                        train_raw=(temporal_tokens[train_idx],
                                   fields[train_idx], ib[train_idx]))


def make_train_step(cfg: TemporalModelConfig, tx, *,
                    compute_dtype: str = "float32", log_norms: bool = True,
                    per_tensor: bool = False):
    """Numerics policy (utils.precision.train_cast): 'bfloat16' casts the
    big matmul weights inside the loss; 'bfloat16_mixed' additionally runs
    bf16 activations (f32 softmax/LN-stats/loss). AdamW keeps f32 master
    params either way. ``log_norms=False`` drops the per-step grad/param
    norm reductions (TrainConfig.log_norms; usually free — XLA fuses them
    into the AdamW update passes on the measured configs). ``per_tensor``
    (TrainConfig.log_per_tensor) adds one L2 norm per gradient/parameter
    tensor to the stats — the wandb.watch histogram equivalent
    (reference utils/train_utils.py:75-76)."""
    from sea_tpu.parallel.train_step import _norm_stats
    from sea_tpu.utils.precision import train_cast
    cast_p, cast_x = train_cast(compute_dtype)
    shadow = compute_dtype == "bfloat16_shadow"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, src, tgt, ib, rng):
        def loss_fn(p):
            s, i = cast_x(src, ib)
            out = temporal_forward(p, cfg, s, i, rng=rng,
                                   deterministic=False)
            return M.mse(out.astype(jnp.float32), tgt)
        if shadow:
            # Differentiate w.r.t. the persistent bf16 copy in the
            # optimizer state (train/optim.with_bf16_shadow): no per-step
            # f32 master-weight cast, bf16 gradients (widened in-register
            # inside the fused AdamW update).
            loss, grads = jax.value_and_grad(loss_fn)(opt_state.shadow)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(cast_p(p)))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        stats = {"loss": loss,
                 **_norm_stats(grads, params, log_norms, per_tensor)}
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats
    return step


def make_eval_step(cfg: TemporalModelConfig):
    """Batches arrive padded to a fixed size with ``n_valid`` real rows
    (padded_batch_iterator) — one jit compilation per eval loop."""
    @jax.jit
    def step(params, src, tgt, ib, n_valid):
        out = temporal_forward(params, cfg, src, ib)
        return M.masked_mse(out, tgt, n_valid)
    return step


def train(case: CaseConfig,
          error_tracker: Optional[BaseErrorTracker] = None, *,
          data=None, spatial_params=None, seed: int = 0,
          epochs: Optional[int] = None,
          init_params=None, init_opt_state=None,
          save_artifacts: bool = True,
          mesh=None, seq_mesh=None, pipe_mesh=None,
          pipe_microbatches: int = 0,
          profile_dir: Optional[str] = None) -> Tuple[Any, TemporalData]:
    """``mesh``: optional jax.sharding.Mesh — runs the whole loop
    data-parallel (batches sharded over the 'data' axis, attention weights
    over 'model'); same numerics as single-device (tests/test_parallel.py).
    When batch size isn't divisible by the mesh's data axis it is rounded
    UP to the next multiple (each device keeps >= 1 windows per step; the
    reference recipe's global batch is a lower bound under DP scaling).

    ``seq_mesh``: optional Mesh with a 'seq' axis — sequence-parallel
    training: the TIME axis of every batch shards across the ring and all
    attention runs as ring attention (in-ring counter-hash dropout included,
    so the shipped recipes train unmodified). Mutually exclusive with
    ``mesh``; requires dataset_src_len divisible by the ring size.

    ``pipe_mesh``: optional ('data', 'pipe') Mesh — pipeline-parallel
    training (parallel/pipeline.py): the layer stack shards over 'pipe'
    (GPipe microbatching, ``pipe_microbatches`` per step, default = stage
    count), the batch over 'data'. Requires num_layers divisible by the
    pipe size; deep-stack configs only. PP checkpoints store params only
    (optimizer state stays in the stacked mesh layout; resume restores
    params with a fresh optimizer).

    ``profile_dir``: capture a jax.profiler device trace (TensorBoard/
    Perfetto) of ONE steady-state epoch — epoch 2, past the compile —
    into this directory (CLI: --profile)."""
    if sum(m is not None for m in (mesh, seq_mesh, pipe_mesh)) > 1:
        raise ValueError("pass at most one of mesh (DP x TP), seq_mesh "
                         "(sequence-parallel), pipe_mesh (pipeline)")
    tracker = error_tracker or NoOpErrorTracker()
    tcfg = case.temporal_train
    td = process_data(case, data=data, spatial_params=spatial_params)
    cfg = case.temporal
    # Auto-detect time-constant conditioning from the ACTUAL host data
    # (never guessed): both shipped datasets condition on per-trajectory
    # constants (Reynolds number), so the ib-only activations (AdaLN
    # cond nets, ib embedding) can compute on [B, 1] rows and broadcast
    # over T — bit-identical numerics, ~T x fewer cond-GEMM rows
    # (TemporalModelConfig.ib_time_constant; equality-tested).
    if not cfg.ib_time_constant and cfg.ln_type == "adaln":
        import dataclasses

        from sea_tpu.data.datasets import ib_is_time_constant
        if ib_is_time_constant(td.train, td.val, td.test):
            cfg = dataclasses.replace(cfg, ib_time_constant=True)
            print("ib constant over time in every split: conditioning "
                  "computed per trajectory and broadcast "
                  "(ib_time_constant)")

    rng = jax.random.PRNGKey(seed)
    rng, init_key = jax.random.split(rng)
    params = init_params if init_params is not None \
        else init_temporal(init_key, cfg)
    tx = make_optimizer(tcfg)
    # Reference train_temporal.py:243: register the model with the tracker
    # (wandb.watch equivalent, tracking.WandbErrorTracker.log_model).
    tracker.log_model(params, "MSE", tcfg.optimizer)
    batch_size = tcfg.batch_size
    if mesh is not None:
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
        if batch_size != tcfg.batch_size:
            print(f"note: batch size {tcfg.batch_size} -> {batch_size} "
                  f"(next multiple of the mesh data axis {n_data})")
        from sea_tpu.parallel.train_step import \
            make_sharded_temporal_train_step
        train_step, params, opt_state, place_batch = \
            make_sharded_temporal_train_step(
                mesh, cfg, tx, params, compute_dtype=tcfg.compute_dtype,
                init_opt_state=init_opt_state, log_norms=tcfg.log_norms,
                per_tensor=tcfg.log_per_tensor)
    elif pipe_mesh is not None:
        S = pipe_mesh.shape["pipe"]
        if cfg.num_layers % S:
            raise ValueError(
                f"pipeline-parallel training needs num_layers "
                f"({cfg.num_layers}) divisible by the pipe size ({S}); "
                "the shipped 1-layer presets should train DP/TP instead")
        mb = pipe_microbatches or S
        q = mb * pipe_mesh.shape["data"]
        batch_size = -(-batch_size // q) * q
        if batch_size != tcfg.batch_size:
            print(f"note: batch size {tcfg.batch_size} -> {batch_size} "
                  f"(next multiple of microbatches x data axis = {q})")
        if init_opt_state is not None:
            print("note: pipeline-parallel resume restores params only "
                  "(optimizer restarts fresh — PP checkpoints don't carry "
                  "stacked-layout moments)")
        from sea_tpu.parallel.pipeline import make_pipeline_train_step
        train_step, params, opt_state, place_batch = \
            make_pipeline_train_step(pipe_mesh, cfg, tx, params,
                                     n_microbatches=mb,
                                     compute_dtype=tcfg.compute_dtype,
                                     log_norms=tcfg.log_norms,
                                     per_tensor=tcfg.log_per_tensor)
    elif seq_mesh is not None:
        ring = seq_mesh.shape["seq"]
        if tcfg.dataset_src_len % ring != 0:
            raise ValueError(
                f"sequence-parallel training needs dataset_src_len "
                f"({tcfg.dataset_src_len}) divisible by the ring size "
                f"({ring}); adjust --seq_parallel or the window length")
        from sea_tpu.parallel.train_step import make_seq_parallel_train_step
        train_step, params, opt_state, place_batch = \
            make_seq_parallel_train_step(seq_mesh, cfg, tx, params,
                                         init_opt_state=init_opt_state,
                                         compute_dtype=tcfg.compute_dtype,
                                         log_norms=tcfg.log_norms,
                                         per_tensor=tcfg.log_per_tensor)
    else:
        opt_state = (jax.tree.map(jnp.asarray, init_opt_state)
                     if init_opt_state is not None else tx.init(params))
        train_step = make_train_step(cfg, tx,
                                     compute_dtype=tcfg.compute_dtype,
                                     log_norms=tcfg.log_norms,
                                     per_tensor=tcfg.log_per_tensor)
        place_batch = None
    eval_step = make_eval_step(cfg)
    # Pipeline-parallel params live in the stacked layout on the mesh;
    # everything that leaves the train step (eval, checkpoints, the return
    # value) uses the standard list-of-blocks layout.
    if pipe_mesh is not None:
        from sea_tpu.parallel.pipeline import unstack_pipeline_params
        def to_ckpt(p):
            return unstack_pipeline_params(p, cfg.num_layers)
        _eval_raw = eval_step
        def eval_step(p, *a):
            return _eval_raw(to_ckpt(p), *a)
    else:
        def to_ckpt(p):
            return p

    n_epochs = epochs if epochs is not None else tcfg.epoch_num
    best_val = float("inf")
    best_rollout = float("inf")
    # Copy before the first train step: donate_argnums invalidates
    # the initial buffers, and best_params must survive a run where
    # validation never improves.
    best_params = snapshot_tree(to_ckpt(params))
    start = time.time()

    # Device-resident train split (TrainConfig.device_resident_data):
    # upload src/tgt/ib ONCE and gather shuffled minibatches on-device —
    # identical batch order/numerics to host batching (the index stream
    # is shared, data/datasets.batch_index_iterator), but one
    # host->device transfer per RUN instead of one per step. Single-
    # device path only (sharded paths place per-device shards) and only
    # while windows are static (time_shifting regenerates them on host).
    resident = val_resident = None
    if (getattr(tcfg, "device_resident_data", False)
            and place_batch is None and not tcfg.dataset_time_shifting):
        split_bytes = sum(np.asarray(a).nbytes for a in
                          (td.train.src, td.train.tgt, td.train.ib,
                           td.val.src, td.val.tgt, td.val.ib))
        if split_bytes <= device_resident_budget(
                getattr(tcfg, "device_resident_max_bytes", 4 << 30)):
            resident = (jnp.asarray(td.train.src),
                        jnp.asarray(td.train.tgt),
                        jnp.asarray(td.train.ib))
            val_resident = (jnp.asarray(td.val.src),
                            jnp.asarray(td.val.tgt),
                            jnp.asarray(td.val.ib))

    @jax.jit
    def _gather(arrays, idx):
        return tuple(jnp.take(a, idx, axis=0) for a in arrays)

    for epoch in range(1, n_epochs + 1):
        train_windows = td.train
        if tcfg.dataset_time_shifting and td.train_raw is not None:
            shift_rng = np.random.RandomState(
                (case.temporal_split.random_seed * 7919 + epoch) % (2**31))
            train_windows = make_temporal_windows(
                *td.train_raw, tcfg.dataset_src_len, tcfg.dataset_overlap,
                time_shift_rng=shift_rng)
        # On-device stat accumulation: the loop stays fully async (no
        # per-batch device->host fence); one readback per epoch.
        acc = M.StatsAccumulator()
        last_stats = None
        profiling = profile_dir and epoch == min(2, n_epochs)
        if profiling:
            jax.profiler.start_trace(profile_dir)
        # One loop for both data paths (same index stream either way);
        # only batch construction differs. The host path slices just
        # src/tgt/ib — tgt_original (the largest array in the split) is
        # not a train-step input.
        for sel in batch_index_iterator(
                len(train_windows.src), batch_size, shuffle=True,
                seed=case.temporal_split.random_seed, epoch=epoch,
                drop_remainder=True):
            rng, step_key = jax.random.split(rng)
            if resident is not None:
                src, tgt, ib = _gather(resident, jnp.asarray(sel))
            else:
                src, tgt, ib = (train_windows.src[sel],
                                train_windows.tgt[sel],
                                train_windows.ib[sel])
                if place_batch is not None:
                    src, tgt, ib = place_batch(src, tgt, ib)
                else:
                    src, tgt, ib = (jnp.asarray(src), jnp.asarray(tgt),
                                    jnp.asarray(ib))
            params, opt_state, stats = train_step(
                params, opt_state, src, tgt, ib, step_key)
            acc.add(stats)
            last_stats = stats
        if acc.count == 0:
            raise ValueError(
                f"train split has fewer than one batch of {batch_size} "
                f"windows" + (" (batch was rounded up for the device mesh; "
                              "use a smaller --mesh data axis or more data)"
                              if mesh is not None else ""))
        agg = acc.means()  # single device->host readback fences the epoch
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace (epoch {epoch}) written to {profile_dir}")
        train_loss = agg["loss"]
        tracker.record_error("train", epoch, {
            "Loss": train_loss, "Grad_Norm": agg["grad_norm"],
            "Param_Norm": agg["param_norm"]})
        if last_stats is not None and "tensors" in last_stats:
            # Per-tensor observability (TrainConfig.log_per_tensor): one
            # norm per grad/param tensor from the epoch's last batch.
            tracker.record_error("tensors", epoch, {
                k: float(v) for k, v in last_stats["tensors"].items()})

        if epoch % tcfg.validation_interval == 0 or epoch == n_epochs:
            vacc = M.StatsAccumulator()
            if val_resident is not None:
                for idx, n_valid in padded_batch_index_iterator(
                        len(td.val.src), tcfg.eval_batch_size):
                    src, tgt, ib = _gather(val_resident, jnp.asarray(idx))
                    vacc.add(eval_step(params, src, tgt, ib,
                                       jnp.asarray(n_valid)))
            else:
                for (src, tgt, ib), n_valid in padded_batch_iterator(
                        [td.val.src, td.val.tgt, td.val.ib],
                        tcfg.eval_batch_size):
                    vacc.add(eval_step(params, jnp.asarray(src),
                                       jnp.asarray(tgt), jnp.asarray(ib),
                                       jnp.asarray(n_valid)))
            val_loss = vacc.means().get("loss", 0.0)
            val_metrics = {"Loss": val_loss}

            # Full autoregressive eval cadence (train_temporal.py:295-320).
            if epoch % tcfg.full_eval_interval == 0:
                results = full_autoregressive_evaluation(
                    to_ckpt(params), case, td.val, td.latent_service,
                    td.mesh_processor, epoch=epoch,
                    save_artifacts=save_artifacts)
                val_metrics["Full_Encoded_Rel_MSE"] = \
                    results["encoded_rel_mse"]
                val_metrics["Full_Decoded_Rel_MSE"] = \
                    results["decoded_rel_mse"]
                if results["decoded_rel_mse"] < best_rollout:
                    best_rollout = results["decoded_rel_mse"]
                    if is_primary() or multihost_checkpointing():
                        save_checkpoint(
                            case.run.save_dir, "temporal_Checkpoint",
                            case.run.case_name, case.run.run_name,
                            snapshot_tree(to_ckpt(params)),
                            meta={"epoch": epoch,
                                  "decoded_rel_mse": best_rollout},
                            use_orbax=multihost_checkpointing())
                        print("--- Checkpoint Model Saved ---")

            tracker.record_error("val", epoch, val_metrics)
            print(f"Epoch {epoch}/{n_epochs} train Loss {train_loss:.8f} | "
                  f"val Loss {val_loss:.8f}")

            if val_loss < best_val:
                best_val = val_loss
                best_params = snapshot_tree(to_ckpt(params))
                # Orbax saves are collective: on a pod EVERY process
                # enters (each persists its addressable shards); the npz
                # path writes from process 0 only.
                if is_primary() or multihost_checkpointing():
                    save_checkpoint(
                        case.run.save_dir, "temporal",
                        case.run.case_name, case.run.run_name, best_params,
                        # PP moments live in the stacked mesh layout;
                        # checkpoints stay driver-layout (params only).
                        opt_state=(None if pipe_mesh is not None
                                   else snapshot_tree(opt_state)),
                        meta={"epoch": epoch, "val_loss": best_val},
                        use_orbax=multihost_checkpointing())
                    print("--- New Best Model Saved ---")

    print(f"Total training time: {time.time() - start:.2f} seconds")
    tracker.finish()
    return best_params, td
