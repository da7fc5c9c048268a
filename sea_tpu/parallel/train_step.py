"""Sharded (multi-chip) training and rollout steps.

Data-parallel + tensor-parallel SPMD over a jax.sharding.Mesh:
- batch/window axes sharded over 'data' (gradient all-reduce over ICI,
  inserted by GSPMD under jit),
- attention weights optionally sharded over 'model' (parallel/mesh.py).

Style: "computation follows data" — parameters and optimizer state are
placed once with explicit NamedShardings (optimizer moments inherit the
param shardings through a jitted tx.init), batches are placed with the
'data' spec, and the jitted step propagates shardings; GSPMD inserts the
psum/all-gather collectives. The reference has no distributed execution at
all (SURVEY §2.10) — this is the TPU-native scaling path, not a port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from sea_tpu.configs.base import SpatialModelConfig, TemporalModelConfig
from sea_tpu.models.spatial import spatial_forward
from sea_tpu.models.temporal import temporal_forward
from sea_tpu.ops.dispatch import attention_kernel_sharding
from sea_tpu.parallel.mesh import (shard_batch, spatial_param_shardings,
                                   temporal_param_shardings)
from sea_tpu.rollout.engine import rollout_scan
from sea_tpu.train import metrics as M



def _norm_stats(grads, params, log_norms: bool, per_tensor: bool = False):
    """Per-step observability norms (TrainConfig.log_norms): two extra
    full passes over the param pytree when on, zeros when off.
    ``per_tensor`` (TrainConfig.log_per_tensor) additionally emits one L2
    norm per tensor — the wandb.watch gradient/parameter histogram
    equivalent (reference utils/train_utils.py:75-76), see
    metrics.per_tensor_norms."""
    if not log_norms:
        return {"grad_norm": jnp.zeros(()), "param_norm": jnp.zeros(())}
    # bf16 grads (compute_dtype='bfloat16_shadow') would accumulate the
    # squared sum in bf16 — upcast leaf-wise; XLA fuses the cast into the
    # reduction, so the f32 modes are unchanged and the cast is free.
    grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
    stats = {"grad_norm": optax.global_norm(grads),
             "param_norm": optax.global_norm(params)}
    if per_tensor:
        stats["tensors"] = {**M.per_tensor_norms(grads, "Grad_Norm/"),
                            **M.per_tensor_norms(params, "Param_Norm/")}
    return stats

def _place_state(mesh, params, pspec, tx, init_opt_state=None):
    """Place params per the TP spec and build optimizer state *under jit*
    with unspecified out_shardings so moments inherit the param shardings.
    ``init_opt_state`` (checkpoint resume): restored host values are placed
    onto the shardings GSPMD chose for a fresh init — Adam moments continue
    on the mesh exactly where the run left off."""
    placed_params = jax.device_put(params, pspec)
    placed_opt = jax.jit(tx.init)(placed_params)
    if init_opt_state is not None:
        def target(fresh):
            # Leaves that don't depend on any input (Adam's step count)
            # come out of jit(tx.init) with a maximal single-device
            # sharding; jit tolerates those as ARGUMENTS only when they
            # were produced by jit itself. An explicitly device_put copy
            # must be replicated over the mesh instead, or the resumed
            # step rejects the mixed device sets.
            s = fresh.sharding
            if isinstance(s, NamedSharding):
                return s
            return NamedSharding(mesh, PartitionSpec())
        placed_opt = jax.tree.map(
            lambda restored, fresh: jax.device_put(
                jnp.asarray(restored), target(fresh)),
            init_opt_state, placed_opt)
    return placed_params, placed_opt


def make_sharded_temporal_train_step(mesh: Mesh, cfg: TemporalModelConfig,
                                     tx, params, *,
                                     compute_dtype: str = "float32",
                                     init_opt_state=None,
                                     log_norms: bool = True,
                                     per_tensor: bool = False):
    pspec = temporal_param_shardings(mesh, params)
    placed_params, placed_opt = _place_state(mesh, params, pspec, tx,
                                             init_opt_state)
    from sea_tpu.utils.precision import train_cast
    cast_p, cast_x = train_cast(compute_dtype)
    shadow = compute_dtype == "bfloat16_shadow"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, src, tgt, ib, rng):
        def loss_fn(p):
            s, i = cast_x(src, ib)
            # Multi-device trace: Pallas attention dispatches through
            # shard_map over (data, model) — the single-chip kernels run
            # on local (batch, head) shards with zero collectives and a
            # global-position dropout hash (parallel/kernel_shard.py).
            with attention_kernel_sharding(mesh if mesh.size > 1 else None):
                out = temporal_forward(p, cfg, s, i, rng=rng,
                                       deterministic=False)
            return M.mse(out.astype(jnp.float32), tgt)
        if shadow:
            # Forward/backward on the persistent bf16 copy in the
            # optimizer state (train/optim.with_bf16_shadow); the shadow
            # inherits the params' TP shardings through jit(tx.init).
            loss, grads = jax.value_and_grad(loss_fn)(opt_state.shadow)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(cast_p(p)))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        stats = {"loss": loss,
                 **_norm_stats(grads, params, log_norms, per_tensor)}
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats

    def place_batch(src, tgt, ib):
        return (shard_batch(mesh, jnp.asarray(src)),
                shard_batch(mesh, jnp.asarray(tgt)),
                shard_batch(mesh, jnp.asarray(ib)))

    return step, placed_params, placed_opt, place_batch


def make_sharded_spatial_train_step(mesh: Mesh, cfg: SpatialModelConfig,
                                    tx, params, *,
                                    compute_dtype: str = "float32",
                                    kl_weight_min: float = 0.0,
                                    kl_weight_max: float = 0.0,
                                    total_steps: int = 1,
                                    init_opt_state=None,
                                    log_norms: bool = True,
                                    per_tensor: bool = False):
    """Signature-compatible with train_spatial.make_train_step: the jitted
    step takes (params, opt_state, batch, rng, iteration) and returns the
    same stats dict, so the training loop is identical on both paths.
    Variational configs run the full Vloss (annealed KL) under SPMD — the
    KL sum and the reparameterization noise are batch-local, so GSPMD only
    inserts the usual gradient all-reduce."""
    pspec = spatial_param_shardings(mesh, params)
    placed_params, placed_opt = _place_state(mesh, params, pspec, tx,
                                             init_opt_state)
    from sea_tpu.utils.precision import train_cast
    cast_p, cast_x = train_cast(compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, iteration):
        def loss_fn(p):
            p = cast_p(p)
            (x,) = cast_x(batch)
            # Shipped spatial shapes never reach flash_supported's T
            # floor; the sharding context is a no-op until they do.
            with attention_kernel_sharding(mesh if mesh.size > 1 else None):
                if cfg.variational:
                    recon, mu, logvar = spatial_forward(
                        p, cfg, x, rng=rng, deterministic=False)
                else:
                    recon = spatial_forward(p, cfg, x, rng=rng,
                                            deterministic=False)
            if cfg.variational:
                total, recon_loss, kl = M.vloss(
                    batch, recon.astype(jnp.float32),
                    mu.astype(jnp.float32), logvar.astype(jnp.float32),
                    kl_weight_min=kl_weight_min,
                    kl_weight_max=kl_weight_max, iteration=iteration,
                    total_steps=total_steps)
                return total, (recon, recon_loss, kl)
            loss = M.mse(recon.astype(jnp.float32), batch)
            return loss, (recon, loss, jnp.zeros(()))
        (loss, (recon, recon_loss, kl)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        stats = {"loss": loss, "recon_loss": recon_loss, "kl_loss": kl,
                 "r2": M.r2(recon, batch),
                 **_norm_stats(grads, params, log_norms, per_tensor)}
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats

    def place_batch(batch):
        return shard_batch(mesh, jnp.asarray(batch))

    return step, placed_params, placed_opt, place_batch


def make_seq_parallel_train_step(mesh: Mesh, cfg: TemporalModelConfig,
                                 tx, params, *, init_opt_state=None,
                                 compute_dtype: str = "float32",
                                 log_norms: bool = True,
                                 per_tensor: bool = False):
    """Sequence-parallel (ring attention) teacher-forced training: the TIME
    axis of src/tgt/ib shards over the mesh's 'seq' axis, params replicate,
    and every attention runs as a ring (parallel/ring_attention.py) — each
    device holds T/n of the sequence, so T can exceed one chip's memory.
    The reference caps T at its [2024^2] mask buffer
    (/root/reference/models/base_blocks.py:173); this is the growth path
    past that. Requires T divisible by the ring size. Attention-probability
    dropout (e.g. the shipped cylinder recipe's 0.1) runs in-ring via the
    flash kernel's global-position counter-hash mask — identical mask for
    any ring size."""
    from sea_tpu.parallel.mesh import replicate, shard_seq
    from sea_tpu.utils.precision import train_cast
    placed_params = replicate(mesh, params)
    placed_opt = replicate(mesh, init_opt_state if init_opt_state is not None
                           else tx.init(params))
    cast_p, cast_x = train_cast(compute_dtype)
    shadow = compute_dtype == "bfloat16_shadow"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, src, tgt, ib, rng):
        def loss_fn(p):
            s, i = cast_x(src, ib)
            out = temporal_forward(p, cfg, s, i, seq_mesh=mesh, rng=rng,
                                   deterministic=False)
            return M.mse(out.astype(jnp.float32), tgt)
        if shadow:
            # Forward/backward on the replicated bf16 shadow in the
            # optimizer state (train/optim.with_bf16_shadow).
            loss, grads = jax.value_and_grad(loss_fn)(opt_state.shadow)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(cast_p(p)))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        stats = {"loss": loss,
                 **_norm_stats(grads, params, log_norms, per_tensor)}
        params = optax.apply_updates(params, updates)
        return params, opt_state, stats

    def place_batch(src, tgt, ib):
        return (shard_seq(mesh, jnp.asarray(src)),
                shard_seq(mesh, jnp.asarray(tgt)),
                shard_seq(mesh, jnp.asarray(ib)))

    return step, placed_params, placed_opt, place_batch


def make_sharded_rollout(mesh: Mesh, cfg: TemporalModelConfig, params,
                         cache_dtype=jnp.float32):
    """Rollout with trajectories sharded over 'data' — each chip rolls out
    its shard of trajectories; eval scales linearly over the mesh.

    Only valid for scan-incremental configs (see rollout.engine.rollout);
    other configs must use the prefix-recompute path."""
    from sea_tpu.rollout.engine import is_scan_incremental
    if not is_scan_incremental(cfg):
        raise ValueError(
            "make_sharded_rollout requires a scan-incremental config "
            "(no attention ib-conditioning, src_len == 0; every exchange "
            "mode incl. pool qualifies); use rollout.engine.rollout for "
            "the prefix-recompute fallback")
    pspec = temporal_param_shardings(mesh, params)
    placed_params = jax.device_put(params, pspec)

    @jax.jit
    def run(params, x0, ib):
        # Multi-device trace: the flash-decode kernel and the int4 matvec
        # dispatch through shard_map on local (batch, head) shards
        # (parallel/kernel_shard.py) — sharded serving keeps the kernels'
        # measured wins instead of falling back to XLA cache attention.
        with attention_kernel_sharding(mesh if mesh.size > 1 else None):
            return rollout_scan(params, cfg, x0, ib,
                                cache_dtype=cache_dtype)

    def place_batch(x0, ib):
        return (shard_batch(mesh, jnp.asarray(x0)),
                shard_batch(mesh, jnp.asarray(ib)))

    return run, placed_params, place_batch
