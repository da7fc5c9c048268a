"""Pipeline-parallel temporal training (GPipe over a 'pipe' mesh axis).

The reference has no distributed execution of any kind (SURVEY §2.10);
pipeline parallelism was the one strategy this rebuild had only documented.
This module implements it TPU-natively:

- The temporal layer stack is HOMOGENEOUS (init_temporal_block builds the
  same pytree per layer), so the blocks stack on a leading layer axis and
  that axis shards over the mesh's 'pipe' dimension — each stage holds
  ``num_layers / n_pipe`` layers in HBM.
- Activations move stage-to-stage with ``ppermute`` over ICI inside a
  ``shard_map``; microbatches keep every stage busy (GPipe schedule, bubble
  fraction (S-1)/(M+S-1) for S stages and M microbatches).
- Backward runs the reverse pipeline automatically: the transpose of
  ``ppermute`` is ``ppermute`` with the inverted permutation, so
  ``jax.grad`` of the shard_map body is itself a pipelined program — no
  hand-written 1F1B schedule needed (GPipe memory profile: all microbatch
  activations live until backward; compose with cfg.remat for deep stacks).
- Composes with data parallelism: the mesh is ('data', 'pipe') and the
  microbatch batch dim shards over 'data' (gradient all-reduce inserted by
  GSPMD outside the shard_map as usual).

Sensible only for deep temporal configs (num_layers >= stages); the shipped
1-layer presets (configs/{cylinder,multiphase}_flow.py) train DP/TP instead
(parallel/train_step.py). This is the scaling path for SEA variants whose
layer stack outgrows one chip.

Dropout contract: masks are keyed per (microbatch, global layer) from keys
drawn OUTSIDE the shard_map, so the sampled network is invariant to the
number of pipeline stages (tested); it intentionally does NOT reproduce the
single-device temporal_forward fold-in sequence, exactly like DP reshapes
reproduce different per-example masks than a single-device run would.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sea_tpu.configs.base import TemporalModelConfig
from sea_tpu.models.temporal import temporal_block
from sea_tpu.ops import layers as L
from sea_tpu.train import metrics as M


# ---------------------------------------------------------------------------
# Param layout: list-of-blocks <-> stacked-leading-layer-axis
# ---------------------------------------------------------------------------

def stack_pipeline_params(params):
    """{'blocks': [L x block], 'ln_final': ...} -> blocks stacked on a
    leading layer axis (the axis that shards over 'pipe')."""
    return {
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *params["blocks"]),
        "ln_final": params["ln_final"],
    }


def unstack_pipeline_params(pp, num_layers: int):
    """Inverse of stack_pipeline_params — back to the checkpoint/driver
    layout (utils/checkpoint.py stores the list-of-blocks form)."""
    return {
        "blocks": [jax.tree.map(lambda x: x[i], pp["blocks"])
                   for i in range(num_layers)],
        "ln_final": pp["ln_final"],
    }


def make_pipe_mesh(n_pipe: int, n_data: int = 1, devices=None) -> Mesh:
    """('data', 'pipe') mesh. 'pipe' is the fastest-varying axis so
    neighbouring stages land on ICI-adjacent chips."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_pipe
    if need > len(devices):
        raise ValueError(
            f"make_pipe_mesh(n_pipe={n_pipe}, n_data={n_data}) needs {need} "
            f"devices but only {len(devices)} visible (see "
            "parallel.mesh.make_mesh's virtual-device bootstrap note)")
    arr = np.asarray(devices[:need]).reshape(n_data, n_pipe)
    return Mesh(arr, axis_names=("data", "pipe"))


def pipeline_param_shardings(mesh: Mesh, pp):
    spec = {
        "blocks": jax.tree.map(lambda _: P("pipe"), pp["blocks"]),
        "ln_final": jax.tree.map(lambda _: P(), pp["ln_final"]),
    }
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                        is_leaf=lambda x: isinstance(x, P))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _stage_body(cfg: TemporalModelConfig, n_microbatches: int,
                deterministic: bool):
    """shard_map body: one pipeline stage. Arguments (per device):
    local_blocks — this stage's layers (leading dim L/S), x_mb / ib_mb —
    ALL microbatches [M, Bmb, T, ...] (batch dim sharded over 'data'),
    key_data — [M, L, 2] uint32 PRNG key data (replicated)."""
    M_ = n_microbatches
    G = cfg.num_fields

    def body(local_blocks, x_mb, ib_mb, key_data):
        S = jax.lax.axis_size("pipe")
        sid = jax.lax.axis_index("pipe")
        L_local = jax.tree.leaves(local_blocks)[0].shape[0]

        def run_layers(x, ib, mb):
            def layer(h, xs):
                blk, li = xs
                rng = None
                if not deterministic:
                    gli = sid * L_local + li
                    rng = jax.random.wrap_key_data(key_data[mb, gli])
                x_vars = [h[:, :, g, :] for g in range(G)]
                out = temporal_block(blk, cfg, x_vars, ib, rng=rng,
                                     deterministic=deterministic)
                return jnp.stack(out, axis=2), None
            h, _ = jax.lax.scan(layer, x, (local_blocks,
                                           jnp.arange(L_local)))
            return h

        def step_t(state, t):
            # Stage s processes microbatch (t - s); clipped index so the
            # gather is always in range — the out-of-window compute is the
            # standard GPipe bubble and its results never reach `outs`.
            mb = jnp.clip(t - sid, 0, M_ - 1)
            x_in = jnp.where(sid == 0, x_mb[mb], state)
            y = run_layers(x_in, ib_mb[mb], mb)
            nxt = jax.lax.ppermute(y, "pipe",
                                   [(i, i + 1) for i in range(S - 1)])
            return nxt, y

        # Mark the carry as device-varying over 'pipe' up front: it becomes
        # varying after the first ppermute, and scan requires carry types
        # to be loop-invariant (shard_map VMA check).
        state0 = jax.lax.pcast(jnp.zeros_like(x_mb[0]), ("pipe",),
                               to="varying")
        _, ys = jax.lax.scan(step_t, state0, jnp.arange(M_ + S - 1))
        # The last stage emits microbatch m at pipeline step m + S - 1.
        outs = ys[S - 1:]
        outs = jnp.where(sid == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, "pipe")

    return body


def pipeline_forward(pp, cfg: TemporalModelConfig, x, ib, *, mesh: Mesh,
                     n_microbatches: int, rng=None,
                     deterministic: bool = True):
    """Pipeline-parallel equivalent of models.temporal.temporal_forward.

    pp: stacked params (stack_pipeline_params). x: [B, T, G, E],
    ib: [B, T, ib_num]. B must divide by n_microbatches; cfg.num_layers by
    the mesh's 'pipe' size. Deterministic mode is numerically equal to the
    single-device forward (tests/test_pipeline.py)."""
    B, T, G, E = x.shape
    M_ = n_microbatches
    S = mesh.shape["pipe"]
    if cfg.num_layers % S:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by "
                         f"pipe={S}")
    if B % M_:
        raise ValueError(f"batch {B} not divisible by n_microbatches={M_}")
    n_data = mesh.shape.get("data", 1)
    if (B // M_) % n_data:
        raise ValueError(
            f"microbatch size {B // M_} not divisible by the mesh 'data' "
            f"axis ({n_data}); use batch divisible by "
            f"n_microbatches*data = {M_ * n_data}")
    x_mb = x.reshape(M_, B // M_, T, G, E)
    ib_mb = ib.reshape(M_, B // M_, T, ib.shape[-1])
    if deterministic or rng is None:
        key_data = jnp.zeros((M_, cfg.num_layers, 2), jnp.uint32)
    else:
        keys = jax.random.split(rng, M_ * cfg.num_layers)
        key_data = jax.random.key_data(keys).reshape(
            M_, cfg.num_layers, -1).astype(jnp.uint32)

    shmapped = jax.shard_map(
        _stage_body(cfg, M_, deterministic), mesh=mesh,
        in_specs=(P("pipe"), P(None, "data"), P(None, "data"), P()),
        out_specs=P(None, "data"))
    out = shmapped(pp["blocks"], x_mb, ib_mb, key_data)
    out = out.reshape(B, T, G, E)
    x_vars = [L.apply_norm(pp["ln_final"][i], out[:, :, i, :], ib)
              for i in range(G)]
    return jnp.stack(x_vars, axis=2)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_pipeline_train_step(mesh: Mesh, cfg: TemporalModelConfig, tx,
                             params, *, n_microbatches: int = 0,
                             compute_dtype: str = "float32",
                             init_opt_state=None, log_norms: bool = True,
                             per_tensor: bool = False):
    """Teacher-forced temporal train step with the layer stack pipelined
    over 'pipe' and the batch sharded over 'data'. Same return contract as
    the other sharded step constructors (parallel/train_step.py):
    (step, placed_params, placed_opt, place_batch) with a
    {loss, grad_norm, param_norm} stats dict.

    Params/opt state live in the STACKED layout on the mesh; use
    unstack_pipeline_params before writing driver-layout checkpoints and
    stack_pipeline_params(init_params) for resume (pass the result here).

    n_microbatches defaults to the 'pipe' size (full-pipeline utilization
    needs M >= S; larger M shrinks the bubble at the cost of smaller
    per-stage GEMMs)."""
    from sea_tpu.parallel.train_step import _norm_stats, _place_state
    from sea_tpu.utils.precision import train_cast
    S = mesh.shape["pipe"]
    M_ = n_microbatches or S
    stacked = (params if "blocks" in params and not
               isinstance(params["blocks"], list)
               else stack_pipeline_params(params))
    pspec = pipeline_param_shardings(mesh, stacked)
    placed_params, placed_opt = _place_state(mesh, stacked, pspec, tx,
                                             init_opt_state)
    cast_p, cast_x = train_cast(compute_dtype)
    shadow = compute_dtype == "bfloat16_shadow"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(pp, opt_state, src, tgt, ib, rng):
        def loss_fn(p):
            s, i = cast_x(src, ib)
            out = pipeline_forward(p, cfg, s, i, mesh=mesh,
                                   n_microbatches=M_, rng=rng,
                                   deterministic=False)
            return M.mse(out.astype(jnp.float32), tgt)
        if shadow:
            loss, grads = jax.value_and_grad(loss_fn)(opt_state.shadow)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(cast_p(p)))(pp)
        updates, opt_state = tx.update(grads, opt_state, pp)
        stats = {"loss": loss, **_norm_stats(grads, pp, log_norms,
                                             per_tensor)}
        pp = optax.apply_updates(pp, updates)
        return pp, opt_state, stats

    def place_batch(src, tgt, ib):
        def put(a):
            a = jnp.asarray(a)
            return jax.device_put(
                a, NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))))
        return put(src), put(tgt), put(ib)

    return step, placed_params, placed_opt, place_batch
