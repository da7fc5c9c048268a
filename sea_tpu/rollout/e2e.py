"""Fully on-device end-to-end rollout evaluation.

The north star asks for the 250-step rollout "fully on-device". The driver
pipeline (train/evaluate.py) mirrors the reference's staging — rollout,
then batched decode, then host-side un-patching — with host transfers
between stages (the reference bounces latents GPU->CPU->GPU,
train_utils.py:220-230).

Here the WHOLE evaluation is one jit-compiled XLA program:
    scan rollout (KV caches)
 -> latent layout shuttle (reshape/transpose)
 -> frozen stage-1 decode
 -> device-side un-patch (scatter, partitioner.unpatchify_jax)
 -> per-(time, field) relative MSE against ground truth
Nothing touches the host between the initial latent state and the final
metric tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sea_tpu.configs.base import SpatialModelConfig, TemporalModelConfig
from sea_tpu.data.partitioner import PartitionIndex, unpatchify_jax
from sea_tpu.models.spatial import spatial_decode
from sea_tpu.rollout.engine import rollout_scan
from sea_tpu.train import metrics as M


def make_e2e_rollout_eval(tcfg: TemporalModelConfig,
                          scfg: SpatialModelConfig,
                          part: PartitionIndex, *,
                          sea_layout: str = "isolate",
                          scalers=None, field_groups=None,
                          cache_dtype=jnp.float32):
    """Returns a jitted fn(temporal_params, spatial_params, x0, ib, truth,
    tgt_lat) -> (decoded_fields [B,T,N,F], rel_mse_per_time [B,T,F],
    encoded_rel_mse scalar).

    x0:      [B, G, E] initial latent state
    ib:      [B, T, ib_num]
    truth:   [B, T, N, F] ground-truth node fields aligned with predictions
    tgt_lat: [B, T, G, E] ground-truth latents (encoded_rel_mse target)
    scalers/field_groups: the MeshProcessor's min-max scalers (optional) —
    inverse scaling is folded into the compiled program as per-field
    affine constants.
    """
    from sea_tpu.rollout.engine import is_scan_incremental
    if not is_scan_incremental(tcfg):
        raise ValueError(
            "make_e2e_rollout_eval requires a scan-incremental config "
            "(no attention ib-conditioning, src_len == 0; every exchange "
            "mode incl. pool qualifies); use "
            "train.evaluate.full_autoregressive_evaluation, whose engine "
            "dispatches to the prefix-recompute fallback for these")
    tail = make_eval_tail(scfg, part, sea_layout=sea_layout,
                          scalers=scalers, field_groups=field_groups,
                          jit=False)

    @jax.jit
    def run(tparams, sparams, x0, ib, truth, tgt_lat):
        preds = rollout_scan(tparams, tcfg, x0, ib,
                             cache_dtype=cache_dtype)  # [B,T,G,E]
        return tail(sparams, preds, truth, tgt_lat)

    return run


def make_eval_tail(scfg: SpatialModelConfig, part: PartitionIndex, *,
                   sea_layout: str = "isolate", scalers=None,
                   field_groups=None, jit: bool = True):
    """Evaluation tail shared by the fused program and the prefix-engine
    serving path: fn(sparams, preds [B,T,G,E], truth [B,T,N,F],
    tgt_lat [B,T,G,E]) -> (decoded fields, rel-MSE per (B,T,F), encoded
    rel-MSE scalar). With ``jit`` it is its own compiled program — the
    prefix rollout engine is a chunked multi-program pipeline, so its
    serving path runs [prefix chunks] -> [this tail] entirely on device
    with no host bounce in between."""
    decode = make_decode_chain(scfg, part, sea_layout=sea_layout,
                               scalers=scalers, field_groups=field_groups)

    def tail(sparams, preds, truth, tgt_lat):
        enc_rel = jnp.mean(M.relative_mse(preds.astype(jnp.float32),
                                          tgt_lat))
        fields = decode(sparams, preds)  # [B,T,N,F]
        rel = M.relative_mse_with_time(fields, truth, axis=2)  # [B,T,F]
        return fields, rel, enc_rel

    return jax.jit(tail) if jit else tail


def make_decode_chain(scfg: SpatialModelConfig, part: PartitionIndex, *,
                      sea_layout: str = "isolate",
                      scalers=None, field_groups=None):
    """Traced latents->fields tail shared by the fused eval and the
    generate engine: layout shuttle -> frozen stage-1 decode -> device
    un-patch -> inverse min-max scale (folded in as per-field affine
    constants). Returns fn(sparams, preds [B,T,G,E]) -> [B,T,N,F]."""
    P = part.num_patches
    C = part.cells_per_patch
    D = scfg.embed_dim
    G = scfg.num_groups
    num_nodes = part.num_nodes
    # Per-field inverse-scale affine constants (identity without scalers):
    # orig = scaled * a + b  where a = (max-min)/(hi-lo), b = min - lo*a.
    n_fields = sum(len(g) for g in scfg.field_groups)
    a = np.ones((n_fields,), np.float32)
    b = np.zeros((n_fields,), np.float32)
    if scalers:
        for scaler, group in zip(scalers, field_groups):
            lo, hi = scaler.feature_range
            af = (scaler.max_val - scaler.min_val) / (hi - lo)
            for f in group:
                a[f] = af
                b[f] = scaler.min_val - lo * af
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def decode(sparams, preds):
        B, T = preds.shape[0], preds.shape[1]
        lat = preds.reshape(B * T, G, P, D).transpose(0, 2, 1, 3)
        dec = spatial_decode(sparams, scfg, lat)  # [B*T, P, F, C]
        if sea_layout == "isolate":
            dec = dec.transpose(0, 1, 3, 2)  # -> [B*T, P, C, F]
        else:  # mixed
            dec = dec.reshape(B * T, P, C, dec.shape[2])
        fields = unpatchify_jax(part, dec).reshape(B, T, num_nodes, -1)
        return fields.astype(jnp.float32) * a + b  # inverse min-max scale

    return decode


def make_generate(tcfg: TemporalModelConfig, scfg: SpatialModelConfig,
                  part: PartitionIndex, *,
                  sea_layout: str = "isolate",
                  scalers=None, field_groups=None,
                  cache_dtype=jnp.float32):
    """Arbitrary-horizon SURROGATE SIMULATION: one compiled program from
    an initial latent state to H decoded physical-field snapshots — no
    ground truth involved, so the horizon is not tied to any dataset
    window (the capability the reference's eval-only rollout lacks,
    train_utils.py:186-312 always scores against a loader's targets).

    Returns a jitted fn(tparams, sparams, x0 [B,G,E],
    ib [B,H,ib_num]) -> fields [B,H,N,F]: prediction k is the state at
    time k+1, decoded through the frozen stage-1 decoder, un-patched and
    un-scaled on device. H is set by ib's length; the scan+KV engine has
    no materialized [T,T] mask, so memory scales linearly in H.
    """
    from sea_tpu.rollout.engine import is_scan_incremental
    if not is_scan_incremental(tcfg):
        raise ValueError(
            "generate requires a scan-incremental config (no attention "
            "ib-conditioning, src_len == 0); prefix-recompute has no "
            "horizon-unbounded form")
    decode = make_decode_chain(scfg, part, sea_layout=sea_layout,
                               scalers=scalers, field_groups=field_groups)

    @jax.jit
    def run(tparams, sparams, x0, ib):
        preds = rollout_scan(tparams, tcfg, x0, ib,
                             cache_dtype=cache_dtype)  # [B,H,G,E]
        return decode(sparams, preds)

    return run
