"""Device mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY §2.10). This module
provides the TPU-native parallelism layer the north star demands:

- ``make_mesh``: a jax.sharding.Mesh over ('data', 'model') axes. Batch /
  trajectory dims shard over 'data' (pure DP, gradient all-reduce over ICI);
  attention-head and MLP-hidden dims optionally shard over 'model'
  (Megatron-style TP) — XLA/GSPMD inserts the collectives.
- ``shard_batch`` / ``replicate``: NamedSharding placement helpers.
- ``temporal_param_shardings`` / ``spatial_param_shardings``: TP partition
  specs for the model weights (heads=8 divides cleanly across model axis).
  The per-field MLPs — the dominant weights (134M of 201M multiphase
  params) — shard Megatron-style: first linear column-wise over 'model',
  last linear row-wise (one all-reduce on its output, inserted by
  GSPMD). The reference MLP's LayerNorm BETWEEN the hidden linears
  (base_blocks.py:9-47) does NOT force a re-gather: its per-token
  mean/var over the sharded hidden axis is a 2-scalar psum, which GSPMD
  emits when ops/layers.mlp pins the hidden activation sharded
  (with_sharding_constraint under the kernel-sharding context).

Multi-host: call jax.distributed.initialize() before make_mesh; the mesh
then spans all processes' devices (DCN between slices, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_model
    used = n_data * n_model
    if used > total:
        raise ValueError(
            f"make_mesh(n_data={n_data}, n_model={n_model}) needs "
            f"{used} devices but only {total} visible. On a single-chip "
            "host, bootstrap virtual devices BEFORE JAX initializes: set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> and call "
            "jax.config.update('jax_platforms', 'cpu') before any device "
            "access (see __graft_entry__.dryrun_multichip, which re-execs "
            "itself in a subprocess to do exactly this).")
    if used < total:
        import warnings
        warnings.warn(f"mesh uses {used} of {total} devices "
                      f"({total - used} idle); pick n_data/n_model to "
                      "cover all devices", stacklevel=2)
    arr = np.asarray(devices[:used]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def make_seq_mesh(n_seq: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over a 'seq' axis for sequence-parallel (ring) attention —
    temporal_forward(..., seq_mesh=make_seq_mesh(n)) shards the time axis
    across n devices (parallel/ring_attention.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n_seq = len(devices) if n_seq is None else n_seq
    if n_seq > len(devices):
        raise ValueError(
            f"make_seq_mesh(n_seq={n_seq}) needs {n_seq} devices but only "
            f"{len(devices)} visible (see make_mesh's bootstrap note)")
    return Mesh(np.asarray(devices[:n_seq]), axis_names=("seq",))


def shard_seq(mesh: Mesh, x, *, axis: int = 1):
    """Place an array with its time axis sharded over 'seq'."""
    spec = [None] * x.ndim
    spec[axis] = "seq"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_batch(mesh: Mesh, x, *, axis: int = 0):
    """Place an array with its leading (batch) axis sharded over 'data'."""
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel partition specs
# ---------------------------------------------------------------------------

def _tp_linear_spec(p, w_spec, b_spec):
    """Partition spec for one linear param dict, matching its actual keys:
    plain {"w", "b"}, int8-quantized {"w_q", "w_s", "b"}, or
    int4-packed {"w_p4", "w_s", "b"} (utils.precision). Quantized
    weights shard like the full weight — w_p4 packs two INPUT rows per
    byte, so its [in/2, out] layout shards identically on either axis —
    and the per-output-channel scale follows the output dim."""
    spec = {}
    if "w" in p:
        spec["w"] = w_spec
    if "w_q" in p or "w_p4" in p:
        spec["w_q" if "w_q" in p else "w_p4"] = w_spec
        # w_s is [out]: sharded iff the output dim is.
        spec["w_s"] = P(w_spec[1]) if len(w_spec) > 1 else P()
    if "b" in p:
        spec["b"] = b_spec
    return spec


def _tp_mlp_spec(p):
    """Megatron sharding for one reference-MLP param dict (ops/layers.
    init_mlp): first linear column-parallel (output/hidden dim over
    'model'), last linear row-parallel (input dim over 'model', GSPMD
    inserts the single all-reduce on its output), hidden LayerNorm
    weight/bias sharded with the hidden activation. Middle linears of a
    deeper MLP (num_layers > 2 — no shipped config) stay replicated:
    [8D, 8D] hidden-to-hidden would need its own re-gather either way."""
    layers = p["layers"]
    n = len(layers)
    out = []
    for i, entry in enumerate(layers):
        e = {}
        if n >= 2 and i == 0:
            e["lin"] = _tp_linear_spec(entry["lin"], P(None, "model"),
                                       P("model"))
            if "ln" in entry:
                e["ln"] = {k: P("model") for k in entry["ln"]}
        elif n >= 2 and i == n - 1:
            e["lin"] = _tp_linear_spec(entry["lin"], P("model", None), P())
        else:
            e = jax.tree.map(lambda _: P(), entry)
        out.append(e)
    return {"layers": out}


def _tp_attention_spec(p):
    """q/k/v project [D, D=H*hd]: shard the head (output) dim; the output
    projection [D, D] shards its input dim — the contraction then needs one
    all-reduce, which GSPMD inserts (Megatron pattern)."""
    return {
        "q": _tp_linear_spec(p["q"], P(None, "model"), P("model")),
        "k": _tp_linear_spec(p["k"], P(None, "model"), P("model")),
        "v": _tp_linear_spec(p["v"], P(None, "model"), P("model")),
        "proj": _tp_linear_spec(p["proj"], P("model", None), P()),
    }


def temporal_param_shardings(mesh: Mesh, params):
    """PartitionSpec pytree for temporal model params: attention q/k/v/proj
    sharded over 'model', everything else replicated."""
    def map_block(block):
        spec = jax.tree.map(lambda _: P(), block)
        # Per-field MLPs: the dominant weights (134M of 201M multiphase
        # params) — Megatron col/row sharding with a distributed hidden LN.
        spec["mlp"] = [_tp_mlp_spec(p) for p in block["mlp"]]
        for key in ("self_attn", "cross_attn_ib"):
            if key in block:
                spec[key] = [_tp_attention_spec(p) for p in block[key]]
        if "cross_attn" in block:
            ca = block["cross_attn"]
            if ca and isinstance(ca[0], list):  # sea: [G][G]
                spec["cross_attn"] = [
                    [None if p is None else _tp_attention_spec(p)
                     for p in row] for row in ca]
            else:  # pool: [G]
                spec["cross_attn"] = [_tp_attention_spec(p) for p in ca]
        return spec

    spec = {
        "blocks": [map_block(b) for b in params["blocks"]],
        "ln_final": jax.tree.map(lambda _: P(), params["ln_final"]),
    }
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                        is_leaf=lambda x: isinstance(x, P))


def spatial_param_shardings(mesh: Mesh, params):
    def map_block(block):
        spec = jax.tree.map(lambda _: P(), block)
        spec["attn"] = _tp_attention_spec(block["attn"])
        return spec
    spec = jax.tree.map(lambda _: P(), params)
    spec["blocks"] = [map_block(b) for b in params["blocks"]]
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                        is_leaf=lambda x: isinstance(x, P))
