"""Checkpointing.

The reference saves bare ``model.state_dict()`` .pt files keyed by
case/run name, never saves optimizer state, and "resume" restarts the
optimizer fresh (SURVEY §5.4). Here a checkpoint is a flat .npz of the
pytree leaves keyed by path — params AND optimizer state plus step
metadata — strictly more capable while keeping the same
best-model-selection semantics in the training drivers. ``--model_path``
resume restores the optimizer state too when the checkpoint carries one
(load_full_checkpoint); reference .pt state dicts (no opt state) resume
with a fresh optimizer, matching the reference.

Multi-host runs save through orbax instead (save_checkpoint with
use_orbax=True, auto-selected by the drivers when jax.process_count() > 1):
npz requires fully-addressable host copies, which tensor-parallel shards
on a pod are not; orbax writes each process's addressable shards and
restores onto device shardings (restore paths accept either format —
a .npz file or an orbax directory).

Checkpoint families mirror the reference naming:
- encoder_decoder_{case}_{run}   (best val recon, train_encoder.py:300-306)
- temporal_{case}_{run}          (best val loss, train_temporal.py:330-337)
- temporal_Checkpoint_{case}_{run} (best rollout, train_temporal.py:311-318)
- final_model_{kind}_{case}_{run}  (main.py:66-69,97-100)

Reference .pt checkpoints remain loadable via sea_tpu.utils.torch_compat.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree, prefix=""):
    """Flatten a nested dict/list pytree into {path: array} for npz."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        arr = np.asarray(tree)
        if arr.dtype.kind == "V":
            # ml_dtypes leaves (bfloat16 Adam mu with
            # adam_mu_dtype='bfloat16', fp8/int4 experiments): np.savez
            # stores them as raw void ('|V2') which np.load cannot cast
            # back. Widen to float32 — exact for every sub-f32 float —
            # and let restore_pytree cast to the template dtype.
            arr = arr.astype(np.float32)
        out[prefix[:-1]] = arr
    return out


def save_pytree(path: str, tree: Any) -> None:
    """Structure-preserving save: npz of flattened leaves + a treedef spec.

    orbax is available in the image but its async machinery is heavyweight
    for our small models; a flat npz keyed by pytree path is portable,
    inspectable (np.load), and dependency-free. Restore requires a template
    with the same structure (restore_pytree).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    np.savez(path, **flat)


def restore_pytree(path: str, template: Any) -> Any:
    """Restore leaves into the structure of ``template``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"No checkpoint at {path}. Train the corresponding stage first "
            "(e.g. `python -m sea_tpu.cli <case> encoder train`), or pass "
            "--model_path to a .npz/.pt checkpoint.")
    data = np.load(path)

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        if isinstance(tree, tuple):
            children = [rebuild(v, f"{prefix}{i}/")
                        for i, v in enumerate(tree)]
            # Namedtuples (optax states like ScaleByAdamState) must keep
            # their type — a plain tuple breaks tx.update on resume.
            if hasattr(tree, "_fields"):
                return type(tree)(*children)
            return tuple(children)
        if tree is None:
            return None
        key = prefix[:-1]
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
        leaf = data[key]
        want = np.asarray(tree)
        if leaf.shape != want.shape:
            raise ValueError(
                f"checkpoint {path} leaf {key!r} has shape {leaf.shape} "
                f"but the template expects {want.shape} — the checkpoint "
                "was saved with a different config/layout (a silent "
                "reshape would scramble the weights)")
        if leaf.dtype.kind == "V":
            # Legacy checkpoint written before extended dtypes were
            # widened on save: the bytes are the template dtype's
            # (e.g. '|V2' holding bfloat16) — reinterpret, don't cast.
            if leaf.dtype.itemsize != want.dtype.itemsize:
                raise ValueError(
                    f"checkpoint {path} leaf {key!r} has opaque dtype "
                    f"{leaf.dtype} that does not match the template's "
                    f"{want.dtype}")
            leaf = leaf.view(want.dtype)
        return leaf.astype(want.dtype)

    return rebuild(template)


def checkpoint_path(save_dir: str, kind: str, case_name: str,
                    run_name: str) -> str:
    return os.path.join(save_dir, f"{kind}_{case_name}_{run_name}.npz")


def save_checkpoint(save_dir: str, kind: str, case_name: str, run_name: str,
                    params: Any, opt_state: Any = None,
                    meta: Optional[Dict[str, Any]] = None,
                    use_orbax: bool = False) -> str:
    """``use_orbax=True`` writes an orbax directory (multi-host safe: each
    process persists its addressable shards; arrays may stay on device) at
    the npz path minus the extension; otherwise a flat npz of host copies."""
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if meta:
        tree["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    if use_orbax:
        path = orbax_checkpoint_dir(save_dir, kind, case_name, run_name)
        return save_checkpoint_orbax(path, tree)
    path = checkpoint_path(save_dir, kind, case_name, run_name)
    save_pytree(path, tree)
    return path


def orbax_checkpoint_dir(save_dir: str, kind: str, case_name: str,
                         run_name: str) -> str:
    return os.path.join(save_dir, f"{kind}_{case_name}_{run_name}.orbax")


def _is_orbax_dir(path: str) -> bool:
    return os.path.isdir(path)


def load_params(path: str, params_template: Any) -> Any:
    """Load just the params subtree from a checkpoint.

    Accepts our .npz checkpoints OR an orbax checkpoint directory (saved by
    multi-host runs). Reference torch .pt state dicts are handled by the
    caller via torch_compat (they need model configs).
    """
    if _is_orbax_dir(path):
        return restore_checkpoint_orbax(path)["params"]
    tree = restore_pytree(path, {"params": params_template})
    return tree["params"]


def load_full_checkpoint(path: str, params_template: Any,
                         opt_template: Any = None):
    """(params, opt_state | None, meta dict) from a checkpoint.

    opt_state comes back only when BOTH the checkpoint carries one and an
    ``opt_template`` (e.g. ``tx.init(params_template)``) is supplied — the
    npz format needs a structure template to rebuild optax namedtuples.
    Resume with a restored optimizer continues Adam moments/schedule where
    the run left off (the reference always restarts the optimizer,
    SURVEY §5.4 — a strict improvement, noted divergence).
    """
    if _is_orbax_dir(path):
        tree = restore_checkpoint_orbax(path)
        # Orbax returns plain containers (namedtuples come back as dicts
        # keyed by FIELD NAME); rebuild optax namedtuples from the
        # template when given — matching by name, never by traversal
        # order, so a reordered optax chain cannot silently scramble
        # mu/nu/count on resume.
        opt = tree.get("opt_state")
        if opt is not None and opt_template is not None:
            opt = _rebuild_like(opt_template, opt, where="opt_state")
        elif opt_template is None:
            opt = None
        return tree["params"], opt, tree.get("meta", {})
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        has_opt = any(k.startswith("opt_state/") for k in data.files)
        meta = {k.split("/", 1)[1]: data[k] for k in data.files
                if k.startswith("meta/")}
    template = {"params": params_template}
    if has_opt and opt_template is not None:
        template["opt_state"] = opt_template
    tree = restore_pytree(path, template)
    return tree["params"], tree.get("opt_state"), meta


def _rebuild_like(template, restored, where=""):
    """Rebuild ``template``'s pytree types from an orbax-restored tree.

    Namedtuples (optax states) are matched to restored dicts by FIELD
    NAME; dicts by key; sequences by index — with shape validation at
    the leaves. Order-based pairing would depend on dict key sort
    coinciding with namedtuple field order, which is a coincidence, not
    a contract."""
    if hasattr(template, "_fields"):  # namedtuple (optax state)
        if not template._fields:  # e.g. optax.EmptyState — orbax
            return type(template)()  # restores it as None
        if isinstance(restored, dict):
            missing = [f for f in template._fields if f not in restored]
            if missing:
                raise KeyError(
                    f"orbax checkpoint {where!r} missing fields {missing} "
                    f"of {type(template).__name__}")
            return type(template)(*[
                _rebuild_like(getattr(template, f), restored[f],
                              f"{where}/{f}") for f in template._fields])
        restored = tuple(restored)  # saved pre-named-keys: by position
        return type(template)(*[
            _rebuild_like(t, r, f"{where}/{i}")
            for i, (t, r) in enumerate(zip(template, restored))])
    if isinstance(template, dict):
        return {k: _rebuild_like(v, restored[k], f"{where}/{k}")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        if isinstance(restored, dict):
            # orbax stores sequences as {'0': ..., '1': ...} in some
            # versions; index by stringified position.
            restored = [restored[str(i)] for i in range(len(template))]
        out = [_rebuild_like(t, r, f"{where}/{i}")
               for i, (t, r) in enumerate(zip(template, restored))]
        return out if isinstance(template, list) else tuple(out)
    if template is None:
        return None
    want = np.asarray(template)
    got = np.asarray(restored) if restored is not None else None
    if got is None or got.shape != want.shape:
        raise ValueError(
            f"orbax checkpoint leaf {where!r} has shape "
            f"{None if got is None else got.shape} but the template "
            f"expects {want.shape}")
    return restored


def snapshot_tree(tree):
    """Checkpoint-safe copy of a (possibly donated) pytree.

    Single-process: host numpy copies (what the npz format wants). On a
    multi-host pod np.asarray would fail for non-fully-addressable shards,
    so keep device copies — orbax persists each process's shards directly.
    """
    import jax
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                        tree)


def multihost_checkpointing() -> bool:
    import jax
    return jax.process_count() > 1


# ---------------------------------------------------------------------------
# Orbax backend (optional): sharding-aware checkpoints for multi-host runs.
# The npz path above covers single-host; orbax restores arrays directly onto
# their device mesh shardings, which npz cannot.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(directory: str, tree: Any) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    return path


def restore_checkpoint_orbax(directory: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(directory), item=template)
    return ckptr.restore(os.path.abspath(directory))
