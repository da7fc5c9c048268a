"""Checkpointing.

The reference saves bare ``model.state_dict()`` .pt files keyed by
case/run name, never saves optimizer state, and "resume" restarts the
optimizer fresh (SURVEY §5.4). Here checkpoints are orbax pytrees carrying
params AND optimizer state plus step metadata — strictly more capable while
keeping the same best-model-selection semantics in the training drivers.
(--model_path resume currently restores params only — a fresh optimizer —
matching the reference's resume semantics; restore_pytree can recover
opt_state with a {"params": ..., "opt_state": ...} template when needed.)

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
        out[prefix[:-1]] = np.asarray(tree)
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
        return leaf.astype(want.dtype)

    return rebuild(template)


def checkpoint_path(save_dir: str, kind: str, case_name: str,
                    run_name: str) -> str:
    return os.path.join(save_dir, f"{kind}_{case_name}_{run_name}.npz")


def save_checkpoint(save_dir: str, kind: str, case_name: str, run_name: str,
                    params: Any, opt_state: Any = None,
                    meta: Optional[Dict[str, Any]] = None) -> str:
    path = checkpoint_path(save_dir, kind, case_name, run_name)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if meta:
        tree["meta"] = {k: np.asarray(v) for k, v in meta.items()}
    save_pytree(path, tree)
    return path


def load_params(path: str, params_template: Any) -> Any:
    """Load just the params subtree from a checkpoint file.

    Accepts either our .npz checkpoints or a reference torch .pt state dict
    (detected by extension) — the latter goes through torch_compat at the
    caller, which needs model configs, so here we only handle .npz.
    """
    tree = restore_pytree(path, {"params": params_template})
    return tree["params"]


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
