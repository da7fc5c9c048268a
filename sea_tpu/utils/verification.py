"""Public verification utilities.

Mirror of reference utils/modular_testing.py's inline checks as a library
API (the reference calls these from the main path behind config flags):
- verify_partition_roundtrip: unit_test_create_partitions2D/3D (:7-74) —
  partition -> inverse preserves every field value and coordinate (1e-6).
- verify_mesh_processor: test_mesh_processor_2d/3d (:77-228) — full
  scale+patchify+inverse equality on ``test_numbers`` random timesteps,
  returning max/mean diff stats.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.data.partitioner import PartitionIndex, patchify, unpatchify


class VerificationError(AssertionError):
    """Raised when a data-pipeline invariant fails. Subclasses
    AssertionError for backward compatibility with callers/tests that
    catch it, but is raised explicitly so `python -O` cannot strip it."""


def verify_partition_roundtrip(part: PartitionIndex, fields: np.ndarray,
                               coords: np.ndarray, *, atol: float = 1e-6
                               ) -> Dict[str, float]:
    """fields: [T, N, F]; coords: [N, dim]. Raises VerificationError on
    failure (a real exception — unlike ``assert`` it survives
    ``python -O``); returns diff stats on success."""
    patched = patchify(part, fields)
    recon = unpatchify(part, patched)
    max_diff = float(np.max(np.abs(recon - fields)))
    if max_diff > atol:
        raise VerificationError(f"field round-trip failed: {max_diff}")

    valid = part.valid_mask
    recon_coords = np.empty_like(coords)
    recon_coords[part.index_map[valid]] = part.coords[valid]
    coord_diff = float(np.max(np.abs(recon_coords - coords)))
    if coord_diff > atol:
        raise VerificationError(f"coord round-trip failed: {coord_diff}")
    return {"max_field_diff": max_diff, "max_coord_diff": coord_diff,
            "passed": True}


def verify_mesh_processor(mp: MeshProcessor, fields: np.ndarray, *,
                          test_numbers: int = 10, atol: float = 1e-6,
                          seed: int = 0) -> Dict[str, float]:
    """End-to-end patchify -> unpatchify equality on random timesteps
    (reference checks `test_numbers=10` and plots the first)."""
    rng = np.random.RandomState(seed)
    T = fields.shape[0]
    idx = rng.choice(T, min(test_numbers, T), replace=False)
    sample = np.asarray(fields[idx], dtype=np.float32)
    # Use the processor's CURRENT scaler state — refitting on the sample
    # would corrupt the fitted min/max (in memory and the persisted .npz).
    if mp.scalers and any(sc.min_val is None for sc in mp.scalers):
        raise ValueError("verify_mesh_processor requires fitted scalers; "
                         "run patchify_and_scale first")
    from sea_tpu.data.partitioner import patchify as _patchify
    scaled = mp._scale_fields(sample)
    patched = _patchify(mp.partition, scaled)
    recon = mp.inverse_scale_and_unpatch(patched)
    diff = np.abs(recon - sample)
    result = {"max_diff": float(diff.max()), "mean_diff": float(diff.mean()),
              "passed": bool(np.allclose(recon, sample, atol=max(atol, 1e-5)))}
    if not result["passed"]:
        raise VerificationError(f"mesh round-trip failed: {result}")
    return result
