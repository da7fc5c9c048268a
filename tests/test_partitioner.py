"""Partition round-trip invariants.

Ports the reference's inline checks (utils/modular_testing.py:7-74
unit_test_create_partitions2D/3D and :77-228 test_mesh_processor_2d/3d) to
real pytest: patchify -> unpatchify must preserve every field value and every
coordinate within 1e-6, for 2D and 3D meshes, including empty patches.
"""

import numpy as np
import pytest

from sea_tpu.configs.base import MeshConfig
from sea_tpu.data.mesh import MeshProcessor
from sea_tpu.data.partitioner import (build_partition_index, patchify,
                                      patchify_jax, unpatchify,
                                      unpatchify_jax)


def _random_mesh_2d(n=500, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.rand(n, 2).astype(np.float32) * [4.0, 2.0]
    fields = rng.randn(7, n, 3).astype(np.float32)
    return coords, fields


def test_roundtrip_2d():
    coords, fields = _random_mesh_2d()
    part = build_partition_index(coords, 9, 9)
    patched = patchify(part, fields)
    assert patched.shape[:2] == (7, 64)
    recon = unpatchify(part, patched)
    np.testing.assert_allclose(recon, fields, atol=1e-6)


def test_roundtrip_3d():
    rng = np.random.RandomState(1)
    coords = rng.rand(400, 3).astype(np.float32)
    fields = rng.randn(5, 400, 2).astype(np.float32)
    part = build_partition_index(coords, 5, 5, 5)
    patched = patchify(part, fields)
    assert patched.shape[:2] == (5, 64)
    recon = unpatchify(part, patched)
    np.testing.assert_allclose(recon, fields, atol=1e-6)


def test_empty_patches_padded():
    # Cluster all nodes in one corner -> most patches empty.
    rng = np.random.RandomState(2)
    coords = rng.rand(50, 2).astype(np.float32) * 0.1
    coords[0] = [1.0, 1.0]  # stretch the bounding box
    fields = rng.randn(3, 50, 1).astype(np.float32)
    part = build_partition_index(coords, 9, 9)
    patched = patchify(part, fields)
    recon = unpatchify(part, patched)
    np.testing.assert_allclose(recon, fields, atol=1e-6)
    # Padded slots must hold pad_field_value.
    assert np.all(patched[:, ~part.valid_mask] == 0.0)


def test_within_patch_node_order_ascending():
    coords, fields = _random_mesh_2d()
    part = build_partition_index(coords, 9, 9)
    for p in range(part.num_patches):
        idx = part.index_map[p][part.valid_mask[p]]
        assert np.all(np.diff(idx) > 0), "node order within patch must ascend"


def test_reference_parity_partition_order():
    """Patch ordering and contents must match the reference's double loop
    (data_processors.py:42-55): i-major over x-buckets, then y-buckets."""
    coords, fields = _random_mesh_2d(n=200, seed=3)
    part = build_partition_index(coords, 5, 4)

    # Hand-rolled reference algorithm in numpy.
    x, y = coords[:, 0], coords[:, 1]
    xb = np.linspace(x.min(), x.max(), 5, dtype=np.float32)
    yb = np.linspace(y.min(), y.max(), 4, dtype=np.float32)
    xi = np.clip(np.searchsorted(xb, x, side="right"), 1, 4)
    yi = np.clip(np.searchsorted(yb, y, side="right"), 1, 3)
    expected_patches = []
    for i in range(1, 5):
        for j in range(1, 4):
            mask = (xi == i) & (yi == j)
            expected_patches.append(np.nonzero(mask)[0])
    for p, exp in enumerate(expected_patches):
        got = part.index_map[p][part.valid_mask[p]]
        np.testing.assert_array_equal(got, exp)


def test_jax_matches_numpy_patchify():
    coords, fields = _random_mesh_2d(seed=4)
    part = build_partition_index(coords, 9, 9)
    ref = patchify(part, fields)
    got = np.asarray(patchify_jax(part, fields))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    back = np.asarray(unpatchify_jax(part, got))
    np.testing.assert_allclose(back, unpatchify(part, ref), atol=1e-6)


def test_mesh_processor_roundtrip_with_scaling():
    coords, fields = _random_mesh_2d(seed=5)
    mesh_cfg = MeshConfig(m=9, n=9, scale_feature_range=(-1.0, 1.0))
    mp = MeshProcessor(mesh_cfg, [[0, 1], [2]], coords.T, save_dir="/tmp/sea_test_scalers")
    _, patched = mp.patchify_and_scale(fields, fit_scalers=True)
    recon = mp.inverse_scale_and_unpatch(patched)
    np.testing.assert_allclose(recon, fields, atol=1e-5)
    # Scaled values must lie in the feature range.
    valid = mp.partition.valid_mask
    assert patched[:, valid].min() >= -1.0 - 1e-6
    assert patched[:, valid].max() <= 1.0 + 1e-6


def test_mesh_processor_initial_test_catches_corruption():
    coords, fields = _random_mesh_2d(seed=6)
    mp = MeshProcessor(MeshConfig(), [[0, 1], [2]], coords.T)
    _, patched = mp.patchify_and_scale(fields)
    bad = patched.copy()
    bad[0, 0, 0, 0] += 1.0
    with pytest.raises(AssertionError):
        mp._roundtrip_check(fields, bad)
