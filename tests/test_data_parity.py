"""Data-pipeline parity against the reference implementation.

The model-level parity tests (test_torch_parity.py) prove the networks
match; this proves the *data path* matches: our vectorized partitioner must
produce byte-identical patch contents, ordering, and padding to the
reference's per-patch loops (utils/data_processors.py DataPartitioner2D/3D),
and the window datasets must slice like TemporalDataset.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available")
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")


def test_partitioner2d_matches_reference():
    from utils.data_processors import DataPartitioner2D
    from sea_tpu.data.partitioner import build_partition_index, patchify

    rng = np.random.RandomState(0)
    N, T, F = 300, 5, 3
    coords = rng.rand(N, 2).astype(np.float32) * [4.0, 2.0]
    fields = rng.randn(T, N, F).astype(np.float32)

    ref_part = DataPartitioner2D(torch.from_numpy(coords[:, 0]),
                                 torch.from_numpy(coords[:, 1]),
                                 m=9, n=9, pad_id=-1, pad_field_value=0)
    var_list = [torch.from_numpy(fields[:, :, i]) for i in range(F)]
    padded, index_map = ref_part.create_partitions(var_list)

    part = build_partition_index(coords, 9, 9)
    got = patchify(part, fields)  # [T, P, C, F]

    assert len(padded) == part.num_patches
    for p, ((ref_coords, ref_fields), ref_idx) in enumerate(
            zip(padded, index_map)):
        # Same padded cell count.
        assert ref_fields.shape[1] == part.cells_per_patch, p
        # Same index map (incl. pad_id slots).
        np.testing.assert_array_equal(ref_idx.numpy(), part.index_map[p])
        # Same coords.
        np.testing.assert_allclose(ref_coords.numpy(), part.coords[p],
                                   atol=0)
        # Same field values: reference fields are [T, C, F].
        np.testing.assert_allclose(ref_fields.numpy(), got[:, p], atol=0)


def test_partitioner3d_matches_reference():
    from utils.data_processors import DataPartitioner3D
    from sea_tpu.data.partitioner import build_partition_index, patchify

    rng = np.random.RandomState(1)
    N, T, F = 250, 3, 2
    coords = rng.rand(N, 3).astype(np.float32)
    fields = rng.randn(T, N, F).astype(np.float32)

    var_list = [torch.from_numpy(fields[:, :, i]) for i in range(F)]
    ref_part = DataPartitioner3D(torch.from_numpy(coords[:, 0]),
                                 torch.from_numpy(coords[:, 1]),
                                 torch.from_numpy(coords[:, 2]),
                                 var_list, m=5, n=5, k=5,
                                 pad_id=-1, pad_field_value=0)
    padded, index_map = ref_part.create_partitions()

    part = build_partition_index(coords, 5, 5, 5)
    got = patchify(part, fields)

    for p, ((ref_coords, ref_fields), ref_idx) in enumerate(
            zip(padded, index_map)):
        np.testing.assert_array_equal(ref_idx.numpy(), part.index_map[p])
        np.testing.assert_allclose(ref_fields.numpy(), got[:, p], atol=0)


def test_temporal_dataset_windows_match_reference():
    from utils.data_processors import TemporalDataset
    from sea_tpu.data.datasets import make_temporal_windows

    rng = np.random.RandomState(2)
    tr, T, G, E = 3, 21, 2, 8
    latents = rng.randn(tr, T, G, E).astype(np.float32)
    originals = rng.randn(tr, T, 10, 3).astype(np.float32)
    ib = rng.randn(tr, T, 1).astype(np.float32)
    L = 10

    ref_ds = TemporalDataset(
        [torch.from_numpy(latents[i]) for i in range(tr)],
        [torch.from_numpy(originals[i]) for i in range(tr)],
        [torch.from_numpy(ib[i]) for i in range(tr)],
        src_len=L, overlap=0)

    ours = make_temporal_windows(latents, originals, ib, src_len=L)
    # Reference yields T//L windows per trajectory; the second window per
    # trajectory (start=10, end=21) is valid here, so counts match.
    assert len(ours) == len(ref_ds)
    for i in range(len(ref_ds)):
        src, tgt, tgt_orig, fib = ref_ds[i]
        np.testing.assert_allclose(ours.src[i], src.numpy(), atol=0)
        np.testing.assert_allclose(ours.tgt[i], tgt.numpy(), atol=0)
        np.testing.assert_allclose(ours.tgt_original[i], tgt_orig.numpy(),
                                   atol=0)
        np.testing.assert_allclose(ours.ib[i], fib.numpy(), atol=0)


def test_split_indices_match_reference():
    """Same RNG protocol as train_encoder.py:89-105."""
    from sea_tpu.data.datasets import split_indices
    total, tf, vf, seed = 100, 0.8, 0.1, 42
    np.random.seed(seed)
    idx = np.arange(total)
    np.random.shuffle(idx)
    tl = int(np.round(total * tf))
    vl = int(np.round(total * vf))
    ref = (idx[:tl], idx[tl:tl + vl], idx[tl + vl:])
    got = split_indices(total, tf, vf, seed)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_latent_transform_matches_reference():
    from utils.train_utils import (inverse_transform_processed_data,
                                   transform_processed_data)
    from sea_tpu.data.latents import (inverse_transform_latents,
                                      transform_latents_to_temporal)
    rng = np.random.RandomState(3)
    tr, T, P, G, D = 2, 4, 6, 2, 5
    lat = rng.randn(tr * T, P, G, D).astype(np.float32)
    ref = transform_processed_data(torch.from_numpy(lat), tr, T, P, G)
    got = transform_latents_to_temporal(lat, tr, T, P, G)
    np.testing.assert_allclose(got, ref.numpy(), atol=0)
    back_ref = inverse_transform_processed_data(ref, tr, T, P, G)
    back_got = inverse_transform_latents(got, P)
    np.testing.assert_allclose(back_got, back_ref.numpy(), atol=0)
