"""Property-based invariants (hypothesis): the partition round-trip and
window slicing must hold for arbitrary mesh/field shapes, not just the
fixed fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sea_tpu.data.partitioner import (build_partition_index, patchify,
                                      unpatchify)
from sea_tpu.data.datasets import make_temporal_windows, split_indices


@settings(max_examples=25, deadline=None)
@given(n_nodes=st.integers(2, 300), m=st.integers(2, 12),
       n=st.integers(2, 12), t=st.integers(1, 5), f=st.integers(1, 4),
       seed=st.integers(0, 10_000))
def test_partition_roundtrip_property(n_nodes, m, n, t, f, seed):
    rng = np.random.RandomState(seed)
    coords = rng.rand(n_nodes, 2).astype(np.float32) * rng.rand(2) * 10
    fields = rng.randn(t, n_nodes, f).astype(np.float32)
    part = build_partition_index(coords, m, n)
    assert part.num_patches == (m - 1) * (n - 1)
    recon = unpatchify(part, patchify(part, fields))
    np.testing.assert_allclose(recon, fields, atol=1e-6)
    # Every node appears exactly once.
    valid_idx = part.index_map[part.valid_mask]
    assert len(valid_idx) == n_nodes
    assert len(np.unique(valid_idx)) == n_nodes


@settings(max_examples=25, deadline=None)
@given(t=st.integers(3, 40), src_len=st.integers(1, 20),
       overlap=st.integers(0, 10), tr=st.integers(1, 3))
def test_window_slicing_property(t, src_len, overlap, tr):
    if overlap >= src_len:
        overlap = src_len - 1
    rng = np.random.RandomState(0)
    lat = rng.randn(tr, t, 2, 4).astype(np.float32)
    orig = rng.randn(tr, t, 5, 3).astype(np.float32)
    ib = rng.randn(tr, t, 1).astype(np.float32)
    try:
        w = make_temporal_windows(lat, orig, ib, src_len, overlap)
    except ValueError:
        return  # no valid windows for this combination — acceptable
    # Next-step alignment: tgt[w, i] == src[w, i+1] wherever windows overlap
    np.testing.assert_array_equal(w.src[:, 1:], w.tgt[:, :-1])
    assert w.src.shape == w.tgt.shape
    assert w.ib.shape[:2] == w.src.shape[:2]


@settings(max_examples=20, deadline=None)
@given(total=st.integers(3, 500),
       tf=st.floats(0.1, 0.8), vf=st.floats(0.05, 0.2),
       seed=st.integers(0, 1000))
def test_split_partition_property(total, tf, vf, seed):
    tr, va, te = split_indices(total, tf, vf, seed)
    allidx = np.concatenate([tr, va, te])
    assert len(allidx) == total
    assert len(np.unique(allidx)) == total  # a true partition
