"""The reference's on-disk data contract: field_data.npy / coordinates.npy /
input_data.npy loaded by path from the config (train_encoder.py:14-44).
Exercises the real file-loading path end-to-end (everything else uses
in-memory arrays)."""

import dataclasses

import numpy as np
import pytest

from sea_tpu.configs.base import (CaseConfig, MeshConfig, RunConfig,
                                  SpatialModelConfig, SplitConfig,
                                  TemporalModelConfig, TrainConfig)
from sea_tpu.data.synthetic import cylinder_like, write_dataset


def test_train_from_files(tmp_path):
    from sea_tpu.train.train_spatial import train as train_spatial

    fields, coords, ib = cylinder_like(tr=3, T=6, n_nodes=100)
    data_dir = tmp_path / "data"
    write_dataset(str(data_dir), fields, coords, ib)

    case = CaseConfig(
        mesh=MeshConfig(m=3, n=3),
        spatial=SpatialModelConfig(field_groups=((0, 1), (2,)),
                                   mlp_hidden=8, num_layers=1, embed_dim=4,
                                   n_heads=2, block_size=32),
        temporal=TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                                     scale_ratio=2, num_fields=2),
        spatial_train=TrainConfig(batch_size=4, epoch_num=1,
                                  validation_interval=1),
        run=RunConfig(save_dir=str(tmp_path),
                      field_data_path=str(data_dir / "field_data.npy"),
                      coordinates_path=str(data_dir / "coordinates.npy"),
                      input_path=str(data_dir / "input_data.npy")))
    # No data= argument: the driver must read the files.
    params, sd = train_spatial(case)
    assert sd.train.shape[1] == 4  # P = 4 patches


def test_load_array_formats(tmp_path):
    from sea_tpu.data.io import load_array
    a = np.arange(6.0).reshape(2, 3)
    np.save(tmp_path / "a.npy", a)
    np.testing.assert_array_equal(load_array(str(tmp_path / "a.npy")), a)
    np.savez(tmp_path / "a.npz", data=a)
    np.testing.assert_array_equal(load_array(str(tmp_path / "a.npz")), a)
    torch = pytest.importorskip("torch")
    torch.save(torch.from_numpy(a), tmp_path / "a.pt")
    np.testing.assert_array_equal(load_array(str(tmp_path / "a.pt")), a)
    with pytest.raises(ValueError):
        load_array(str(tmp_path / "a.csv"))


def test_spatial_three_field_groups():
    """G=3 spatial model ([[0],[1],[2]]) — the multiphase-style grouping
    where every field has its own latent stream."""
    import jax
    from sea_tpu.models.spatial import init_spatial, spatial_forward
    cfg = SpatialModelConfig(field_groups=((0,), (1,), (2,)), mlp_hidden=8,
                             num_layers=1, embed_dim=4, n_heads=2,
                             block_size=32, n_inp=7)
    params = init_spatial(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 7))
    out = spatial_forward(params, cfg, x)
    assert out.shape == x.shape
    assert len(params["encoders"]) == 3 and len(params["decoders"]) == 3


def test_cli_loads_reference_pt_checkpoint(tmp_path):
    """The CLI checkpoint loader must accept reference torch .pt state
    dicts directly (user-migration path)."""
    torch = pytest.importorskip("torch")
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.temporal import TemporalModel
    from sea_tpu.cli import _load_any_checkpoint
    from sea_tpu.utils.torch_compat import (state_dict_to_numpy,
                                            temporal_params_from_torch)

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=2,
                              down_proj=2, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="ln")
    torch.manual_seed(0)
    ref = TemporalModel(num_layers=1, embed_dim=16, n_heads=2, max_len=16,
                        scale_ratio=2, src_len=0, num_variables=2,
                        down_proj=2, dropout=0.0, exchange_mode="sea",
                        pos_encoding_mode="learnable", ib_scale_mode="mlp",
                        ib_addition_mode="add", ib_mlp_layers=1, ib_num=1,
                        add_info_after_cross=True, LN_type="ln")
    path = str(tmp_path / "ref.pt")
    torch.save(ref.state_dict(), path)

    loaded = _load_any_checkpoint(path, None, cfg, kind="temporal")
    expected = temporal_params_from_torch(
        state_dict_to_numpy(ref.state_dict()), cfg)
    import jax
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(expected)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
