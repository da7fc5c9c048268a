"""3D mesh end-to-end: partition, spatial training, temporal training with
rollout eval — the full two-stage pipeline on a 3D case."""

import numpy as np
import pytest

from sea_tpu.configs.base import (CaseConfig, MeshConfig, RunConfig,
                                  SpatialModelConfig, SplitConfig,
                                  TemporalModelConfig, TrainConfig)
from sea_tpu.data.synthetic import channel3d_like


def case_3d(tmp_path) -> CaseConfig:
    mesh = MeshConfig(dimension="3D", m=3, n=3, k=3)  # P = 8
    spatial = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=16,
                                 num_layers=1, embed_dim=4, n_heads=2,
                                 block_size=64)
    temporal = TemporalModelConfig(num_layers=1, embed_dim=32, n_heads=2,
                                   block_size=64, scale_ratio=2,
                                   num_fields=2, down_proj=2, dropout=0.0,
                                   exchange_mode="sea", ib_scale_mode="mlp",
                                   ib_addition_mode="add", ln_type="adaln")
    return CaseConfig(
        mesh=mesh, spatial=spatial, temporal=temporal,
        temporal_split=SplitConfig(train_fraction=0.5, val_fraction=0.25),
        spatial_train=TrainConfig(batch_size=8, epoch_num=1,
                                  validation_interval=1),
        temporal_train=TrainConfig(batch_size=1, eval_batch_size=2,
                                   epoch_num=2, validation_interval=2,
                                   full_eval_interval=2, dataset_src_len=7),
        run=RunConfig(save_dir=str(tmp_path), case_name="channel3d"))


@pytest.mark.heavy
def test_3d_two_stage_pipeline(tmp_path):
    from sea_tpu.train.train_spatial import train as train_spatial
    from sea_tpu.train.train_temporal import train as train_temporal

    synth = channel3d_like(tr=4, T=8, n_nodes=200)
    case = case_3d(tmp_path)
    sparams, sdata = train_spatial(case, data=synth)
    assert sdata.mesh_processor.num_patches == 8
    tparams, tdata = train_temporal(case, data=synth, spatial_params=sparams)
    # Full eval (runs at epoch 2) must have produced 3D plots + CSV.
    import os
    assert os.path.exists(
        os.path.join(tmp_path, "rollout_error_channel3d_run1.csv"))
    plots = [f for f in os.listdir(tmp_path)
             if f.startswith("temporal_decoded_data_")]
    assert plots, "3D field plots missing"
