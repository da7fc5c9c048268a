"""End-to-end parity harness: reference (PyTorch) vs SEA-TPU on identical
synthetic data with identical weights.

SURVEY §7.8: "a parity harness that runs reference and rebuild on identical
synthetic data and compares layer outputs and end metrics (<=5% rel-L2)".

Pipeline compared, stage by stage:
 1. partition/patchify           (byte-identical expected)
 2. frozen spatial encode        (f32 tolerance)
 3. temporal teacher-forced pass (f32 tolerance)
 4. autoregressive rollout       (scan engine vs reference loop)
 5. decode + unpatch -> decoded fields and rel-MSE-vs-truth end metric

Usage:  python tools/run_parity.py   (CPU; prints a report, exits nonzero
on any stage exceeding tolerance)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")  # read-only mounted reference

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

FAILS = []


def check(name, ours, theirs, tol):
    ours = np.asarray(ours, dtype=np.float32)
    theirs = np.asarray(theirs, dtype=np.float32)
    denom = np.abs(theirs).max() + 1e-12
    rel = float(np.abs(ours - theirs).max() / denom)
    status = "OK " if rel <= tol else "FAIL"
    if rel > tol:
        FAILS.append(name)
    print(f"  [{status}] {name:40s} rel-max-diff {rel:.2e} (tol {tol:.0e})")


def main():
    from sea_tpu.configs.base import SpatialModelConfig, TemporalModelConfig
    from sea_tpu.data.partitioner import build_partition_index, patchify
    from sea_tpu.data.synthetic import cylinder_like
    from sea_tpu.models.spatial import spatial_decode, spatial_encode
    from sea_tpu.models.temporal import temporal_forward
    from sea_tpu.rollout.engine import rollout_scan
    from sea_tpu.utils.torch_compat import (spatial_params_from_torch,
                                            state_dict_to_numpy,
                                            temporal_params_from_torch)
    from models.encoder_decoder import SpatialModel
    from models.temporal import TemporalModel
    from utils.data_processors import DataPartitioner2D

    print("== SEA parity harness (reference torch vs SEA-TPU) ==")
    fields, coords, ib = cylinder_like(tr=2, T=10, n_nodes=200, seed=0)
    tr, T, N, F = fields.shape
    snapshots = fields.reshape(tr * T, N, F)

    # --- 1. partition ---
    m = n = 5
    part = build_partition_index(coords.T, m, n)
    ours_patched = patchify(part, snapshots)  # [B, P, C, F]
    ref_part = DataPartitioner2D(torch.from_numpy(coords[0]),
                                 torch.from_numpy(coords[1]), m=m, n=n)
    padded, _ = ref_part.create_partitions(
        [torch.from_numpy(snapshots[:, :, i]) for i in range(F)])
    ref_patched = torch.stack([p[1] for p in padded], dim=1).numpy()
    check("partition/patchify", ours_patched, ref_patched, 0.0)

    P, C = part.num_patches, part.cells_per_patch
    tokens = np.ascontiguousarray(ours_patched.transpose(0, 1, 3, 2))

    # --- 2. spatial model (identical weights) ---
    scfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=32,
                              num_layers=2, embed_dim=8, n_heads=2,
                              block_size=64, dropout=0.0, n_inp=C)
    torch.manual_seed(0)
    ref_spatial = SpatialModel(field_groups=[[0, 1], [2]], n_inp=C,
                               MLP_hidden=32, num_layers=2, embed_dim=8,
                               n_heads=2, max_len=64, src_len=0,
                               dropout=0.0).eval()
    sp = spatial_params_from_torch(
        state_dict_to_numpy(ref_spatial.state_dict()), scfg)
    with torch.no_grad():
        ref_z = ref_spatial.encode(torch.from_numpy(tokens)).numpy()
    ours_z = np.asarray(spatial_encode(sp, scfg, jnp.asarray(tokens)))
    check("frozen spatial encode", ours_z, ref_z, 1e-4)

    # --- 3/4. temporal model + rollout (identical weights) ---
    E = P * scfg.embed_dim
    tcfg = TemporalModelConfig(num_layers=1, embed_dim=E, n_heads=2,
                               block_size=64, scale_ratio=2, num_fields=2,
                               down_proj=2, dropout=0.0, exchange_mode="sea",
                               ib_scale_mode="mlp", ib_addition_mode="add",
                               ln_type="adaln")
    torch.manual_seed(1)
    ref_temporal = TemporalModel(
        num_layers=1, embed_dim=E, n_heads=2, max_len=64, scale_ratio=2,
        src_len=0, num_variables=2, down_proj=2, dropout=0.0,
        exchange_mode="sea", pos_encoding_mode="learnable",
        ib_scale_mode="mlp", ib_addition_mode="add", ib_mlp_layers=1,
        ib_num=1, add_info_after_cross=True, LN_type="adaln").eval()
    tp = temporal_params_from_torch(
        state_dict_to_numpy(ref_temporal.state_dict()), tcfg)

    lat = ours_z.reshape(tr, T, P, 2, scfg.embed_dim)
    lat = lat.transpose(0, 1, 3, 2, 4).reshape(tr, T, 2, E)
    src = lat[:, :-1]
    ib_w = ib[:, :-1]

    with torch.no_grad():
        ref_tf = ref_temporal(torch.from_numpy(src),
                              torch.from_numpy(ib_w)).numpy()
    ours_tf = np.asarray(temporal_forward(tp, tcfg, jnp.asarray(src),
                                          jnp.asarray(ib_w)))
    check("temporal teacher-forced", ours_tf, ref_tf, 1e-4)

    with torch.no_grad():
        autoreg = torch.from_numpy(src[:, 0:1])
        tib = torch.from_numpy(ib_w)
        for i in range(T - 1):
            out = ref_temporal(autoreg, tib[:, : i + 1])
            autoreg = torch.cat((autoreg, out[:, -1:]), dim=1)
        ref_roll = autoreg[:, 1:].numpy()
    ours_roll = np.asarray(rollout_scan(tp, tcfg, jnp.asarray(src[:, 0]),
                                        jnp.asarray(ib_w)))
    check("autoregressive rollout", ours_roll, ref_roll, 5e-4)

    # --- 5. decode + end metric ---
    def decode_ours(roll):
        z = roll.reshape(tr, T - 1, 2, P, scfg.embed_dim)
        z = z.transpose(0, 1, 3, 2, 4).reshape(-1, P, 2, scfg.embed_dim)
        return np.asarray(spatial_decode(sp, scfg, jnp.asarray(z)))

    def decode_ref(roll):
        z = roll.reshape(tr, T - 1, 2, P, scfg.embed_dim)
        z = np.ascontiguousarray(z.transpose(0, 1, 3, 2, 4)).reshape(
            -1, P, 2, scfg.embed_dim)
        with torch.no_grad():
            return ref_spatial.decode(torch.from_numpy(z)).numpy()

    ours_dec = decode_ours(ours_roll)
    ref_dec = decode_ref(ref_roll)
    check("decoded rollout fields", ours_dec, ref_dec, 1e-3)

    # End metric: decoded rel-MSE against truth, both sides.
    truth = tokens.reshape(tr, T, P, 3, C)[:, 1:].reshape(-1, P, 3, C)
    def rel_mse(dec):
        num = ((dec - truth) ** 2).sum()
        return float(num / ((truth ** 2).sum() + 1e-8))
    ours_metric = rel_mse(ours_dec)
    ref_metric = rel_mse(ref_dec)
    delta = abs(ours_metric - ref_metric) / (abs(ref_metric) + 1e-12)
    status = "OK " if delta <= 0.05 else "FAIL"
    if delta > 0.05:
        FAILS.append("end metric")
    print(f"  [{status}] {'end metric: decoded rel-MSE':40s} "
          f"ours {ours_metric:.6f} ref {ref_metric:.6f} "
          f"(rel delta {delta:.2e}, tol 5e-2)")

    if FAILS:
        print(f"PARITY FAILURES: {FAILS}")
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
