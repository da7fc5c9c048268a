"""Quantify reduced-precision weight drift on TRAINED demo weights
(--case cylinder_flow or multiphase_flow).

bench.py's headline uses weight-only bf16 casting (utils/precision.py:
cast_weights_bf16 — big matmul weights in bf16, norms/biases/softmax/loss
in f32). This tool justifies that headline by measuring the END metric the
reference cares about (decoded relative MSE, utils/train_utils.py:124-150)
with f32 weights vs bf16 weights on the round-1 demo's trained checkpoints,
plus the latent-space rel-L2 deviation between the two rollouts.

Usage:
    python tools/measure_bf16_drift.py [--save_dir /tmp/qrun] [--cpu]
                                       [--dtype bf16|int8|int4]

--dtype int8 measures the serving-mode weight-only int8 quantization
(utils/precision.py: quantize_weights_int8) instead of bf16.

Requires the round-1 demo checkpoints in --save_dir:
    encoder_decoder_cylinder_flow_run1.npz, temporal_cylinder_flow_run1.npz
Prints one JSON object with both decoded rel-MSE values, their relative
difference, and the latent drift.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", default="/tmp/qrun")
    ap.add_argument("--case", choices=["cylinder_flow", "multiphase_flow"],
                    default="cylinder_flow",
                    help="which shipped preset's trained checkpoints to "
                         "measure (expects temporal_{case}_{run}.npz in "
                         "--save_dir)")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--dtype", choices=["bf16", "int8", "int4"],
                    default="bf16")
    ap.add_argument("--int4_scaling", choices=["mse", "max", "cal"],
                    default="mse",
                    help="int4 only: per-column scale selection — 'mse' "
                         "(the shipped clip search), 'max' (plain "
                         "column-max, for A/B'ing the improvement on "
                         "trained weights), or 'cal' (activation-aware: "
                         "calibrate E[x^2]/E[x] on train-split windows, "
                         "weighted clip search + bias correction — "
                         "utils/calibration.py)")
    ap.add_argument("--no_bias_correct", action="store_true",
                    help="with --int4_scaling cal: weighted clip search "
                         "only (decomposes the calibration A/B)")
    ap.add_argument("--kv_cache", choices=["auto", "f32", "bf16", "int8"],
                    default="auto",
                    help="override the serving KV-cache dtype for the "
                         "reduced leg (auto = bf16 iff int4 weights). "
                         "int8 = per-token-scaled quantized caches; "
                         "measures the CACHE quantization drift on the "
                         "trained checkpoint")
    ap.add_argument("--e2e", action="store_true",
                    help="end-to-end serving drift: reduce the stage-1 "
                         "DECODE weights too and evaluate through the fused "
                         "on-device program (what `temporal test "
                         "--precision ...` runs)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from sea_tpu.cli import get_case, _load_data
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout
    from sea_tpu.train.evaluate import full_autoregressive_evaluation
    from sea_tpu.train.train_temporal import process_data
    from sea_tpu.utils.checkpoint import checkpoint_path, load_params
    from sea_tpu.utils.precision import (cast_weights_bf16,
                                         quantize_weights_int4,
                                         quantize_weights_int8)

    case = get_case(args.case)
    case = case.replace(run=dataclasses.replace(case.run,
                                                save_dir=args.save_dir))
    data = _load_data(case, synthetic=True)
    tr, T = data[0].shape[:2]
    tt = case.temporal_train
    n_train = max(1, int(round(tr * case.temporal_split.train_fraction)))
    case = case.replace(temporal_train=dataclasses.replace(
        tt, dataset_src_len=min(tt.dataset_src_len, T - 1),
        batch_size=min(tt.batch_size, n_train)))

    td = process_data(case, data=data)
    template = init_temporal(jax.random.PRNGKey(0), case.temporal)
    ckpt = checkpoint_path(args.save_dir, "temporal",
                           case.run.case_name, case.run.run_name)
    params = load_params(ckpt, template)

    import functools

    from sea_tpu.utils.precision import fuse_attention_projections
    int4_scale = "mse" if args.int4_scaling == "cal" else args.int4_scaling
    reduce = {"int8": quantize_weights_int8,
              "int4": functools.partial(quantize_weights_int4,
                                        scale=int4_scale),
              "bf16": cast_weights_bf16}[args.dtype]
    # measure the exact single-chip serving configuration, which fuses
    # the attention projections before the dtype transform (cli.py)
    fused = fuse_attention_projections(params)
    if args.dtype == "int4" and args.int4_scaling == "cal":
        # activation-aware: stats from train-split teacher-forced windows
        # on the fused (serving) layout, then weighted clip search + bias
        # correction (utils/calibration.py docstring)
        from sea_tpu.utils.calibration import calibrate_temporal
        n_cal = min(4, td.train.src.shape[0])
        stats = calibrate_temporal(
            fused, case.temporal,
            [(td.train.src[:n_cal], td.train.ib[:n_cal])])
        params_bf16 = quantize_weights_int4(
            fused, act_stats=stats,
            bias_correct=not args.no_bias_correct)
    else:
        params_bf16 = reduce(fused)
    # Measure the exact serving configuration: int4 serves with bf16 KV
    # caches (rollout/engine.rollout docstring), the rest with f32;
    # --kv_cache overrides (int8 = per-token-scaled planes).
    if args.kv_cache == "auto":
        cache_dtype = jnp.bfloat16 if args.dtype == "int4" else jnp.float32
    else:
        cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                       "int8": jnp.int8}[args.kv_cache]
    if args.e2e:
        from sea_tpu.train.evaluate import fused_autoregressive_evaluation
        res_f32 = fused_autoregressive_evaluation(
            params, case, td.test, td.latent_service, td.mesh_processor,
            save_artifacts=False)
        res_bf16 = fused_autoregressive_evaluation(
            params_bf16, case, td.test, td.latent_service,
            td.mesh_processor,
            spatial_params=reduce(td.latent_service.params),
            save_artifacts=False, cache_dtype=cache_dtype)
    else:
        res_f32 = full_autoregressive_evaluation(
            params, case, td.test, td.latent_service, td.mesh_processor,
            save_artifacts=False)
        res_bf16 = full_autoregressive_evaluation(
            params_bf16, case, td.test, td.latent_service, td.mesh_processor,
            save_artifacts=False, cache_dtype=cache_dtype)

    # Latent drift: rel-L2 between the two rollouts themselves. NOTE this
    # is chaos-amplified — over an autoregressive horizon two models with
    # tiny per-step differences diverge exponentially, so it measures
    # "same trajectory", not fidelity. The teacher-forced rel-L2 below is
    # the chaos-free per-step fidelity metric (measured 2026-08-19: int4
    # 'cal' cut tf drift 7.8% -> 2.8% while its latent rollout rel-L2
    # went UP — the decoded-vs-ground-truth metric agreed with tf).
    src = jnp.asarray(td.test.src)
    ib = jnp.asarray(td.test.ib)
    p32 = rollout(params, case.temporal, src[:, 0], ib)
    p16 = rollout(params_bf16, case.temporal, src[:, 0], ib,
                  cache_dtype=cache_dtype)
    num = jnp.sqrt(jnp.sum((p32 - p16) ** 2))
    den = jnp.sqrt(jnp.sum(p32 ** 2)) + 1e-8
    latent_rel_l2 = float(num / den)

    # Teacher-forced per-step drift (no autoregression: same inputs into
    # both models, compare outputs).
    from sea_tpu.models.temporal import temporal_forward
    tf32 = temporal_forward(params, case.temporal, src, ib)
    tf16 = temporal_forward(params_bf16, case.temporal, src, ib)
    tf_rel_l2 = float(jnp.linalg.norm(tf16 - tf32)
                      / (jnp.linalg.norm(tf32) + 1e-8))

    d32 = res_f32["decoded_rel_mse"]
    d16 = res_bf16["decoded_rel_mse"]
    tag = args.dtype + "w"
    print(json.dumps({
        "dtype": tag + ("_e2e" if args.e2e else ""),
        "rollout_steps": int(ib.shape[1]),
        "test_trajectories": int(src.shape[0]),
        "decoded_rel_mse_f32": round(d32, 6),
        f"decoded_rel_mse_{tag}": round(d16, 6),
        "decoded_rel_mse_rel_change": round((d16 - d32) / (abs(d32) + 1e-12),
                                            6),
        "encoded_rel_mse_f32": round(res_f32["encoded_rel_mse"], 6),
        f"encoded_rel_mse_{tag}": round(res_bf16["encoded_rel_mse"], 6),
        f"latent_rollout_rel_l2_f32_vs_{tag}": round(latent_rel_l2, 6),
        f"teacher_forced_rel_l2_f32_vs_{tag}": round(tf_rel_l2, 6),
    }))


if __name__ == "__main__":
    main()
