"""Command-line entry point.

Mirror of reference main.py:
    python -m sea_tpu.cli <flow_type> {encoder,temporal} {train,test}
        [--model_path PATH] [--epochs N] [--synthetic]
        [--mesh auto|none|DxM] [--seq_parallel N] [--pp S] [--precision ...]

- flow_type selects a config module from sea_tpu.configs by name via
  importlib (main.py:23-38 behavior).
- encoder train/test and temporal train/test route exactly like
  main.py:62-124, including final_save and model-path overrides.
- --synthetic generates in-memory synthetic data instead of reading the
  configured .npy paths (the reference repo ships no data).

Multi-chip (no reference equivalent — SURVEY §2.10): training modes run
SPMD over a jax.sharding.Mesh. By default (--mesh auto) every visible
device joins a data-parallel mesh; --mesh DxM adds tensor-parallel
attention sharding over the model axis; --seq_parallel N shards the TIME
axis over an N-device ring (ring attention). jax.distributed is
initialized at entry, so the same command line works on a multi-host pod.
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib
import sys



def get_case(flow_type: str):
    import importlib.util
    try:
        spec = importlib.util.find_spec(f"sea_tpu.configs.{flow_type}")
    except (ModuleNotFoundError, ValueError):
        spec = None  # e.g. a dotted or otherwise malformed flow_type
    if spec is None:
        print(f"Error: no config module named '{flow_type}' in "
              f"sea_tpu.configs (expected e.g. cylinder_flow, "
              f"multiphase_flow).")
        sys.exit(1)
    # Import errors raised *inside* a valid config module (e.g. a missing
    # dependency) propagate with their real traceback.
    module = importlib.import_module(f"sea_tpu.configs.{flow_type}")
    if not hasattr(module, "get_case"):
        print(f"Error: config module '{flow_type}' defines no get_case() "
              f"entry point.")
        sys.exit(1)
    return module.get_case()


def _load_data(case, synthetic: bool):
    if synthetic:
        from sea_tpu.data.synthetic import cylinder_like, multiphase_like
        gen = (multiphase_like if "multiphase" in case.run.case_name
               else cylinder_like)
        # tr=8: the temporal train split (fraction 0.6 -> 5 trajectories =
        # 5 windows) must cover at least one batch even when the batch is
        # rounded up for a --mesh data axis of 4.
        return gen(tr=8, T=41, n_nodes=800, seed=case.spatial_split.random_seed)
    return None  # drivers read the configured paths


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train or test SEA-TPU models")
    parser.add_argument("flow_type",
                        help="e.g. cylinder_flow, multiphase_flow")
    parser.add_argument("model_type", choices=["encoder", "temporal"])
    parser.add_argument("mode", choices=["train", "test", "generate"])
    parser.add_argument("--model_path", required=False,
                        help="checkpoint to load (test / continue-train)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override config epoch_num")
    parser.add_argument("--synthetic", action="store_true",
                        help="use generated synthetic data")
    parser.add_argument("--save_dir", default=None)
    parser.add_argument("--precision",
                        choices=["f32", "bf16", "int8", "int4"],
                        default="f32",
                        help="serving precision for `temporal test`: bf16 "
                             "casts the big matmul weights, int8/int4 "
                             "quantize them per-output-channel (quantify "
                             "drift with tools/measure_bf16_drift.py "
                             "first; int4's grid is 16x coarser)")
    parser.add_argument("--no_calibrate", action="store_true",
                        help="disable the default activation-aware int4 "
                             "calibration (weighted scales + bias "
                             "correction from a few train windows)")
    parser.add_argument("--kv_cache", choices=["auto", "f32", "bf16", "int8"],
                        default="auto",
                        help="serving KV-cache storage dtype: 'auto' = the "
                             "measured policy (bf16 iff --precision int4, "
                             "f32 otherwise; BASELINE.md cache-dtype A/B); "
                             "'int8' stores per-token-scaled int8 planes — "
                             "halves the dominant HBM stream of BATCHED "
                             "serving (cache-traffic-bound at B>=4)")
    parser.add_argument("--drift_budget", type=float, default=0.05,
                        metavar="REL_L2",
                        help="int8/int4 serving: abort when the loaded "
                             "checkpoint's teacher-forced rel-L2 drift vs "
                             "f32 exceeds this (measured on two test "
                             "windows at load time; default 0.05)")
    parser.add_argument("--no_drift_check", action="store_true",
                        help="skip the per-checkpoint quantization drift "
                             "gate (serve regardless of measured drift)")
    parser.add_argument("--mesh", default="auto",
                        help="device mesh for train modes: 'auto' (all "
                             "visible devices data-parallel when more than "
                             "one), 'none' (single device), or 'DxM' (data "
                             "x model/tensor-parallel, e.g. 4x2). Gradient "
                             "all-reduce and head-sharded attention ride "
                             "ICI via GSPMD collectives")
    parser.add_argument("--seq_parallel", type=int, default=0, metavar="N",
                        help="temporal train only: shard the TIME axis over "
                             "an N-device ring (ring attention with in-ring "
                             "dropout) — for windows that exceed one chip's "
                             "memory. Mutually exclusive with --mesh")
    parser.add_argument("--pp", type=int, default=0, metavar="S",
                        help="temporal train only: pipeline-parallel over S "
                             "stages (GPipe microbatching over a 'pipe' "
                             "mesh axis; parallel/pipeline.py) — for layer "
                             "stacks that exceed one chip's HBM. Requires "
                             "num_layers divisible by S; remaining devices "
                             "join a 'data' axis. Mutually exclusive with "
                             "--mesh/--seq_parallel")
    parser.add_argument("--pp_microbatches", type=int, default=0,
                        metavar="M",
                        help="with --pp: GPipe microbatches per step "
                             "(default = stage count S; the bubble fraction "
                             "is (S-1)/(M+S-1), so larger M improves "
                             "utilization while smaller M fits small "
                             "batches)")
    parser.add_argument("--compute_dtype",
                        choices=["f32", "bf16", "bf16_mixed", "bf16_shadow"],
                        default=None,
                        help="train modes: override the config's numerics "
                             "policy (TrainConfig.compute_dtype) for the "
                             "stage being trained. bf16_shadow = mixed "
                             "precision with a persistent bf16 weight copy "
                             "in the optimizer state — the recommended "
                             "big-model recipe together with --batch_size 8 "
                             "and --adam_mu_dtype bf16 (BASELINE.md MFU "
                             "rows)")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="train modes: override the config batch size "
                             "(larger batches amortize the fixed AdamW "
                             "state traffic — see BASELINE.md MFU scaling)")
    parser.add_argument("--adam_mu_dtype", choices=["f32", "bf16"],
                        default=None,
                        help="train modes: AdamW first-moment storage dtype "
                             "(TrainConfig.adam_mu_dtype); bf16 halves the "
                             "first-moment HBM traffic")
    parser.add_argument("--optimizer", choices=["adamw", "adafactor"],
                        default=None,
                        help="train modes: optimizer family "
                             "(TrainConfig.optimizer). adafactor factors "
                             "the second moment and drops the first — "
                             "near-zero optimizer-state HBM traffic, the "
                             "big-model step's largest cost (BASELINE.md)")
    parser.add_argument("--horizon", type=int, default=None, metavar="H",
                        help="`temporal generate`: number of rollout steps "
                             "to simulate — NOT tied to any dataset window "
                             "(conditioning beyond the data holds the "
                             "trajectory's last ib value). Memory scales "
                             "linearly in H (scan+KV engine, no [T,T] "
                             "mask). Default: the dataset window length")
    parser.add_argument("--trajectory", type=int, default=0, metavar="IDX",
                        help="`temporal generate`: which test-split window "
                             "provides the initial latent state and ib "
                             "conditioning (default 0)")
    parser.add_argument("--output", default=None, metavar="PATH",
                        help="`temporal generate`: .npy path for the "
                             "decoded fields [H, nodes, fields] (default "
                             "{save_dir}/generated_{case}_{run}.npy)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="train modes: capture a jax.profiler device "
                             "trace (TensorBoard/Perfetto) of one steady-"
                             "state training epoch into DIR — the tool for "
                             "chasing MFU (BASELINE.md methodology)")
    parser.add_argument("--seed", type=int, default=None,
                        help="override the configs' random_seed for both "
                             "the spatial and temporal splits, and seed "
                             "every host-side RNG (python random / numpy / "
                             "torch — reference main.py:14-21 set_seed). "
                             "Model init and dropout keys derive from the "
                             "same value")
    parser.add_argument("--platform", choices=["default", "cpu", "tpu"],
                        default="default",
                        help="force the JAX backend before any device "
                             "access. Unlike the JAX_PLATFORMS env var "
                             "(which launcher environments may rewrite to "
                             "'tpu,cpu' priority lists), this pins exactly "
                             "one backend — e.g. --platform cpu keeps a "
                             "smoke run off an unreachable TPU tunnel")
    args = parser.parse_args(argv)
    if args.platform != "default":
        # Must precede initialize_multihost()/mesh resolution: the first
        # backend initialization is sticky for the process.
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.batch_size is not None and args.batch_size < 1:
        parser.error(f"--batch_size must be >= 1; got {args.batch_size}")
    if (args.compute_dtype or args.batch_size is not None
            or args.adam_mu_dtype or args.optimizer) and args.mode != "train":
        parser.error("--compute_dtype/--batch_size/--adam_mu_dtype/"
                     "--optimizer only apply to train modes (serving "
                     "precision is --precision)")
    if args.seq_parallel and (args.model_type, args.mode) != \
            ("temporal", "train"):
        parser.error("--seq_parallel only applies to `temporal train`")
    if args.pp:
        if (args.model_type, args.mode) != ("temporal", "train"):
            parser.error("--pp only applies to `temporal train`")
        if args.seq_parallel:
            parser.error("--pp and --seq_parallel are mutually exclusive")
        if args.pp < 2:
            parser.error(f"--pp needs at least 2 stages; got {args.pp}")
    if args.pp_microbatches and not args.pp:
        parser.error("--pp_microbatches requires --pp")
    if args.profile and args.mode != "train":
        parser.error("--profile only applies to train modes")
    if args.mode == "generate" and args.model_type != "temporal":
        parser.error("generate is a temporal (stage-2) serving mode")
    if args.mode != "generate" and (args.horizon is not None
                                    or args.trajectory != 0
                                    or args.output is not None):
        parser.error("--horizon/--trajectory/--output only apply to "
                     "`temporal generate`")
    if args.horizon is not None and args.horizon < 1:
        parser.error(f"--horizon must be >= 1; got {args.horizon}")
    if args.precision != "f32" and not (
            args.model_type == "temporal"
            and args.mode in ("test", "generate")):
        parser.error(
            f"--precision {args.precision} only applies to `temporal test` "
            "and `temporal generate` (rollout serving); training always "
            "runs the configured compute_dtype policy")

    # Multi-host (pod / multi-slice) init must precede any device access;
    # no-ops on single-process runs (parallel/multihost.py).
    from sea_tpu.parallel.multihost import initialize_multihost
    initialize_multihost()
    mesh, seq_mesh, pipe_mesh = _resolve_meshes(parser, args)

    case = get_case(args.flow_type)
    if args.seed is not None:
        from sea_tpu.utils.seeding import set_seed
        set_seed(args.seed)
        case = case.replace(
            spatial_split=dataclasses.replace(case.spatial_split,
                                              random_seed=args.seed),
            temporal_split=dataclasses.replace(case.temporal_split,
                                               random_seed=args.seed))
    if args.save_dir:
        case = case.replace(run=dataclasses.replace(case.run,
                                                    save_dir=args.save_dir))
    if args.compute_dtype or args.batch_size is not None \
            or args.adam_mu_dtype or args.optimizer:
        # Recipe overrides for the stage being trained. Applied BEFORE
        # checkpoint-template construction: compute_dtype selects the
        # optimizer wrapper (bf16_shadow carries state), so the resume
        # template must be built from the overridden config.
        from sea_tpu.utils.precision import POLICY_BY_FLAG
        stage = ("spatial_train" if args.model_type == "encoder"
                 else "temporal_train")
        tc = getattr(case, stage)
        updates = {}
        if args.compute_dtype:
            updates["compute_dtype"] = POLICY_BY_FLAG[args.compute_dtype]
        if args.batch_size is not None:
            updates["batch_size"] = args.batch_size
        if args.adam_mu_dtype:
            updates["adam_mu_dtype"] = ("bfloat16" if args.adam_mu_dtype
                                        == "bf16" else "float32")
        if args.optimizer:
            updates["optimizer"] = args.optimizer
        case = case.replace(**{stage: dataclasses.replace(tc, **updates)})
    data = _load_data(case, args.synthetic)
    if data is not None:
        # Synthetic data is smaller than the configured real datasets:
        # clamp dataset_src_len to T-1 so windowing stays valid, and the
        # batch size to the number of training trajectories so the train
        # split yields at least one full batch (drop_remainder batching).
        tr, T = data[0].shape[:2]
        tt = case.temporal_train
        n_train = max(1, int(round(tr * case.temporal_split.train_fraction)))
        case = case.replace(temporal_train=dataclasses.replace(
            tt,
            dataset_src_len=min(tt.dataset_src_len, T - 1),
            batch_size=min(tt.batch_size, n_train)))

    from sea_tpu.train.tracking import create_error_tracker
    tracker = create_error_tracker(
        use_wandb=case.run.use_wandb, project_name=case.run.project_name,
        run_name=f"{args.flow_type}_{args.model_type}_{args.mode}",
        save_dir=case.run.save_dir)

    if args.model_type == "encoder":
        from sea_tpu.train.train_spatial import train as train_spatial
        if args.mode == "train":
            init_params = None
            init_opt = None
            precomputed = None
            if args.model_path:
                import jax
                from sea_tpu.train.train_spatial import process_data as _pd
                # Preprocess once and hand the result to the driver —
                # the checkpoint template needs the derived n_inp.
                precomputed = _pd(case, data=data)
                from sea_tpu.models.spatial import init_spatial
                template = init_spatial(jax.random.PRNGKey(0),
                                        precomputed.spatial_cfg)
                init_params, init_opt = _load_train_checkpoint(
                    args.model_path, template, precomputed.spatial_cfg,
                    case.spatial_train, kind="spatial")
                print(f"Continuing training from model: {args.model_path}")
            params, sd = train_spatial(case, tracker, data=data,
                                       epochs=args.epochs,
                                       init_params=init_params,
                                       init_opt_state=init_opt,
                                       precomputed=precomputed, mesh=mesh,
                                       profile_dir=args.profile)
            if case.spatial_train.final_save:
                _final_save(case, "final_model_encoder", params)
        else:  # test
            from sea_tpu.train.evaluate import test_encoder_decoder
            from sea_tpu.train.train_spatial import process_data
            from sea_tpu.models.spatial import init_spatial
            from sea_tpu.utils import checkpoint as ckpt
            import jax
            sd = process_data(case, data=data)
            template = init_spatial(jax.random.PRNGKey(0), sd.spatial_cfg)
            path = args.model_path or ckpt.checkpoint_path(
                case.run.save_dir, "encoder_decoder", case.run.case_name,
                case.run.run_name)
            params = _load_any_checkpoint(path, template, sd.spatial_cfg,
                                          kind="spatial")
            print(f"Using pretrained encoder model: {path}")
            test_encoder_decoder(params, case, sd.test, sd.mesh_processor,
                                 spatial_cfg=sd.spatial_cfg)

    else:  # temporal
        from sea_tpu.train.train_temporal import train as train_temporal
        if args.mode == "train":
            init_params = None
            init_opt = None
            if args.model_path:
                import jax
                from sea_tpu.models.temporal import init_temporal
                template = init_temporal(jax.random.PRNGKey(0),
                                         case.temporal)
                init_params, init_opt = _load_train_checkpoint(
                    args.model_path, template, case.temporal,
                    case.temporal_train, kind="temporal")
                print(f"Continuing training from model: {args.model_path}")
            params, td = train_temporal(case, tracker, data=data,
                                        epochs=args.epochs,
                                        init_params=init_params,
                                        init_opt_state=init_opt,
                                        mesh=mesh, seq_mesh=seq_mesh,
                                        pipe_mesh=pipe_mesh,
                                        pipe_microbatches=args.pp_microbatches,
                                        profile_dir=args.profile)
            if case.temporal_train.final_save:
                _final_save(case, "final_model_temporal", params)
        else:  # test / generate (serving modes; shared load + precision)
            import jax
            from sea_tpu.models.temporal import init_temporal
            from sea_tpu.train.evaluate import (
                full_autoregressive_evaluation, fused_autoregressive_evaluation)
            from sea_tpu.train.train_temporal import process_data
            from sea_tpu.utils import checkpoint as ckpt
            td = process_data(case, data=data)
            # NOTE ib_time_constant stays a TRAINING-only optimization:
            # serving was measured on-chip and the [B,1]-row variant is
            # ~13% SLOWER on the prefix engine — its forwards are
            # weight-stream-bound, so shrinking the cond-GEMM rows saves
            # no bytes and degrades MXU shape; the scan engine hoists
            # the cond tables instead (rollout/engine.rollout_scan).
            template = init_temporal(jax.random.PRNGKey(0), case.temporal)
            path = args.model_path or ckpt.checkpoint_path(
                case.run.save_dir, "temporal", case.run.case_name,
                case.run.run_name)
            print(f"Using pretrained model: {path}")
            params = _load_any_checkpoint(path, template, case.temporal,
                                          kind="temporal")
            # --precision applies END-TO-END: the temporal rollout AND the
            # frozen stage-1 decoder run reduced-precision weights.
            # Single-chip reduced-precision serving also fuses the temporal
            # attention projections (qkv/kv) — fewer matvec dispatches per
            # rollout step; TP shards q/k/v per head, so the sharded path
            # keeps the unfused layout (utils.precision docstring).
            spatial_params = None
            params_f32 = params  # retained for the per-checkpoint drift gate
            if args.precision == "bf16":
                from sea_tpu.utils import precision as prec
                if mesh is None:
                    params = prec.fuse_attention_projections(params)
                params = prec.cast_weights_bf16(params)
                spatial_params = prec.cast_weights_bf16(
                    td.latent_service.params)
                print("Serving precision: bf16 weights (rollout + decode)")
            elif args.precision in ("int8", "int4"):
                from sea_tpu.utils import precision as prec
                quantize = (prec.quantize_weights_int8
                            if args.precision == "int8"
                            else prec.quantize_weights_int4)
                if mesh is None:
                    params = prec.fuse_attention_projections(params)
                if (args.precision == "int4" and mesh is None
                        and not args.no_calibrate):
                    # Activation-aware int4 (default): per-channel moments
                    # from a few train-split windows drive a weighted clip
                    # search + bias correction — measured 2.8x lower
                    # teacher-forced drift vs plain MSE scaling at zero
                    # serving cost (utils/calibration.py; BASELINE.md).
                    # Sharded serving skips it (bias keys created by the
                    # correction have no TP sharding spec).
                    from sea_tpu.utils.calibration import calibrate_temporal
                    n_cal = min(4, td.train.src.shape[0])
                    stats = calibrate_temporal(
                        params, case.temporal,
                        [(td.train.src[:n_cal], td.train.ib[:n_cal])])
                    params = prec.quantize_weights_int4(params,
                                                        act_stats=stats)
                    print(f"int4 calibration: activation-aware scales + "
                          f"bias correction ({n_cal} train windows)")
                else:
                    params = quantize(params)
                spatial_params = quantize(td.latent_service.params)
                print(f"Serving precision: {args.precision} weights "
                      "(per-output-channel, rollout + decode)")
            if args.precision in ("int8", "int4") \
                    and not args.no_drift_check:
                # Drift gate: quantization drift is a property of the
                # LOADED checkpoint, not the config — numbers measured on
                # other weights do not transfer (the rollout-space metric
                # even moved the other way across round-3 checkpoints,
                # BASELINE.md round-3c row). A teacher-forced forward on
                # two test windows costs seconds and measures this
                # checkpoint directly.
                from sea_tpu.utils.precision import teacher_forced_drift
                drift = teacher_forced_drift(
                    params_f32, params, case.temporal,
                    td.test.src, td.test.ib)
                print(f"Per-checkpoint teacher-forced drift "
                      f"({args.precision} vs f32): {drift:.4f} "
                      f"(budget {args.drift_budget})")
                if drift > args.drift_budget:
                    parser.error(
                        f"--precision {args.precision}: teacher-forced "
                        f"drift {drift:.4f} on the loaded checkpoint "
                        f"exceeds the budget {args.drift_budget}. Serve "
                        "this checkpoint at higher precision, raise "
                        "--drift_budget explicitly, or pass "
                        "--no_drift_check to override.")
            tcfg = case.temporal
            # bf16 KV caches only pay at int4, where the weight stream no
            # longer dominates HBM traffic (+8.6%; they LOSE 3-5% for
            # bf16/int8 weights — BASELINE.md cache-dtype A/B). int8
            # caches (per-token scales, --kv_cache int8) target BATCHED
            # serving, where the cache stream dominates.
            import jax.numpy as jnp
            if args.kv_cache == "auto":
                cache_dtype = (jnp.bfloat16 if args.precision == "int4"
                               else jnp.float32)
            else:
                cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                               "int8": jnp.int8}[args.kv_cache]
            from sea_tpu.rollout.engine import is_scan_incremental
            if args.mode == "generate":
                import os
                import numpy as np
                from sea_tpu.train.evaluate import generate_trajectory
                out = args.output or os.path.join(
                    case.run.save_dir,
                    f"generated_{case.run.case_name}_{case.run.run_name}.npy")
                fields = generate_trajectory(
                    params, case, td.test, td.latent_service,
                    td.mesh_processor, trajectory=args.trajectory,
                    horizon=args.horizon, spatial_params=spatial_params,
                    cache_dtype=cache_dtype)
                os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
                np.save(out, fields)
                print(f"Generated {fields.shape[0]} steps x "
                      f"{fields.shape[1]} nodes x {fields.shape[2]} fields "
                      f"-> {out}")
                return
            if mesh is not None and is_scan_incremental(tcfg):
                # Explicit --mesh DxM: trajectories sharded over 'data',
                # tensor-parallel params over 'model' (staged pipeline —
                # the decode stage runs on the host side as usual).
                print(f"sharded serving: mesh {dict(mesh.shape)}")
                results = full_autoregressive_evaluation(
                    params, case, td.test, td.latent_service,
                    td.mesh_processor, spatial_params=spatial_params,
                    epoch=0, plot_traj=True, cache_dtype=cache_dtype,
                    mesh=mesh)
            else:
                # Serving path: rollout+decode+unpatch+metrics on device
                # (rollout/e2e.py). Engine selection inside (scan vs the
                # bucketed prefix engine — f32 B=1 and every
                # non-incremental config take prefix; engine.select_engine).
                # An EXPLICIT --kv_cache forces the scan engine: the
                # prefix engine has no KV cache, so silently routing the
                # request there would measure nothing (review finding).
                engine = "auto"
                if args.kv_cache != "auto":
                    # The scan engine is the only one with a KV cache,
                    # and it requires a scan-incremental config — fail
                    # with a flag-conflict error up front instead of a
                    # staged-fallback message from deep inside
                    # make_e2e_rollout_eval (round-4 advisor finding).
                    if not is_scan_incremental(tcfg):
                        parser.error(
                            f"--kv_cache {args.kv_cache} requires a "
                            "scan-incremental temporal config (causal, "
                            "src_len == 0, non-attention ib mode): this "
                            "config serves on the prefix engine, which "
                            "has no KV cache")
                    engine = "scan"
                    print(f"kv_cache={args.kv_cache}: scan engine forced "
                          "(the prefix engine has no KV cache)")
                results = fused_autoregressive_evaluation(
                    params, case, td.test, td.latent_service,
                    td.mesh_processor, spatial_params=spatial_params,
                    epoch=0, plot_traj=True, cache_dtype=cache_dtype,
                    engine=engine)
            print("Test Results:")
            for key in ("encoded_rel_mse", "decoded_rel_mse"):
                print(f"{key}: {results[key]}")


def _resolve_meshes(parser, args):
    """(mesh, seq_mesh, pipe_mesh) from --mesh / --seq_parallel / --pp.

    Train modes: 'auto' spans every visible device data-parallel when
    more than one is present — a v5e-8 user gets 8-way DP without flags
    — and stays on the plain single-device path otherwise.

    `temporal test`: an EXPLICIT DxM shards the serving rollout —
    trajectories over 'data', tensor-parallel params over 'model'
    (evaluate.full_autoregressive_evaluation(mesh=...)). 'auto' keeps
    the default single-device FUSED serving program (rollout/e2e.py),
    which is the faster path when one chip holds the model."""
    def parse_dxm(spec):
        parts = spec.split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            parser.error(f"--mesh must be 'auto', 'none', or DxM "
                         f"(e.g. 4x2); got {args.mesh!r}")
        from sea_tpu.parallel.mesh import make_mesh
        return make_mesh(n_data=int(parts[0]), n_model=int(parts[1]))

    spec = args.mesh.strip().lower()
    if args.mode != "train":
        if (args.model_type, args.mode) == ("temporal", "test") \
                and spec not in ("auto", "none"):
            return parse_dxm(spec), None, None
        if args.mode == "generate" and spec not in ("auto", "none"):
            parser.error("--mesh sharding applies to train modes and "
                         "`temporal test`; generate runs the single-device "
                         "fused program")
        return None, None, None
    if args.seq_parallel:
        if spec not in ("auto", "none"):
            # 'auto' is the flag default, so only an EXPLICIT DxM mesh
            # conflicts — erroring beats silently ignoring the request.
            parser.error(
                f"--seq_parallel and --mesh {args.mesh} are mutually "
                "exclusive: sequence parallelism shards the time axis "
                "over ALL requested devices (ring attention)")
        from sea_tpu.parallel.mesh import make_seq_mesh
        return None, make_seq_mesh(args.seq_parallel), None
    if args.pp:
        if spec not in ("auto", "none"):
            parser.error(
                f"--pp and --mesh {args.mesh} are mutually exclusive: "
                "pipeline parallelism builds its own ('data', 'pipe') "
                "mesh — devices beyond the S stages join the data axis")
        import jax
        from sea_tpu.parallel.pipeline import make_pipe_mesh
        n = len(jax.devices())
        if n < args.pp:
            parser.error(f"--pp {args.pp} needs {args.pp} devices; "
                         f"{n} visible")
        n_data = max(1, n // args.pp)
        print(f"pipeline mesh: data={n_data} x pipe={args.pp}")
        return None, None, make_pipe_mesh(n_pipe=args.pp, n_data=n_data)
    if spec == "none":
        return None, None, None
    if spec == "auto":
        import jax
        n = len(jax.devices())
        if n == 1:
            return None, None, None
        print(f"auto mesh: data={n} x model=1 over {n} devices")
        from sea_tpu.parallel.mesh import make_mesh
        return make_mesh(n_data=n, n_model=1), None, None
    return parse_dxm(spec), None, None


def _final_save(case, kind: str, params) -> None:
    """Multi-host-safe final_save: orbax (collective, every process
    persists its shards) on a pod; npz from process 0 otherwise — same
    discipline as the drivers' best-checkpoint saves."""
    from sea_tpu.parallel.multihost import is_primary
    from sea_tpu.utils.checkpoint import (multihost_checkpointing,
                                          save_checkpoint)
    if is_primary() or multihost_checkpointing():
        save_checkpoint(case.run.save_dir, kind, case.run.case_name,
                        case.run.run_name, params,
                        use_orbax=multihost_checkpointing())


def _load_train_checkpoint(path: str, template, cfg, train_cfg, *,
                           kind: str):
    """(params, opt_state | None) for --model_path resume.

    Our checkpoints carry optimizer state: resume continues the Adam
    moments instead of restarting them (the reference always restarts,
    SURVEY §5.4 — strict improvement). Reference .pt state dicts have no
    optimizer state and resume fresh."""
    if path.endswith(".pt"):
        return _load_any_checkpoint(path, template, cfg, kind=kind), None
    import jax
    import numpy as np
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.utils.checkpoint import load_full_checkpoint
    tx = make_optimizer(train_cfg)
    # Structure-only template: eval_shape traces tx.init without
    # allocating the ~2x-model-size moment buffers on device (the
    # training path builds the real opt state from the restored leaves).
    opt_template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                jax.eval_shape(tx.init, template))
    try:
        params, opt_state, _ = load_full_checkpoint(path, template,
                                                    opt_template)
    except KeyError as exc:
        # Optimizer STRUCTURE mismatch — most commonly a checkpoint
        # written under a different compute_dtype recipe (bf16_shadow
        # carries the shadow copy in its state; plain recipes don't).
        # Params are still valid: resume them with a fresh optimizer
        # (the reference's behavior) rather than dying on a bare
        # KeyError, and say exactly what happened.
        print(f"Warning: optimizer state in {path} does not match the "
              f"configured optimizer structure (missing leaf {exc}) — "
              "likely saved under a different --compute_dtype recipe "
              "(bf16_shadow vs plain). Resuming params with a FRESH "
              "optimizer; pass the original recipe flags to continue "
              "the Adam moments.")
        params, _, _ = load_full_checkpoint(path, template, None)
        return params, None
    if opt_state is not None:
        print("Restored optimizer state (resume continues Adam moments)")
    return params, opt_state


def _load_any_checkpoint(path: str, template, cfg, *, kind: str):
    """Load our .npz checkpoints OR reference torch .pt state dicts."""
    if path.endswith(".pt"):
        from sea_tpu.utils.torch_compat import (load_torch_state_dict,
                                                spatial_params_from_torch,
                                                temporal_params_from_torch)
        sd = load_torch_state_dict(path)
        if kind == "spatial":
            return spatial_params_from_torch(sd, cfg)
        return temporal_params_from_torch(sd, cfg)
    from sea_tpu.utils.checkpoint import load_params
    return load_params(path, template)


if __name__ == "__main__":
    main()
