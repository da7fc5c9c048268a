"""Chunked trainer for the learning-quality demos (docs/demo).

Trains a full-size shipped preset (--case cylinder_flow or
multiphase_flow) on 16 synthetic conditioned trajectories (10 train /
3 val / 3 test at the config's split fractions) in resumable chunks —
each invocation runs --epochs more epochs of the requested stage and
exits; checkpoints land in --save_dir under the usual per-case family
names (both cases can share one save dir), so re-running continues from
the best checkpoint. Designed for environments that cap single-command
wall-clock (tunneled TPU sessions): relaunch until converged.

    python tools/train_demo.py --stage spatial  --epochs 120 [--fresh]
    python tools/train_demo.py --stage temporal --epochs 80
    python tools/train_demo.py --stage eval          # test-split rollout
    python tools/train_demo.py --case multiphase_flow --stage spatial ...
"""

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TR, T, NODES = 16, 41, 800


def build_case(save_dir, case_name="cylinder_flow"):
    import importlib
    cfg_mod = importlib.import_module(f"sea_tpu.configs.{case_name}")
    case = cfg_mod.get_case()
    case = case.replace(run=dataclasses.replace(case.run,
                                                save_dir=save_dir))
    tt = case.temporal_train
    n_train = max(1, int(round(TR * case.temporal_split.train_fraction)))
    return case.replace(temporal_train=dataclasses.replace(
        tt, dataset_src_len=min(tt.dataset_src_len, T - 1),
        batch_size=min(tt.batch_size, n_train)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["spatial", "temporal", "eval"],
                    required=True)
    ap.add_argument("--case", choices=["cylinder_flow", "multiphase_flow"],
                    default="cylinder_flow")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--save_dir", default="/tmp/demo_b")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore an existing checkpoint (restart)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the stage's learning rate (late-phase "
                         "fine-tune chunks, e.g. 3e-5 once val saturates)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the session env rewrites "
                         "JAX_PLATFORMS, so only jax.config sticks)")
    ap.add_argument("--split", choices=["test", "val"], default="test",
                    help="eval stage only: which held-out split to roll "
                         "out. Select checkpoints on --split val, report "
                         "--split test (never select on test)")
    ap.add_argument("--model_path", default=None,
                    help="eval stage only: explicit checkpoint to "
                         "evaluate (defaults to the save-dir checkpoint "
                         "family)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from sea_tpu.data.synthetic import cylinder_like, multiphase_like
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.utils.checkpoint import (checkpoint_path,
                                          load_full_checkpoint, load_params)

    # Persistent XLA compilation cache: chunked invocations recompile the
    # same programs every run otherwise (several minutes each on the
    # tunneled backend).
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(args.save_dir, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    case = build_case(args.save_dir, args.case)
    if args.lr is not None:
        case = case.replace(
            spatial_train=dataclasses.replace(case.spatial_train,
                                              learning_rate=args.lr),
            temporal_train=dataclasses.replace(case.temporal_train,
                                               learning_rate=args.lr))
    gen = cylinder_like if args.case == "cylinder_flow" else multiphase_like
    data = gen(tr=TR, T=T, n_nodes=NODES,
               seed=case.spatial_split.random_seed)

    if args.stage == "spatial":
        from sea_tpu.models.spatial import init_spatial
        from sea_tpu.train.train_spatial import process_data, train
        init_params = None
        precomputed = None
        path = checkpoint_path(args.save_dir, "encoder_decoder",
                               case.run.case_name, case.run.run_name)
        init_opt = None
        if os.path.exists(path) and not args.fresh:
            precomputed = process_data(case, data=data)
            template = init_spatial(jax.random.PRNGKey(0),
                                    precomputed.spatial_cfg)
            tx = make_optimizer(case.spatial_train)
            init_params, init_opt, _ = load_full_checkpoint(
                path, template, tx.init(template))
            print(f"resuming spatial from {path} "
                  f"(opt state: {init_opt is not None})")
        train(case, data=data, epochs=args.epochs, init_params=init_params,
              init_opt_state=init_opt, precomputed=precomputed,
              seed=args.seed)
    elif args.stage == "temporal":
        from sea_tpu.models.temporal import init_temporal
        from sea_tpu.train.train_temporal import train
        init_params = None
        path = checkpoint_path(args.save_dir, "temporal",
                               case.run.case_name, case.run.run_name)
        init_opt = None
        if os.path.exists(path) and not args.fresh:
            template = init_temporal(jax.random.PRNGKey(0), case.temporal)
            tx = make_optimizer(case.temporal_train)
            init_params, init_opt, _ = load_full_checkpoint(
                path, template, tx.init(template))
            print(f"resuming temporal from {path} "
                  f"(opt state: {init_opt is not None})")
        train(case, data=data, epochs=args.epochs, init_params=init_params,
              init_opt_state=init_opt, seed=args.seed)
    else:  # eval: rollout on a held-out split (test by default)
        from sea_tpu.models.temporal import init_temporal
        from sea_tpu.train.evaluate import full_autoregressive_evaluation
        from sea_tpu.train.train_temporal import process_data
        td = process_data(case, data=data)
        template = init_temporal(jax.random.PRNGKey(0), case.temporal)
        ck = args.model_path
        if ck is None:
            # Prefer the best-rollout checkpoint family when present.
            ck = checkpoint_path(args.save_dir, "temporal_Checkpoint",
                                 case.run.case_name, case.run.run_name)
            if not os.path.exists(ck):
                ck = checkpoint_path(args.save_dir, "temporal",
                                     case.run.case_name, case.run.run_name)
        params = load_params(ck, template)
        windows = td.val if args.split == "val" else td.test
        print(f"evaluating {ck} on the {args.split} split")
        res = full_autoregressive_evaluation(
            params, case, windows, td.latent_service, td.mesh_processor,
            epoch=0, save_artifacts=(args.split == "test"))
        print(json.dumps({
            "encoded_rel_mse": round(res["encoded_rel_mse"], 6),
            "decoded_rel_mse": round(res["decoded_rel_mse"], 6)}))


if __name__ == "__main__":
    main()
