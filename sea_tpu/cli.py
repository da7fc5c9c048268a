"""Command-line entry point.

Mirror of reference main.py:
    python -m sea_tpu.cli <flow_type> {encoder,temporal} {train,test}
        [--model_path PATH] [--epochs N] [--synthetic]

- flow_type selects a config module from sea_tpu.configs by name via
  importlib (main.py:23-38 behavior).
- encoder train/test and temporal train/test route exactly like
  main.py:62-124, including final_save and model-path overrides.
- --synthetic generates in-memory synthetic data instead of reading the
  configured .npy paths (the reference repo ships no data).
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
        print(f"Error: Unknown flow type '{flow_type}'. Make sure the "
              f"corresponding config module exists in sea_tpu.configs.")
        sys.exit(1)
    # Import errors raised *inside* a valid config module (e.g. a missing
    # dependency) propagate with their real traceback.
    module = importlib.import_module(f"sea_tpu.configs.{flow_type}")
    if not hasattr(module, "get_case"):
        print(f"Error: The config module for '{flow_type}' does not have "
              f"the required get_case function.")
        sys.exit(1)
    return module.get_case()


def _load_data(case, synthetic: bool):
    if synthetic:
        from sea_tpu.data.synthetic import cylinder_like, multiphase_like
        gen = (multiphase_like if "multiphase" in case.run.case_name
               else cylinder_like)
        return gen(tr=5, T=41, n_nodes=800, seed=case.spatial_split.random_seed)
    return None  # drivers read the configured paths


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train or test SEA-TPU models")
    parser.add_argument("flow_type",
                        help="e.g. cylinder_flow, multiphase_flow")
    parser.add_argument("model_type", choices=["encoder", "temporal"])
    parser.add_argument("mode", choices=["train", "test"])
    parser.add_argument("--model_path", required=False,
                        help="checkpoint to load (test / continue-train)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override config epoch_num")
    parser.add_argument("--synthetic", action="store_true",
                        help="use generated synthetic data")
    parser.add_argument("--save_dir", default=None)
    parser.add_argument("--precision", choices=["f32", "bf16", "int8"],
                        default="f32",
                        help="serving precision for `temporal test`: bf16 "
                             "casts the big matmul weights, int8 quantizes "
                             "them per-output-channel (quantify drift with "
                             "tools/measure_bf16_drift.py first)")
    args = parser.parse_args(argv)
    if args.precision != "f32" and (args.model_type, args.mode) != \
            ("temporal", "test"):
        parser.error(
            f"--precision {args.precision} only applies to `temporal test` "
            "(rollout serving); training always runs the configured "
            "compute_dtype policy")

    case = get_case(args.flow_type)
    if args.save_dir:
        case = case.replace(run=dataclasses.replace(case.run,
                                                    save_dir=args.save_dir))
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
                init_params = _load_any_checkpoint(
                    args.model_path, template, precomputed.spatial_cfg,
                    kind="spatial")
                print(f"Continuing training from model: {args.model_path}")
            params, sd = train_spatial(case, tracker, data=data,
                                       epochs=args.epochs,
                                       init_params=init_params,
                                       precomputed=precomputed)
            if case.spatial_train.final_save:
                from sea_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(case.run.save_dir, "final_model_encoder",
                                case.run.case_name, case.run.run_name,
                                params)
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
            if args.model_path:
                import jax
                from sea_tpu.models.temporal import init_temporal
                template = init_temporal(jax.random.PRNGKey(0),
                                         case.temporal)
                init_params = _load_any_checkpoint(
                    args.model_path, template, case.temporal,
                    kind="temporal")
                print(f"Continuing training from model: {args.model_path}")
            params, td = train_temporal(case, tracker, data=data,
                                        epochs=args.epochs,
                                        init_params=init_params)
            if case.temporal_train.final_save:
                from sea_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(case.run.save_dir, "final_model_temporal",
                                case.run.case_name, case.run.run_name,
                                params)
        else:  # test
            import jax
            from sea_tpu.models.temporal import init_temporal
            from sea_tpu.train.evaluate import full_autoregressive_evaluation
            from sea_tpu.train.train_temporal import process_data
            from sea_tpu.utils import checkpoint as ckpt
            td = process_data(case, data=data)
            template = init_temporal(jax.random.PRNGKey(0), case.temporal)
            path = args.model_path or ckpt.checkpoint_path(
                case.run.save_dir, "temporal", case.run.case_name,
                case.run.run_name)
            print(f"Using pretrained model: {path}")
            params = _load_any_checkpoint(path, template, case.temporal,
                                          kind="temporal")
            if args.precision == "bf16":
                from sea_tpu.utils.precision import cast_weights_bf16
                params = cast_weights_bf16(params)
                print("Serving precision: bf16 weights")
            elif args.precision == "int8":
                from sea_tpu.utils.precision import quantize_weights_int8
                params = quantize_weights_int8(params)
                print("Serving precision: int8 weights "
                      "(per-output-channel)")
            results = full_autoregressive_evaluation(
                params, case, td.test, td.latent_service, td.mesh_processor,
                epoch=0, plot_traj=True)
            print("Test Results:")
            for key in ("encoded_rel_mse", "decoded_rel_mse"):
                print(f"{key}: {results[key]}")


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
