"""Training-step throughput bench (temporal stage, multiphase scale).

Measures the jitted teacher-forced train step (fwd+bwd+AdamW) at the
multiphase configuration (E=2048, T=199 windows, batch 4, dropout 0 ->
flash attention eligible) on the default device, amortized over several
steps per dispatch. Prints one JSON line. Not wired into the driver's
bench.py (rollout stays the headline); run manually.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.configs.multiphase_flow import get_case
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    B, T = 4, 199
    cfg = get_case().temporal
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=8e-5))
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx)

    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, 2, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jax.random.normal(jax.random.fold_in(key, 2), (B, T, cfg.ib_num))

    # Compile + first step.
    params, opt_state, loss = step(params, opt_state, src, tgt, ib,
                                   jax.random.PRNGKey(2))
    jax.block_until_ready(loss)

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, src, tgt, ib,
                                       jax.random.fold_in(key, 10 + i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n

    tokens = B * T * 2  # windows x steps x streams
    print(json.dumps({
        "metric": "multiphase_temporal_train_step",
        "ms_per_step": round(dt * 1000, 2),
        "tokens_per_sec": round(tokens / dt),
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
