"""Optimizer construction.

Mirror of reference initialize_optimizer (utils/train_utils.py:33-39):
AdamW with betas (0.9, 0.999), eps 1e-8, optional weight decay, plus the
optional 'linear' warm schedule (LinearLR start_factor=0.1 -> 1.0 over
epoch_num; the reference steps it per-epoch — here expressed per-step over
``transition_steps`` for jit-friendliness; both configs ship scheduler=None
so this path is parity-flexible).
"""

from __future__ import annotations

from typing import Optional

import optax

from sea_tpu.configs.base import TrainConfig


def make_optimizer(cfg: TrainConfig, *,
                   transition_steps: Optional[int] = None):
    if cfg.scheduler == "linear":
        steps = transition_steps or cfg.epoch_num
        lr = optax.linear_schedule(init_value=0.1 * cfg.learning_rate,
                                   end_value=cfg.learning_rate,
                                   transition_steps=steps)
    elif cfg.scheduler is None:
        lr = cfg.learning_rate
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")
    # mu_dtype=bf16 halves the first-moment's HBM traffic. On the
    # 201M-param multiphase model the AdamW update fusions are the
    # largest single cost in the train step (4.9 ms/step at B=4, ~37% of
    # device time, already at ~705 GB/s — BASELINE.md MFU rows), so
    # moment bytes convert directly to step time. The second moment
    # stays f32 (optax applies bias correction in f32 either way; nu's
    # wide dynamic range is the numerically sensitive one). Convergence
    # pinned by tests/test_features.py::test_bf16_mu_matches_f32_training.
    mu_dtype = ("bfloat16" if getattr(cfg, "adam_mu_dtype", "float32")
                == "bfloat16" else None)
    return optax.adamw(learning_rate=lr, b1=cfg.betas[0], b2=cfg.betas[1],
                       eps=cfg.eps, weight_decay=cfg.weight_decay,
                       mu_dtype=mu_dtype)
