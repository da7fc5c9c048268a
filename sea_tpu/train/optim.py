"""Optimizer construction.

Mirror of reference initialize_optimizer (utils/train_utils.py:33-39):
AdamW with betas (0.9, 0.999), eps 1e-8, optional weight decay, plus the
optional 'linear' warm schedule (LinearLR start_factor=0.1 -> 1.0 over
epoch_num; the reference steps it per-epoch — here expressed per-step over
``transition_steps`` for jit-friendliness; both configs ship scheduler=None
so this path is parity-flexible).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from sea_tpu.configs.base import TrainConfig


class ShadowOptState(NamedTuple):
    """Optimizer state for compute_dtype='bfloat16_shadow'.

    ``shadow`` is a persistent bf16 copy of the float master params that
    the train step's forward/backward runs on. Keeping it in the
    optimizer state (instead of re-casting the f32 masters every step)
    removes the full-f32 weight read from the cast — on the 201M-param
    multiphase model that cast is ~0.8 GB of HBM traffic per step — and
    lets XLA fuse the refresh cast into the AdamW update kernels, which
    already stream the new params through registers. Gradients emerge in
    bf16 (they are taken w.r.t. the shadow) and are widened to f32
    in-register inside the fused update, halving the gradient HBM
    round-trip as well. Checkpoints save/restore it like any other
    optimizer leaf (the structure template comes from tx.init)."""
    inner: Any
    shadow: Any


def with_bf16_shadow(tx: optax.GradientTransformation):
    """Wrap ``tx`` so its state carries the bf16 shadow params and each
    update refreshes the shadow from the post-update master params.

    The inner update sees f32 gradients (bf16 grads are upcast leaf-wise;
    XLA fuses the cast into the update pass, so no extra HBM traffic) and
    f32 master params — the moments/bias-correction/weight-decay numerics
    are identical to the plain recipe; the ONLY numeric difference from
    'bfloat16_mixed' is that gradients are rounded to bf16 once on the
    way out of the backward pass (convergence pinned by
    tests/test_features.py::test_bf16_shadow_matches_mixed_training).
    Under data parallelism this also makes the gradient all-reduce run
    in bf16 — per-shard partial dW rounds before the psum (the standard
    reduced-precision grad reduction); drift vs the single-device step
    is bounded in
    tests/test_parallel.py::test_temporal_shadow_sharded_matches_single_device."""
    from sea_tpu.utils.precision import to_bf16

    def init(params):
        return ShadowOptState(tx.init(params), to_bf16(params))

    def update(grads, state, params=None):
        grads32 = jax.tree.map(
            lambda g: g.astype(jnp.float32)
            if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)
        updates, inner = tx.update(grads32, state.inner, params)
        # Same expression as the step's optax.apply_updates — XLA CSEs
        # the two, so the refreshed shadow costs one fused bf16 store.
        shadow = to_bf16(optax.apply_updates(params, updates))
        return updates, ShadowOptState(inner, shadow)

    return optax.GradientTransformation(init, update)


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
    family = getattr(cfg, "optimizer", "adamw")
    if family == "adafactor":
        # Factored second moment (outer product of row/col means for
        # every matrix with both dims >= 128), no first moment, update
        # RMS clipped at 1.0. multiply_by_parameter_scale=False keeps
        # the step size = lr like Adam so the shipped learning rates
        # transfer. Kills the optimizer-state HBM traffic that
        # dominates the big-model train step (see TrainConfig.optimizer
        # and BASELINE.md "Where the time goes"). weight_decay_rate is
        # adafactor's multiplicative decay; both shipped configs use
        # weight_decay=0 so None keeps parity there.
        tx = optax.adafactor(
            learning_rate=lr,
            multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
            momentum=None,
            weight_decay_rate=(cfg.weight_decay
                               if cfg.weight_decay else None))
    elif family == "adamw":
        # mu_dtype=bf16 halves the first-moment's HBM traffic. On the
        # 201M-param multiphase model the AdamW update fusions are the
        # largest single cost in the train step (4.9 ms/step at B=4, ~37%
        # of device time, already at ~705 GB/s — BASELINE.md MFU rows), so
        # moment bytes convert directly to step time. The second moment
        # stays f32 (optax applies bias correction in f32 either way; nu's
        # wide dynamic range is the numerically sensitive one). Convergence
        # pinned by tests/test_features.py::test_bf16_mu_matches_f32_training.
        mu_dtype = ("bfloat16" if getattr(cfg, "adam_mu_dtype", "float32")
                    == "bfloat16" else None)
        tx = optax.adamw(learning_rate=lr, b1=cfg.betas[0], b2=cfg.betas[1],
                         eps=cfg.eps, weight_decay=cfg.weight_decay,
                         mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {family!r} "
                         "(expected 'adamw' or 'adafactor')")
    if getattr(cfg, "compute_dtype", "float32") == "bfloat16_shadow":
        tx = with_bf16_shadow(tx)
    return tx
