"""Metrics and losses.

Mirror of reference utils/train_utils.py:
- relativeMSE (:112-116): sum(err^2)/sum(truth^2) + eps reduced along a dim.
- relativeMSE_with_time (:124-150): keeps [time, field] shape — the headline
  fidelity metric for rollouts.
- calculate_R2 (:42-48): flattened R^2.
- Vloss (:15-30): VAE loss, MSE recon + linearly annealed KL.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def mse(pred, truth):
    return jnp.mean((pred - truth) ** 2)


def relative_mse(pred, truth, axis: int = -1):
    num = jnp.sum((pred - truth) ** 2, axis=axis)
    den = jnp.sum(truth ** 2, axis=axis)
    return num / (den + EPS)


def relative_mse_with_time(pred, truth, axis: int = 2):
    """pred/truth: [trajectory, time, cell, field] -> [traj, time, field]
    (reference reduces over the cell axis and keeps time x field)."""
    num = jnp.sum((pred - truth) ** 2, axis=axis)
    den = jnp.sum(truth ** 2, axis=axis)
    return num / (den + EPS)


def r2(pred, truth):
    pred = pred.reshape(-1)
    truth = truth.reshape(-1)
    residual = jnp.sum((pred - truth) ** 2)
    total = jnp.sum((truth - jnp.mean(truth)) ** 2)
    return 1.0 - residual / total


def vloss(x, recon, mu, logvar, *, kl_weight_min: float, kl_weight_max: float,
          iteration, total_steps: int):
    """Returns (total, recon_loss, kl_loss). KL weight anneals linearly from
    min to max over total_steps (train_utils.py:26)."""
    kl_weight = kl_weight_min + (kl_weight_max - kl_weight_min) * (
        iteration / total_steps)
    recon_loss = mse(recon, x)
    kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return recon_loss + kl_weight * kl, recon_loss, kl
