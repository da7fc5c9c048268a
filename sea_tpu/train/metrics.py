"""Metrics and losses.

Mirror of reference utils/train_utils.py:
- relativeMSE (:112-116): sum(err^2)/sum(truth^2) + eps reduced along a dim.
- relativeMSE_with_time (:124-150): keeps [time, field] shape — the headline
  fidelity metric for rollouts.
- calculate_R2 (:42-48): flattened R^2.
- Vloss (:15-30): VAE loss, MSE recon + linearly annealed KL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def _path_str(path) -> str:
    """'blocks/0/attn/wq'-style name from a tree_flatten_with_path key path."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def per_tensor_norms(tree, prefix: str = ""):
    """Flat {prefix + path: L2 norm} over every leaf of a pytree.

    The TPU-native stand-in for the reference's ``wandb.watch`` per-tensor
    gradient/parameter histograms (utils/train_utils.py:75-76): histograms
    are host-side observables that don't map onto a jitted step, so each
    tensor is reduced to one scalar norm *inside* the step — XLA fuses the
    reductions, and the host reads back one scalar per tensor only on the
    epochs that log them."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {prefix + _path_str(path):
            jnp.sqrt(jnp.sum(jnp.square(leaf.astype(jnp.float32))))
            for path, leaf in flat}


@jax.jit
def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


class StatsAccumulator:
    """Accumulates per-batch scalar stats ON DEVICE, one host readback per
    epoch.

    The train loops used to do ``agg[k] += float(stats[k])`` per batch —
    each ``float()`` is a device->host round-trip that FENCES the loop, so
    on a remote/tunneled TPU backend (~20 ms RTT each) a 6-key stats dict
    cost more wall-clock than the train step itself and, worse, broke the
    async-dispatch pipeline (the host can't stage batch N+1 while blocked
    reading batch N's loss). Summing on device keeps the loop fully async;
    ``means()`` is the single per-epoch fence. The nested "tensors" entry
    (log_per_tensor) is excluded — it is read back separately, and only on
    logging epochs."""

    def __init__(self):
        self._agg = None
        self.count = 0

    def add(self, stats):
        scal = ({k: v for k, v in stats.items() if k != "tensors"}
                if isinstance(stats, dict) else {"loss": stats})
        self._agg = (scal if self._agg is None
                     else _tree_add(self._agg, scal))
        self.count += 1

    def means(self) -> dict:
        if self.count == 0:
            return {}
        return {k: float(v) / self.count for k, v in self._agg.items()}


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


def _sample_mask(n_valid, batch: int):
    return (jnp.arange(batch) < n_valid).astype(jnp.float32)


def masked_mse(pred, truth, n_valid):
    """MSE over the first n_valid samples of a padded batch (leading axis =
    batch). n_valid is traced, so one compilation covers every tail size."""
    w = _sample_mask(n_valid, pred.shape[0])
    per_sample = jnp.mean((pred - truth) ** 2,
                          axis=tuple(range(1, pred.ndim)))
    return jnp.sum(per_sample * w) / jnp.sum(w)


def masked_r2(pred, truth, n_valid):
    """Flattened R^2 restricted to the valid rows of a padded batch."""
    w = _sample_mask(n_valid, pred.shape[0])
    shape = (pred.shape[0],) + (1,) * (pred.ndim - 1)
    wfull = w.reshape(shape)
    per_item = jnp.prod(jnp.asarray(truth.shape[1:]))
    count = jnp.sum(w) * per_item
    mean_truth = jnp.sum(truth * wfull) / count
    residual = jnp.sum(wfull * (pred - truth) ** 2)
    total = jnp.sum(wfull * (truth - mean_truth) ** 2)
    return 1.0 - residual / total


def masked_kl(mu, logvar, n_valid):
    """Vloss KL (summed, train_utils.py:26) over valid rows only."""
    w = _sample_mask(n_valid, mu.shape[0]).reshape(
        (mu.shape[0],) + (1,) * (mu.ndim - 1))
    return -0.5 * jnp.sum(w * (1 + logvar - mu ** 2 - jnp.exp(logvar)))


def kl_anneal_weight(kl_weight_min: float, kl_weight_max: float, iteration,
                     total_steps: int):
    """Linear KL anneal min->max over total_steps (train_utils.py:26).
    Single source of truth: used by vloss (train) AND the masked eval path
    (train_spatial.make_eval_step) so the schedules cannot diverge."""
    return kl_weight_min + (kl_weight_max - kl_weight_min) * (
        iteration / total_steps)


def vloss(x, recon, mu, logvar, *, kl_weight_min: float, kl_weight_max: float,
          iteration, total_steps: int):
    """Returns (total, recon_loss, kl_loss). KL weight anneals linearly from
    min to max over total_steps (train_utils.py:26)."""
    kl_weight = kl_anneal_weight(kl_weight_min, kl_weight_max, iteration,
                                 total_steps)
    recon_loss = mse(recon, x)
    kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return recon_loss + kl_weight * kl, recon_loss, kl
