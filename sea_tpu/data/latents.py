"""Frozen stage-1 latent service.

Mirror of reference ProcessData (utils/data_processors.py:291-373): rebuild
the spatial model from config, load its checkpoint, and run the frozen
encoder over a dataset to produce stage-2 latents (the deliberate layering
inversion of SURVEY §1 — stage-2 training consumes stage-1 latents).

TPU-native differences: encode/decode are jit-compiled and batched with
static shapes (last partial batch padded and trimmed); no GPU-memory
clearing gymnastics needed (:365-373) — arrays are device-managed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sea_tpu.configs.base import SpatialModelConfig
from sea_tpu.models.spatial import (apply_padding_mask, spatial_decode,
                                    spatial_encode)


class LatentService:
    def __init__(self, cfg: SpatialModelConfig, params, *,
                 batch_size: int = 1000):
        assert cfg.n_inp is not None
        self.cfg = cfg
        self.params = params
        self.batch_size = batch_size
        if cfg.variational:
            # Deterministic post-transformer latent z (z = mu in eval mode),
            # matching the reference ``z, _, _ = model.encode(data)``
            # (data_processors.py:346-348). Built once: per-call lambdas
            # would defeat jit's cache and recompile every call.
            self._encode = jax.jit(
                lambda p, x: spatial_encode(p, cfg, apply_padding_mask(x))[0])
        else:
            self._encode = jax.jit(
                lambda p, x: spatial_encode(p, cfg, apply_padding_mask(x)))
        self._decode = jax.jit(lambda p, z: spatial_decode(p, cfg, z))

    def _batched(self, fn, data: np.ndarray) -> np.ndarray:
        n = data.shape[0]
        bs = min(self.batch_size, n)
        outs = []
        for start in range(0, n, bs):
            chunk = data[start:start + bs]
            pad = bs - chunk.shape[0]
            if pad > 0:  # pad to static batch shape, trim after
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)], axis=0)
            out = np.asarray(fn(self.params, jnp.asarray(chunk)))
            outs.append(out[:out.shape[0] - pad] if pad else out)
        return np.concatenate(outs, axis=0)

    def encode_dataset(self, data: np.ndarray) -> np.ndarray:
        """[B, P, F, C] -> latents [B, P, G, D] (data_processors.py:335-352).

        Variational models return the deterministic post-transformer latent
        z (spatial_encode uses z = mu in eval mode)."""
        return self._batched(self._encode, data)

    def decode_dataset(self, latents: np.ndarray) -> np.ndarray:
        """[B, P, G, D] -> fields [B, P, F, C] (data_processors.py:354-363)."""
        return self._batched(self._decode, latents)

    def with_params(self, params) -> "LatentService":
        """Copy of this service running different weights (e.g. the CLI's
        reduced-precision serving casts — ops.layers.linear consumes the
        quantized w_q/w_s structure directly). Shares the jitted
        encode/decode closures, so no recompilation beyond the new
        parameter dtypes."""
        import copy
        svc = copy.copy(self)
        svc.params = params
        return svc


def transform_latents_to_temporal(latents: np.ndarray, tr: int, T: int,
                                  n_patches: int, num_groups: int
                                  ) -> np.ndarray:
    """[tr*T, P, G, D] -> [tr, T, G, P*D]
    (transform_processed_data, utils/train_utils.py:315-337)."""
    D = latents.shape[-1]
    x = latents.reshape(tr, T, n_patches, num_groups, D)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(tr, T, num_groups, n_patches * D)


def inverse_transform_latents(temporal: np.ndarray, n_patches: int
                              ) -> np.ndarray:
    """[tr, T, G, P*D] -> [tr*T, P, G, D]
    (inverse_transform_processed_data, utils/train_utils.py:339-362)."""
    tr, T, G, E = temporal.shape
    D = E // n_patches
    x = temporal.reshape(tr, T, G, n_patches, D)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(tr * T, n_patches, G, D)
