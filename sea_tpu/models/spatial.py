"""Stage-1 spatial model: ViT-style mesh-field autoencoder.

Behavioral mirror of reference models/encoder_decoder.py:
- ``PointwiseEncode`` (:75-123, default): per-field-group downScaleMLP head,
  concat group latents -> [B,P,G*D] token per patch, sinusoidal PE over the
  *patch* axis, num_layers pre-LN transformer blocks with full (bidirectional)
  attention across the P patch tokens, final LayerNorm, reshape [B,P,G,D].
- ``Encode`` (:5-72, variational): same with mu/logvar heads + reparameterize.
- ``Decode`` (:126-146): per-group upScaleMLP latent -> fields; no attention.
- ``SpatialModel`` (:149-176): wiring + the pad_idx=-9999 zeroing mask
  (a no-op in practice since the partitioner pads with 0 — preserved anyway).

Init parity (construction-order quirks of the reference):
- PointwiseEncode calls ``self.apply(_init_weights)`` (normal(0,.02)) *before*
  creating the downScaleMLP heads (:89 vs :91), so transformer blocks get
  N(0,.02) while encoder heads keep torch-default init.
- The variational ``Encode`` has ``_init_weights`` commented out (:21), so
  everything there keeps torch-default init.
- ``Decode`` never applies ``_init_weights`` -> torch-default.

Input contract: x [B, P, F, C] (snapshots, patches, fields, padded
cells-per-patch); latent z [B, P, G, D].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sea_tpu.configs.base import SpatialModelConfig
from sea_tpu.ops import layers as L
from sea_tpu.ops.attention import init_attention, mha

PAD_SENTINEL = -9999.0


def init_encoder_block(key, embed_dim: int, n_heads: int, *,
                       init: str = "normal002", dtype=jnp.float32):
    """EncoderBlock (base_blocks.py:123-138): pre-LN attn + pre-LN MLP.
    The LNs are the weight-only LayerNorm (bias=False)."""
    k_attn, k_mlp = jax.random.split(key)
    return {
        "ln1": L.init_layernorm(embed_dim, bias=False, dtype=dtype),
        "ln2": L.init_layernorm(embed_dim, bias=False, dtype=dtype),
        "attn": init_attention(k_attn, embed_dim, n_heads, init=init,
                               dtype=dtype),
        "mlp": L.init_mlp(k_mlp, embed_dim, scale_ratio=4, init=init,
                          dtype=dtype),
    }


def encoder_block(params, x, *, n_heads: int, dropout_rate: float,
                  rng=None, deterministic: bool = True):
    k1 = k2 = None
    if rng is not None and not deterministic:
        k1, k2 = jax.random.split(rng)
    h = L.layernorm(params["ln1"], x)
    x = x + mha(params["attn"], h, h,
                n_heads=n_heads, causal=False, rope=False,
                dropout_rate=dropout_rate, dropout_key=k1,
                deterministic=deterministic)
    x = x + L.mlp(params["mlp"], L.layernorm(params["ln2"], x),
                  dropout_rate=dropout_rate, dropout_key=k2,
                  deterministic=deterministic)
    return x


def init_spatial(key, cfg: SpatialModelConfig, dtype=jnp.float32):
    assert cfg.n_inp is not None, "n_inp must be derived before init " \
        "(run the partitioner first; reference sets it at train_encoder.py:136)"
    token_dim = cfg.token_dim
    n_keys = cfg.num_layers + 4 * cfg.num_groups + 2
    keys = iter(jax.random.split(key, n_keys))

    # Transformer trunk: N(0,.02) init (encoder_decoder.py:96-103).
    trunk_init = "torch_default" if cfg.variational else "normal002"
    blocks = [init_encoder_block(next(keys), token_dim, cfg.n_heads,
                                 init=trunk_init, dtype=dtype)
              for _ in range(cfg.num_layers)]
    # Final LN is a torch nn.LayerNorm (weight+bias), encoder_decoder.py:88.
    ln = L.init_layernorm(token_dim, bias=True, dtype=dtype)

    # Encoder/decoder heads: torch-default init (constructed after apply()).
    encoders = []
    encoders_logvar = [] if cfg.variational else None
    decoders = []
    for group in cfg.field_groups:
        d_field = cfg.n_inp * len(group)
        encoders.append(L.init_scale_mlp(next(keys), d_field, cfg.embed_dim,
                                         cfg.mlp_hidden, dtype=dtype))
        if cfg.variational:
            encoders_logvar.append(
                L.init_scale_mlp(next(keys), d_field, cfg.embed_dim,
                                 cfg.mlp_hidden, dtype=dtype))
        decoders.append(L.init_scale_mlp(next(keys), cfg.embed_dim, d_field,
                                         cfg.mlp_hidden, dtype=dtype))

    params = {
        "blocks": blocks,
        "ln": ln,
        "encoders": encoders,
        "decoders": decoders,
        "pe": L.sinusoidal_pe_table(token_dim, max_len=5000, dtype=dtype),
    }
    if cfg.variational:
        params["encoders_logvar"] = encoders_logvar
    return params


def apply_padding_mask(x, pad_idx: float = PAD_SENTINEL):
    """generate_padding_mask (encoder_decoder.py:173-176), purely: zero
    entries equal to the sentinel. No-op on real data (partitions pad with 0)."""
    return jnp.where(x == pad_idx, 0.0, x)


def _group_tokens(x, field_groups):
    """x: [B,P,F,C] -> list of [B,P,1,len(g)*C] per group, field-major flatten
    (matches x[:, :, group, :].reshape(B,P,1,-1), encoder_decoder.py:109)."""
    B, P, F, C = x.shape
    outs = []
    for group in field_groups:
        xg = x[:, :, jnp.array(group), :]
        outs.append(xg.reshape(B, P, 1, len(group) * C))
    return outs


def spatial_encode(params, cfg: SpatialModelConfig, x, *,
                   rng: Optional[jax.Array] = None,
                   deterministic: bool = True):
    """x: [B,P,F,C] -> z [B,P,G,D] (+ (mu, logvar) when variational)."""
    B, P, F, C = x.shape
    drop = cfg.dropout
    n_split = 2 + cfg.num_layers
    rngs = (list(jax.random.split(rng, n_split))
            if (rng is not None and not deterministic) else [None] * n_split)

    groups = _group_tokens(x, cfg.field_groups)
    if cfg.variational:
        mus, logvars, zs = [], [], []
        for i, xg in enumerate(groups):
            mu = L.scale_mlp(params["encoders"][i], xg)
            logvar = L.scale_mlp(params["encoders_logvar"][i], xg)
            if deterministic or rng is None:
                z = mu
            else:
                eps_key = jax.random.fold_in(rngs[0], i)
                std = jnp.exp(0.5 * logvar)
                z = mu + std * jax.random.normal(eps_key, std.shape, std.dtype)
            mus.append(mu)
            logvars.append(logvar)
            zs.append(z)
        mu = jnp.concatenate(mus, axis=-2)
        logvar = jnp.concatenate(logvars, axis=-2)
        z = jnp.concatenate(zs, axis=-2)
    else:
        zs = [L.scale_mlp(params["encoders"][i], xg)
              for i, xg in enumerate(groups)]
        z = jnp.concatenate(zs, axis=-2)  # [B,P,G,D]
        mu = logvar = None

    z = z.reshape(B, P, cfg.num_groups * cfg.embed_dim)
    z = L.positional_encoding(params["pe"], z, dropout_rate=drop,
                              dropout_key=rngs[1],
                              deterministic=deterministic)
    for li, block in enumerate(params["blocks"]):
        z = encoder_block(block, z, n_heads=cfg.n_heads, dropout_rate=drop,
                          rng=rngs[2 + li], deterministic=deterministic)
    z = L.layernorm(params["ln"], z)
    z = z.reshape(B, P, cfg.num_groups, cfg.embed_dim)
    if cfg.variational:
        return z, mu, logvar
    return z


def spatial_decode(params, cfg: SpatialModelConfig, z):
    """z: [B,P,G,D] -> x [B,P,F,C]; per-group upScaleMLP, no attention
    (encoder_decoder.py:137-146)."""
    B, P, G, D = z.shape
    outs = []
    for i, group in enumerate(cfg.field_groups):
        zg = z[:, :, i:i + 1, :]
        xg = L.scale_mlp(params["decoders"][i], zg)
        outs.append(xg.reshape(B, P, len(group), cfg.n_inp))
    return jnp.concatenate(outs, axis=2)


def spatial_forward(params, cfg: SpatialModelConfig, x, *,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True):
    """Full autoencode pass (encoder_decoder.py:161-171)."""
    x = apply_padding_mask(x)
    if cfg.variational:
        z, mu, logvar = spatial_encode(params, cfg, x, rng=rng,
                                       deterministic=deterministic)
        return spatial_decode(params, cfg, z), mu, logvar
    z = spatial_encode(params, cfg, x, rng=rng, deterministic=deterministic)
    return spatial_decode(params, cfg, z)
