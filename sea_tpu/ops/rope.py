"""Rotary position embeddings in real arithmetic.

The reference uses llama3-style complex64 phasors (base_blocks.py:300-324):
head vectors are reshaped into consecutive pairs (x[2i], x[2i+1]), viewed as
complex numbers, and multiplied by exp(i * t * freq_i) with
freq_i = theta^(-2i/dim), theta=10000.

Complex multiply (a + ib)(cos + i sin) = (a cos - b sin) + i(a sin + b cos)
is expressed here with real ops only — identical numerics, TPU-friendly
(complex64 is poorly supported on the MXU).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(head_dim: int, positions, theta: float = 10000.0,
                 dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: [T] (or any shape) of absolute token indices.
    Returns (cos, sin), each [*positions.shape, head_dim//2].
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                        dtype=jnp.float32)[: head_dim // 2]
                             / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x, cos, sin):
    """Rotate consecutive pairs of the last axis.

    x: [..., T, n_heads, head_dim] (pre-head-transpose layout, matching the
       reference which applies RoPE on [B, T, H, D], base_blocks.py:179-184).
    cos/sin: [T, head_dim//2], broadcast over batch and heads.
    """
    a = x[..., 0::2]
    b = x[..., 1::2]
    # Broadcast [T, hd/2] against [..., T, H, hd/2]: add a heads axis.
    c = cos[..., None, :]
    s = sin[..., None, :]
    ra = a * c - b * s
    rb = a * s + b * c
    out = jnp.stack([ra, rb], axis=-1)  # [..., T, H, hd/2, 2]
    # Rotation in the f32 cos/sin dtype, result back in x's dtype: under
    # bf16 mixed precision q/k must stay bf16 into the MXU matmul.
    return out.reshape(x.shape).astype(x.dtype)
