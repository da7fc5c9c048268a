"""Mixed-precision helpers.

The reference trains in f32 throughout. On TPU the recommended policy is
bf16 params/activations with f32 softmax statistics and f32 loss: attention
score accumulation is already forced to f32 in ops/attention.py and the
Pallas kernel; these helpers cast parameter pytrees between policies.
LayerNorm/AdaLN scale/bias stay f32 (tiny, numerically sensitive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast all floating leaves to dtype."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def to_bf16(tree):
    return cast_floating(tree, jnp.bfloat16)


def to_f32(tree):
    return cast_floating(tree, jnp.float32)


def cast_weights_bf16(tree, min_size: int = 1 << 16):
    """Weight-only bf16: cast 2D+ floating leaves with >= min_size elements
    (the big matmul weights) to bf16; keep norms, biases, and everything
    small in f32. Activations stay f32 (mixed-dtype matmuls read bf16
    weights from HBM and widen in-register), capturing most of the
    HBM-bandwidth win of full bf16 at a fraction of the drift."""
    def cast(x):
        if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                and x.ndim >= 2 and x.size >= min_size):
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree.map(cast, tree)
