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


def _quantize_weights(tree, min_size, quantize_leaf):
    """Shared walk for the weight-only quantizers: rewrite each big 2-D
    matmul weight (a ``{"w": [in, out], ...}`` linear param dict) to
    ``{"w_q": int [in, out], "w_s": f32 [out], ...}``. Norms, biases,
    embeddings, and anything small or non-matmul stay f32 (only dicts
    that look like linear params are rewritten)."""
    def is_quantizable(node):
        w = node.get("w")
        return (w is not None and hasattr(w, "ndim") and w.ndim == 2
                and w.size >= min_size
                and jnp.issubdtype(w.dtype, jnp.floating))

    def walk(node):
        if isinstance(node, dict):
            if is_quantizable(node):
                q, s = quantize_leaf(node["w"].astype(jnp.float32))
                out = {k: walk(v) for k, v in node.items() if k != "w"}
                out["w_q"] = q
                out["w_s"] = s
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)


def quantize_weights_int8(tree, min_size: int = 1 << 16):
    """Weight-only int8 for serving rollouts: symmetric per-output-channel
    quantization of the big matmul weights. ops.layers.linear dequantizes
    on the fly (int8 -> bf16 widen in-register, f32 accumulate, scale
    after), so HBM reads 1 byte/weight instead of 4 (f32) or 2 (bf16). The
    B=1 autoregressive rollout is HBM-bound on the weight stream
    (BASELINE.md roofline row), so this is the remaining single-chip lever
    after bf16. Quantify drift on trained weights before serving
    (tools/measure_bf16_drift.py --dtype int8)."""
    def leaf(w):
        s = jnp.max(jnp.abs(w), axis=0) / 127.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s
    return _quantize_weights(tree, min_size, leaf)


def quantize_weights_int4(tree, min_size: int = 1 << 16):
    """Weight-only int4 (native ``jnp.int4`` storage — XLA packs two
    nibbles per byte in HBM, halving the weight stream vs int8 again).
    Same structure as int8: symmetric per-output-channel, range [-7, 7],
    dequantized by the usual ``w_q.astype(bf16) * w_s`` inside
    ops.layers.linear. The int4 grid is 16x coarser than int8's, so ALWAYS
    measure drift on the trained weights first
    (tools/measure_bf16_drift.py --dtype int4).

    Two JAX-version quirks are worked around here: (1) the int4 convert
    must run under jit (eager ``astype(int4)`` is unsupported); (2) on
    TPU the S4 result must be produced directly in the PACKED layout
    (``sub_byte_element_size_in_bits=4``) via an explicit out format —
    a jit's default S4 output is byte-per-nibble, and the packed<->
    unpacked relayout device_put recurses in this JAX version the moment
    the array is passed to any other jitted function."""
    def _convert(w):
        s = jnp.max(jnp.abs(w), axis=0) / 7.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int4)
        return q, s

    if jax.default_backend() == "tpu":
        from jax._src.layout import Format, Layout
        import jax.sharding as shd
        sharding = shd.SingleDeviceSharding(jax.devices()[0])
        packed = Format(Layout(major_to_minor=(0, 1),
                               tiling=((8, 128), (8, 1)),
                               sub_byte_element_size_in_bits=4), sharding)
        default = Format(None, sharding)
        leaf = jax.jit(_convert, out_shardings=(packed, default))
    else:
        leaf = jax.jit(_convert)
    return _quantize_weights(tree, min_size, leaf)


# Short CLI/tool flag -> TrainConfig.compute_dtype policy name. Single
# source of truth for every surface that takes the short spelling
# (sea_tpu/cli.py --compute_dtype, tools/bench_training.py --dtype).
POLICY_BY_FLAG = {"f32": "float32", "bf16": "bfloat16",
                  "bf16_mixed": "bfloat16_mixed",
                  "bf16_shadow": "bfloat16_shadow"}


def train_cast(compute_dtype: str):
    """(cast_params, cast_inputs) for a TrainConfig.compute_dtype policy.

    - "float32": identity (the reference's numerics).
    - "bfloat16": weight-only — big matmul weights bf16 inside the loss,
      activations f32 (bandwidth win, minimal drift).
    - "bfloat16_mixed": true mixed precision — ALL floating params and the
      batch inputs bf16, so every matmul runs bf16xbf16 on the MXU.
      Numerically-sensitive interiors stay f32 by construction: attention
      scores/softmax (ops/attention.py preferred_element_type + the Pallas
      kernel's f32 accumulators), LayerNorm/AdaLN statistics
      (ops/layers.py), RoPE rotation, and the loss (train steps upcast
      model outputs to f32 before MSE/KL). AdamW master params stay f32 —
      gradients emerge f32 through the cast.
    """
    if compute_dtype == "float32":
        return (lambda p: p), (lambda *xs: xs)
    if compute_dtype == "bfloat16":
        return cast_weights_bf16, (lambda *xs: xs)
    if compute_dtype in ("bfloat16_mixed", "bfloat16_shadow"):
        # "bfloat16_shadow": same casts as mixed, but the temporal train
        # steps skip cast_params entirely — the forward runs on the
        # persistent bf16 copy kept in the optimizer state
        # (train/optim.with_bf16_shadow), so the per-step f32 master
        # weight read disappears and gradients emerge in bf16.
        def cast_inputs(*xs):
            return tuple(x.astype(jnp.bfloat16) for x in xs)
        return to_bf16, cast_inputs
    raise ValueError(
        f"unknown compute_dtype {compute_dtype!r}; expected 'float32', "
        "'bfloat16' (weight-only), 'bfloat16_mixed', or "
        "'bfloat16_shadow' (mixed + persistent bf16 weight copy in the "
        "optimizer state)")


def cast_weights_bf16(tree, min_size: int = 1 << 16):
    """Weight-only bf16: cast the big 2-D MATMUL weights (the "w" entry of
    linear param dicts, >= min_size elements) to bf16; keep norms, biases,
    positional-encoding tables (pe/pool_pe buffers), and everything small
    in f32. Activations stay f32 (mixed-dtype matmuls read bf16 weights
    from HBM and widen in-register), capturing most of the HBM-bandwidth
    win of full bf16 at a fraction of the drift. Same structure-aware walk
    as quantize_weights_int8, so non-weight buffers are never touched."""
    def is_castable(node):
        w = node.get("w")
        return (w is not None and hasattr(w, "ndim") and w.ndim == 2
                and w.size >= min_size
                and jnp.issubdtype(w.dtype, jnp.floating))

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if is_castable(node):
                out["w"] = node["w"].astype(jnp.bfloat16)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)
