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


def _quantize_weights(tree, min_size, quantize_leaf, q_key="w_q",
                      extra_pred=None, post=None):
    """Shared walk for the weight-only quantizers: rewrite each big 2-D
    matmul weight (a ``{"w": [in, out], ...}`` linear param dict) to
    ``{q_key: quantized, "w_s": f32 [out], ...}`` — q_key is "w_q"
    (int8 [in, out]) or "w_p4" (packed-nibble uint8 [in/2, out]).
    Norms, biases, embeddings, and anything small or non-matmul stay f32
    (only dicts that look like linear params are rewritten; extra_pred
    can veto per-weight, e.g. odd input dims for nibble packing).
    quantize_leaf(w, path) -> (q, s); post(out_dict, w, q, s, path), if
    given, may mutate the rewritten dict (e.g. bias correction)."""
    def is_quantizable(node):
        w = node.get("w")
        return (w is not None and hasattr(w, "ndim") and w.ndim == 2
                and w.size >= min_size
                and jnp.issubdtype(w.dtype, jnp.floating)
                and (extra_pred is None or extra_pred(w)))

    def walk(node, path=()):
        if isinstance(node, dict):
            if is_quantizable(node):
                w = node["w"].astype(jnp.float32)
                q, s = quantize_leaf(w, path)
                out = {k: walk(v, path + (k,))
                       for k, v in node.items() if k != "w"}
                out[q_key] = q
                out["w_s"] = s
                if post is not None:
                    post(out, w, q, s, path)
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,))
                              for i, v in enumerate(node))
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
    def leaf(w, path):
        s = jnp.max(jnp.abs(w), axis=0) / 127.0
        s = jnp.where(s == 0.0, 1.0, s)
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s
    return _quantize_weights(tree, min_size, leaf)


def quantize_weights_int4(tree, min_size: int = 1 << 16,
                          scale: str = "mse", act_stats=None,
                          bias_correct: bool = True):
    """Weight-only int4: packed-nibble uint8 storage — 0.5 byte/weight in
    HBM, symmetric per-output-channel, range [-7, 7]. Each big linear
    weight becomes {"w_p4": uint8 [in/2, out], "w_s": f32 [out]}
    (ops/quant_matmul.pack_int4: two values along the INPUT dim per byte).
    ops.layers.linear serves it through int4_matmul, which picks per call
    between the Pallas dequant-matvec kernel (serving-shaped calls on big
    matrices — ~1.3x over XLA's fused S4 dequant on the MLP matvecs that
    dominate the B=1 rollout's weight stream, tools/bench_quant_matvec.py)
    and an XLA-fused two-plane dequant dot (everything else; a kernel
    dispatch per tiny matvec was measured slower — the cylinder rollout
    regressed 8% all-kernel; threshold quant_matmul._KERNEL_MIN_ELEMS).

    uint8 deliberately replaces round-3's earlier native-jnp.int4 (S4)
    storage: once the program also contains the Pallas kernel, XLA picks
    S4 argument layouts that differ from the one pinned buffer layout the
    S4 path could produce, and the packed<->unpacked S4 relayout
    device_put recurses in this JAX version. Bytes in HBM are identical,
    and uint8 params are trivially checkpointable and shardable.

    The int4 grid is 16x coarser than int8's, so ALWAYS measure drift on
    the trained weights first (tools/measure_bf16_drift.py --dtype int4).

    scale: "mse" (default — per-column MSE-optimal clip search) or "max"
    (plain column-max scaling; kept so the drift tool can A/B the two on
    trained weights: measure_bf16_drift.py --int4_scaling max).

    act_stats: optional activation statistics from
    utils.calibration (``{path: {"mean": [K], "sq": [K], ...}}``, collected
    on the SAME tree layout — fuse attention projections first). When
    given, the clip search minimizes the diagonal-Hessian-weighted error
    ``sum_k E[x_k^2] (q s - w)^2`` — the second-order approximation of the
    layer's OUTPUT error — instead of plain weight MSE, and (with
    bias_correct) the systematic output error ``E[x] @ (w - q s)`` is
    folded into the layer bias (creating one if the linear had none; the
    serving `linear()` applies any "b" present). Both are standard PTQ
    refinements (Nagel et al. data-free quantization; GPTQ's diag-H
    special case); measured on trained weights by
    tools/measure_bf16_drift.py --int4_scaling cal.
    """
    from sea_tpu.ops.quant_matmul import pack_int4

    if scale not in ("mse", "max"):
        raise ValueError(f"scale must be 'mse' or 'max', got {scale!r}")

    @jax.jit
    def _leaf(w, d):
        # MSE-optimal per-column clip: max-scaling spends the 4-bit grid
        # on the column's single largest weight (~4 sigma for the shipped
        # matrices), leaving every other weight a coarser cell than
        # necessary. Sweep 13 clip ratios per column and keep the scale
        # minimizing reconstruction MSE — cuts the per-matmul noise from
        # ~15% to ~11% on gaussian weights (test_int4_weight_quantization
        # pins the A/B) with zero serving-time cost (same storage, same
        # kernel; the optimum sits near 0.7x the column max).
        s_max = jnp.max(jnp.abs(w), axis=0) / 7.0          # [N]
        s_max = jnp.where(s_max == 0.0, 1.0, s_max)
        if scale == "max":
            q = jnp.clip(jnp.round(w / s_max), -7, 7)
            return pack_int4(q.astype(jnp.int8)), s_max
        best_s, best_err = s_max, jnp.full(s_max.shape, jnp.inf)
        # Unrolled sweep keeps the working set at one [K, N] temporary
        # (a stacked [R, K, N] candidate tensor would be ~1.7 GB for the
        # multiphase MLP weight).
        for r in [0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7,
                  0.75, 0.8, 0.85, 0.9, 0.95, 1.0]:
            cand = s_max * r                               # [N]
            q_c = jnp.clip(jnp.round(w / cand), -7, 7)
            # d = per-input-channel weight (E[x^2] under calibration,
            # ones otherwise): minimizes the 2nd-order output error
            err = jnp.sum(d * (q_c * cand - w) ** 2, axis=0)  # [N]
            best_s = jnp.where(err < best_err, cand, best_s)
            best_err = jnp.minimum(err, best_err)
        s = best_s
        q = jnp.clip(jnp.round(w / s), -7, 7)
        return pack_int4(q.astype(jnp.int8)), s

    def leaf(w, path):
        stats = act_stats.get(path) if act_stats else None
        d = (stats["sq"].astype(jnp.float32).reshape(-1, 1)
             if stats is not None else jnp.ones((w.shape[0], 1),
                                                jnp.float32))
        return _leaf(w, d)

    def post(out, w, q, s, path):
        # Bias correction: fold the systematic output error of the
        # quantized weight, E[x] @ (w - q s), into the layer bias so the
        # quantized layer is unbiased on the calibration distribution.
        stats = act_stats.get(path) if act_stats else None
        if not bias_correct or stats is None:
            return
        from sea_tpu.ops.quant_matmul import unpack_int4
        w_hat = unpack_int4(out["w_p4"], jnp.float32) * s
        db = stats["mean"].astype(jnp.float32) @ (w - w_hat)   # [N]
        out["b"] = (out["b"] + db) if "b" in out else db

    def even_input_dim(w):
        # odd input dims can't pack two nibbles per byte; leave them f32
        # (no shipped config has one — all embed/down dims are even)
        return w.shape[0] % 2 == 0

    return _quantize_weights(tree, min_size, leaf, q_key="w_p4",
                             extra_pred=even_input_dim, post=post)


def fuse_attention_projections(temporal_params):
    """Serving transform for TEMPORAL params: merge attention input
    projections so the B=1 rollout issues fewer matvec dispatches per
    step — q+k+v -> one "qkv" linear for self-attention (its query and
    key/value streams are the same tensor) and k+v -> one "kv" linear
    for the cross-attentions (k and v always share the key/value input).
    ops.attention.mha/mha_step consume the fused entries and split the
    output; per-output-column math is unchanged, so results match the
    unfused params to roundoff (tests/test_rollout.py) and per-channel
    quantization grids are IDENTICAL (w_s is per column).

    Apply BEFORE cast_weights_bf16/quantize_weights_* so the fused
    weight is cast/quantized as one matrix. Measured on the all-kernel
    int4 cylinder rollout: ~26 -> ~18 matvecs/step (docs/ROUND3.md).

    Single-chip serving only: head-parallel TP shards q/k/v on the head
    axis, and a fused layout would hand each shard whole projections
    instead of its own heads' slices (parallel/mesh._tp_attention_spec
    keeps the unfused layout; the CLI's sharded serving path does not
    fuse)."""
    def fuse(att, keys, name):
        merged = {"w": jnp.concatenate([att[k]["w"] for k in keys], axis=1)}
        if "b" in att[keys[0]]:
            merged["b"] = jnp.concatenate([att[k]["b"] for k in keys],
                                          axis=0)
        out = {k: v for k, v in att.items() if k not in keys}
        out[name] = merged
        return out

    def fuse_list(lst, keys, name):
        return [fuse_list(a, keys, name) if isinstance(a, list)
                else (fuse(a, keys, name) if a is not None else None)
                for a in lst]

    out = dict(temporal_params)
    blocks = []
    for block in temporal_params["blocks"]:
        b = dict(block)
        b["self_attn"] = fuse_list(block["self_attn"], ("q", "k", "v"),
                                   "qkv")
        for key in ("cross_attn", "cross_attn_ib"):
            if key in block and isinstance(block[key], list):
                b[key] = fuse_list(block[key], ("k", "v"), "kv")
        blocks.append(b)
    out["blocks"] = blocks
    return out


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


def teacher_forced_drift(params_ref, params_reduced, cfg, src, ib,
                         *, max_windows: int = 2) -> float:
    """Per-step (teacher-forced) relative L2 between a reference and a
    reduced-precision temporal model on the SAME inputs — the chaos-free
    fidelity metric for reduced-precision serving (an autoregressive
    rollout amplifies per-step noise exponentially, so rollout-space
    rel-L2 measures "same trajectory", not fidelity; measured 2026-08-19,
    see tools/measure_bf16_drift.py and BASELINE.md round-3c row).

    src: [B, T, G, E] latent windows; ib: [B, T, ib_num]. Uses at most
    ``max_windows`` windows — a seconds-long forward at serving shapes,
    cheap enough to run per loaded checkpoint (the CLI's --precision
    drift gate; drift is a property of the CHECKPOINT, not the config,
    so numbers measured on other weights do not transfer)."""
    from sea_tpu.models.temporal import temporal_forward
    s = jnp.asarray(src[:max_windows])
    i = jnp.asarray(ib[:max_windows])
    ref = temporal_forward(params_ref, cfg, s, i).astype(jnp.float32)
    red = temporal_forward(params_reduced, cfg, s, i).astype(jnp.float32)
    return float(jnp.linalg.norm(red - ref)
                 / (jnp.linalg.norm(ref) + 1e-8))
