"""Functional NN primitives (pure pytree params + apply functions).

Behavioral mirror of the reference models/base_blocks.py, re-expressed as
JAX-idiomatic pure functions over parameter pytrees (nested dicts of
jnp.ndarray). Numerics notes:

- GELU: the reference uses torch.nn.GELU() which is the *exact* erf form, so
  every gelu here is ``jax.nn.gelu(x, approximate=False)``.
- LayerNorm eps is 1e-5 everywhere (base_blocks.py:88, torch default).
- Two init families exist in the reference:
  * ``normal002``: N(0, 0.02) weights / zero bias, applied by the models'
    ``_init_weights`` (encoder_decoder.py:96-103, temporal.py:395-402).
  * ``torch_default``: PyTorch's default Linear init (kaiming-uniform,
    bound 1/sqrt(fan_in)), which applies to modules constructed *after*
    ``self.apply(_init_weights)`` ran — notably the spatial down/up-scale
    MLP heads (encoder_decoder.py:89-94,126-135 construction order quirk).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, *, bias: bool = True,
                init: str = "normal002", dtype=jnp.float32):
    """init: 'normal002' (N(0,.02)/zero-bias) or 'torch_default'."""
    wkey, bkey = jax.random.split(key)
    if init == "normal002":
        w = 0.02 * jax.random.normal(wkey, (d_in, d_out), dtype)
        b = jnp.zeros((d_out,), dtype) if bias else None
    elif init == "torch_default":
        bound = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(wkey, (d_in, d_out), dtype, -bound, bound)
        b = (jax.random.uniform(bkey, (d_out,), dtype, -bound, bound)
             if bias else None)
    else:
        raise ValueError(f"unknown init {init!r}")
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


# Optional activation-stats hook (utils/calibration.py). None except inside
# capture_activation_stats(); eager-only — traced calls are skipped there.
_CALIBRATION = None


def linear(params, x, *, tp_role: Optional[str] = None):
    """``tp_role``: how this weight is sharded over the model axis when
    the enclosing trace is tensor-parallel (parallel/mesh specs) —
    'col' (output dim sharded: first MLP linear, attention q/k/v),
    'row' (input dim sharded: last MLP linear, attention out-proj), or
    None (replicated). Only consulted for the quantized serving paths;
    call sites that are never TP-sharded can ignore it."""
    if _CALIBRATION is not None:
        _CALIBRATION.record(params, x)
    if "w_p4" in params:
        # int4 weight-only serving path (utils.precision.
        # quantize_weights_int4): packed-nibble Pallas matvec on TPU for
        # serving shapes, jnp dequant + XLA dot otherwise. Under a
        # multi-device GSPMD trace (ops.dispatch.kernel_sharding) the
        # kernel runs through shard_map — batch-sharded with replicated
        # weights (pure DP), and since round 5 also with the weight
        # itself sharded over the model axis via the col/row Megatron
        # decompositions (parallel/kernel_shard.can_shard_int4_tp).
        import math as _math
        from sea_tpu.ops.dispatch import kernel_sharding
        from sea_tpu.ops.quant_matmul import int4_matmul, kernel_supported
        ctx = kernel_sharding()
        y = None
        if ctx is not None and x.ndim > 1:
            from sea_tpu.parallel.kernel_shard import (
                can_shard_int4, can_shard_int4_tp, sharded_int4_matmul,
                sharded_int4_matmul_tp)
            nd = ctx.mesh.shape[ctx.batch_axis]
            nm = ctx.mesh.shape.get(ctx.head_axis, 1)
            K, N = x.shape[-1], params["w_p4"].shape[1]
            # Only dim 0 is sharded; local rows = (B/nd) * middle dims.
            rows_local = ((x.shape[0] // nd)
                          * _math.prod(x.shape[1:-1], start=1))
            if nm > 1 and tp_role in ("col", "row"):
                K_l = K if tp_role == "col" else K // nm
                N_l = N // nm if tp_role == "col" else N
                if (can_shard_int4_tp(ctx, x.shape[0], K, N, tp_role)
                        and kernel_supported(rows_local, K_l, N_l)):
                    y = sharded_int4_matmul_tp(ctx, x, params["w_p4"],
                                               params["w_s"], tp_role)
            elif can_shard_int4(ctx, x.shape[0]) and kernel_supported(
                    rows_local, K, N):
                y = sharded_int4_matmul(ctx, x, params["w_p4"],
                                        params["w_s"])
        if y is None:
            # Inside a multi-device trace that could NOT shard_map the
            # kernel (undecomposable TP'd weights, uneven batch), force
            # the XLA dequant path: a bare pallas call has no GSPMD
            # partitioning rule and would all-gather its operands every
            # call (review finding).
            y = int4_matmul(x, params["w_p4"], params["w_s"],
                            force="jnp" if ctx is not None else None)
    elif "w_q" in params:
        # int8 weight-only serving path (utils.precision.
        # quantize_weights_int8): widen int8 -> bf16 in-register, f32
        # accumulation via the mixed-dtype dot, per-output-channel scale.
        y = (x @ params["w_q"].astype(jnp.bfloat16)) * params["w_s"]
    else:
        y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------------------------------------------------------------------
# LayerNorm family
# ---------------------------------------------------------------------------

def init_layernorm(dim: int, *, bias: bool = True, dtype=jnp.float32):
    """torch nn.LayerNorm-style (weight+bias) or weight-only
    (base_blocks.py:80-88 LayerNorm with bias=False)."""
    p = {"w": jnp.ones((dim,), dtype)}
    if bias:
        p["b"] = jnp.zeros((dim,), dtype)
    return p


def layernorm(params, x, eps: float = LN_EPS):
    # Statistics in f32 regardless of input dtype (bf16 mean/var loses
    # ~3 decimal digits); result back in the input dtype so bf16
    # mixed-precision activations stay bf16 through the residual stream.
    # No-op for the default f32 path.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["w"]
    if "b" in params:
        y = y + params["b"]
    return y.astype(x.dtype)


def init_adaln(key, embed_dim: int, cond_dim: int, *, init: str = "normal002",
               dtype=jnp.float32):
    """Adaptive LayerNorm (base_blocks.py:330-350): base learnable
    (weight, bias) plus a cond -> SiLU-MLP producing per-token (weight, bias)
    deltas; cond weight gets +1 before combining."""
    k1, k2 = jax.random.split(key)
    return {
        "w": jnp.ones((embed_dim,), dtype),
        "b": jnp.zeros((embed_dim,), dtype),
        "cond_fc1": init_linear(k1, cond_dim, 2 * embed_dim, init=init,
                                dtype=dtype),
        "cond_fc2": init_linear(k2, 2 * embed_dim, 2 * embed_dim, init=init,
                                dtype=dtype),
    }


def adaln_cond(params, cond):
    """The ib-only half of AdaLN: cond -> (cond_weight + 1, cond_bias).

    Depends ONLY on the conditioning scalars, not on x — so over an
    autoregressive rollout it can be computed ONCE for the whole horizon
    (models/temporal.precompute_cond_tables) instead of re-streaming the
    cond-MLP weights from HBM every scan step (~1/3 of the cylinder
    preset's serving weight stream)."""
    h = linear(params["cond_fc1"], cond)
    h = jax.nn.silu(h)
    h = linear(params["cond_fc2"], h)
    cw, cb = jnp.split(h, 2, axis=-1)
    return cw + 1.0, cb


# A/B switch for the fused AdaLN-modulate Pallas kernel
# (ops/fused_adaln.py): one VMEM pass instead of XLA's reduce +
# elementwise fusions on the [B, T, E] stream (round-4 ablation: ~11%
# of the cylinder train step). Dispatch is shape-gated to the
# teacher-forced time-constant-cond training calls.
FUSED_ADALN = True


def adaln_modulate(params, x, cw, cb, eps: float = LN_EPS):
    """The x half of AdaLN: normalize and apply (base + cond) scale/shift.
    f32 statistics, input-dtype output (see layernorm)."""
    if FUSED_ADALN:
        from sea_tpu.ops.dispatch import (attention_kernels_allowed,
                                          kernel_sharding)
        from sea_tpu.ops.fused_adaln import (fused_adaln_modulate,
                                             fused_supported)
        cw_a, cb_a = jnp.asarray(cw), jnp.asarray(cb)
        if attention_kernels_allowed() and "w" in params:
            ctx = kernel_sharding()
            if ctx is None:
                if fused_supported(x, cw_a, cb_a):
                    return fused_adaln_modulate(x, cw_a, cb_a, params["w"],
                                                params["b"], eps)
            else:
                # Multi-device GSPMD trace: dispatch through shard_map
                # over the batch axis — a bare pallas call would force
                # operand all-gathers, and a naive shard_map wrap of the
                # custom VJP would silently drop the dw/db psum in its
                # check_vma=False transpose (kernel_shard wrapper adds
                # it explicitly).
                from sea_tpu.parallel.kernel_shard import (
                    can_shard_fused_adaln, sharded_fused_adaln)
                if can_shard_fused_adaln(ctx, x, cw_a, cb_a):
                    return sharded_fused_adaln(ctx, x, cw_a, cb_a,
                                               params["w"], params["b"],
                                               eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normalized = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normalized * (params["w"] + cw) + (params["b"] + cb)
    return out.astype(x.dtype)


def adaln(params, x, cond, eps: float = LN_EPS):
    """x: [..., D], cond: broadcastable [..., cond_dim] (per-token).

    Exact formula of base_blocks.py:343-350 including the ``weight + 1`` and
    additive-base quirks: out = norm(x) * (base_w + (cond_w+1)) + (base_b + cond_b).
    """
    cw, cb = adaln_cond(params, cond)
    return adaln_modulate(params, x, cw, cb, eps)


def apply_norm(params, x, cond=None):
    """Dispatch on param structure: AdaLN if cond_fc1 present, else LayerNorm.

    Mirrors the reference's call-compatibility trick where plain LayerNorm
    accepts and ignores ``cond`` (base_blocks.py:87)."""
    if "cond_fc1" in params:
        return adaln(params, x, cond)
    return layernorm(params, x)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

# When True (default), elementwise dropout masks come from the same
# murmur-style counter hash the flash-attention kernel uses
# (ops/flash_attention.dropout_scale_from_positions) keyed on
# (key words, flat element position) instead of jax.random.bernoulli.
# Same Bernoulli(rate) distribution, deterministic per (key, position),
# but the mask is a handful of integer VPU ops XLA fuses straight into
# the consumer — no threefry tensor materializing through HBM (the
# round-4 cylinder-train ablation charged -17% of the step to dropout
# mask generation). Flip False to A/B the threefry path
# (tools/bench_cylinder_ablation.py).
HASH_DROPOUT = True


def dropout(x, rate: float, key: Optional[jax.Array], deterministic: bool):
    if deterministic or rate == 0.0 or key is None:
        return x
    if HASH_DROPOUT:
        from sea_tpu.ops.flash_attention import dropout_scale_from_positions
        words = (jax.random.key_data(key)
                 if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
                 else key)
        words = words.reshape(-1).astype(jnp.uint32)
        s0 = jax.lax.bitcast_convert_type(words[0], jnp.int32)
        s1 = jax.lax.bitcast_convert_type(words[-1], jnp.int32)
        pos = jax.lax.iota(jnp.int32, x.size).reshape(x.shape)
        scale = dropout_scale_from_positions(s0, s1, jnp.int32(0), pos,
                                             jnp.int32(0), rate=rate)
        return x * scale.astype(x.dtype)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def init_mlp(key, dim_in: int, *, scale_ratio: float = 4, dim_out=None,
             num_layers=None, init: str = "normal002", dtype=jnp.float32):
    """Reference MLP (base_blocks.py:9-47): GELU MLP with torch-default
    LayerNorms between hidden layers. The reference's ``residual_projection``
    is created when dim_in != dim_out but never used in forward
    (base_blocks.py:15-17 dead code) — we do not create it.

    Layer sequence for num_layers in (None, 1):
        Linear(in->scaled) -> LN(scaled) -> GELU -> Linear(scaled->out)
    For num_layers = L > 1:
        [Linear -> LN -> GELU] x (L-1) -> Linear(scaled->out)
    """
    if dim_out is None:
        dim_out = dim_in
    scaled = max(1, int(dim_in * scale_ratio))
    n = 1 if num_layers is None else num_layers
    keys = jax.random.split(key, max(n, 2))
    layers = []
    if n == 1:
        layers.append({"lin": init_linear(keys[0], dim_in, scaled, init=init,
                                          dtype=dtype),
                       "ln": init_layernorm(scaled, dtype=dtype)})
        layers.append({"lin": init_linear(keys[1], scaled, dim_out, init=init,
                                          dtype=dtype)})
    else:
        for i in range(n):
            if i == 0:
                entry = {"lin": init_linear(keys[i], dim_in, scaled, init=init,
                                            dtype=dtype),
                         "ln": init_layernorm(scaled, dtype=dtype)}
            elif i == n - 1:
                entry = {"lin": init_linear(keys[i], scaled, dim_out,
                                            init=init, dtype=dtype)}
            else:
                entry = {"lin": init_linear(keys[i], scaled, scaled, init=init,
                                            dtype=dtype),
                         "ln": init_layernorm(scaled, dtype=dtype)}
            layers.append(entry)
    return {"layers": layers}


def _tp_hidden_constraint(x):
    """Pin an MLP hidden activation sharded over the TP ('model') axis
    when tracing a multi-device program (ops.dispatch.kernel_sharding).

    With the MLP weights Megatron-sharded (parallel/mesh._tp_mlp_spec),
    GSPMD left alone may choose to all-gather the hidden activation for
    the LayerNorm between the two linears; pinned sharded, the LN's
    per-token mean/var over the hidden axis lowers to partial sums + a
    2-scalar-per-token psum — the cheap distributed-LN form — and the
    hidden activation (the widest tensor in the block, 8x the embed dim)
    never materializes unsharded."""
    from sea_tpu.ops.dispatch import kernel_sharding
    ctx = kernel_sharding()
    if ctx is None:
        return x
    nm = ctx.mesh.shape.get(ctx.head_axis, 1)
    if nm <= 1 or x.shape[-1] % nm:
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    # Leading dims stay UNCONSTRAINED: a None here would mean REPLICATED,
    # which forcibly all-gathers the batch dim across 'data' in the
    # forward pass and — through the constraint's transpose — forces a
    # sharding transition SPMD can only do by full rematerialization in
    # the backward (the MULTICHIP_r04 'Involuntary full rematerialization'
    # wall; round-4 VERDICT weakness 4). Pinning ONLY the hidden axis
    # lets GSPMD keep the batch sharding it already has on both passes.
    u = PartitionSpec.UNCONSTRAINED
    spec = PartitionSpec(*([u] * (x.ndim - 1) + [ctx.head_axis]))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, spec))


def mlp(params, x, *, dropout_rate: float = 0.0, dropout_key=None,
        deterministic: bool = True):
    n = len(params["layers"])
    for i, entry in enumerate(params["layers"]):
        # TP roles mirror parallel/mesh._tp_mlp_spec: first linear
        # column-parallel, last row-parallel, middles replicated.
        role = ("col" if i == 0 else "row" if i == n - 1 else None) \
            if n >= 2 else None
        x = linear(entry["lin"], x, tp_role=role)
        if i == 0 and n >= 2 and "ln" in entry:
            x = _tp_hidden_constraint(x)
        if "ln" in entry:
            # In the reference MLP, GELU always follows a hidden LayerNorm
            # (base_blocks.py:21-39), so activation is keyed on its presence
            # (structural metadata must not be a pytree leaf under jit).
            x = gelu(layernorm(entry["ln"], x))
    return dropout(x, dropout_rate, dropout_key, deterministic)


def init_scale_mlp(key, d_in: int, d_out: int, hidden: int, *,
                   init: str = "torch_default", dtype=jnp.float32):
    """up/downScaleMLP (base_blocks.py:49-78): Linear(no-bias) -> GELU ->
    Linear. Same structure both directions; only dims differ. These are the
    stage-1 encoder/decoder heads, which in the reference keep torch-default
    init (constructed after _init_weights ran, encoder_decoder.py:89-94)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, d_in, hidden, bias=False, init=init,
                           dtype=dtype),
        "fc2": init_linear(k2, hidden, d_out, init=init, dtype=dtype),
    }


def scale_mlp(params, x):
    return linear(params["fc2"], gelu(linear(params["fc1"], x)))


# ---------------------------------------------------------------------------
# Positional encodings / Fourier features
# ---------------------------------------------------------------------------

def sinusoidal_pe_table(d_model: int, max_len: int = 5000, dtype=jnp.float32):
    """Fixed sinusoidal table (base_blocks.py:355-368), including the odd-dim
    guard where cos uses only the first d_model//2 frequencies."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term[: d_model // 2]))
    return pe.astype(dtype)


def positional_encoding(pe_table, x, *, dropout_rate: float = 0.0,
                        dropout_key=None, deterministic: bool = True):
    """x: [..., T, D]; adds pe_table[:T] (result kept in x's dtype so a
    f32 table never silently upcasts a bf16 stream)."""
    T = x.shape[-2]
    x = (x + pe_table[:T]).astype(x.dtype)
    return dropout(x, dropout_rate, dropout_key, deterministic)


def init_learnable_pe(key, d_model: int, max_len: int = 5000,
                      dtype=jnp.float32):
    """PositionalEncodingLearnable (base_blocks.py:375-385): N(0,1) table."""
    return {"pe": jax.random.normal(key, (max_len, d_model), dtype)}


def learnable_pe(params, x, *, dropout_rate: float = 0.0, dropout_key=None,
                 deterministic: bool = True):
    T = x.shape[-2]
    x = (x + params["pe"][:T]).astype(x.dtype)
    return dropout(x, dropout_rate, dropout_key, deterministic)


def init_gaussian_fourier(key, input_dim: int, half_dim: int = 256,
                          scale: float = 1.0, dtype=jnp.float32):
    """GaussianFourierProjection (base_blocks.py:143-151): fixed random W,
    non-trainable. Marked by convention: callers must stop_gradient it, or we
    simply never include it in the trainable partition — since it has no
    gradient path issue (stop_gradient applied in apply)."""
    return {"W": jax.random.normal(key, (input_dim, half_dim), dtype) * scale}


def gaussian_fourier(params, x):
    W = jax.lax.stop_gradient(params["W"])
    proj = (x @ W) * (2.0 * math.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
