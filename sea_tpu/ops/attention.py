"""Multi-head attention: one generic op covering the reference's four modules.

Reference modules (models/base_blocks.py) and how they map here:
- MultiHeadAttention        (:91-121)  -> mha(x, x, causal=False, rope=False)
- MaskedMultiHeadAttention  (:155-203) -> mha(x, x, causal=True,  rope=True)
- MultiHeadCrossAttention   (:205-242) -> mha(x1, x2, causal=False, rope=False)
- MaskedMultiHeadCrossAttention (:246-295) -> mha(x1, x2, causal=True, rope=True)

All share the same parameter structure: q/k/v Linear (with bias) and a
bias-free output projection. The causal mask is tril(ones, diagonal=src_len)
(base_blocks.py:173) — built on the fly as j <= i + src_len instead of
materializing a [max_len, max_len] buffer.

Softmax statistics are accumulated in float32 regardless of input dtype
(bf16-safe); outputs are cast back to the input dtype.

``mha_step`` is the incremental (KV-cache) form used by the rollout engine —
one query token against a fixed-capacity cache, numerically identical to the
full recompute for causal attention with deterministic (no-dropout) weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sea_tpu.ops.layers import dropout as _dropout
from sea_tpu.ops.layers import init_linear, linear
from sea_tpu.ops.rope import apply_rope, rope_cos_sin

NEG_INF = float("-inf")


def init_attention(key, embed_dim: int, n_heads: int, *,
                   init: str = "normal002", dtype=jnp.float32):
    assert embed_dim % n_heads == 0, (embed_dim, n_heads)
    kq, kk, kv, kp = jax.random.split(key, 4)
    return {
        "q": init_linear(kq, embed_dim, embed_dim, init=init, dtype=dtype),
        "k": init_linear(kk, embed_dim, embed_dim, init=init, dtype=dtype),
        "v": init_linear(kv, embed_dim, embed_dim, init=init, dtype=dtype),
        "proj": init_linear(kp, embed_dim, embed_dim, bias=False, init=init,
                            dtype=dtype),
    }


def _split_heads(x, n_heads):
    B, T, C = x.shape
    return x.reshape(B, T, n_heads, C // n_heads)


def _project_qkv(params, x_q, x_kv):
    """q/k/v projections, honoring the fused serving layouts produced by
    utils.precision.fuse_attention_projections: "qkv" (self-attention —
    requires x_q and x_kv to be the SAME tensor) or "kv" (shared
    key/value input). One matmul dispatch instead of three/two; the
    per-output-column math is identical to the unfused projections."""
    if "qkv" in params:
        if x_q is not x_kv:
            raise ValueError(
                "fused 'qkv' projections are only valid for self-attention "
                "(query and key/value inputs must be the same tensor); "
                "cross-attention params should carry fused 'kv' instead "
                "(utils.precision.fuse_attention_projections)")
        return jnp.split(linear(params["qkv"], x_q), 3, axis=-1)
    # tp_role='col': q/k/v output (head) dims shard over the model axis
    # (parallel/mesh._tp_attention_spec). Fused qkv/kv layouts exist only
    # in single-chip serving (the sharded path keeps unfused q/k/v).
    q = linear(params["q"], x_q, tp_role="col")
    if "kv" in params:
        k, v = jnp.split(linear(params["kv"], x_kv), 2, axis=-1)
    else:
        k = linear(params["k"], x_kv, tp_role="col")
        v = linear(params["v"], x_kv, tp_role="col")
    return q, k, v


def attention_core(q, k, v, *, causal: bool, src_len: int = 0,
                   dropout_rate: float = 0.0, dropout_key=None,
                   deterministic: bool = True, valid_len=None):
    """q: [B,Tq,H,hd], k/v: [B,Tk,H,hd] -> [B,Tq,H,hd].

    Plain XLA path; the Pallas flash kernel (ops/flash_attention.py) replaces
    this on TPU for long sequences. Kept as the reference implementation and
    CPU/test fallback.

    ``valid_len`` (scalar, may be traced): restrict attention to the prefix
    — keys at positions >= valid_len are masked out of the softmax. With
    it, a full-length forward reproduces the reference's growing-prefix
    rollout (train_utils.py:202-207) EXACTLY for the non-causal
    configurations (unmasked ib-attention, src_len != 0) where trailing
    positions would otherwise contaminate valid ones: correctness rests
    entirely on this KEY masking — garbage query rows (positions >=
    valid_len) still produce finite, nonzero outputs, but they can never
    feed back into valid positions because their keys are masked in
    every attention. (With valid_len >= 1, key 0 is always admitted, so
    no softmax row is ever fully masked in practice; the NaN scrub below
    is defense-in-depth for a hypothetical valid_len == 0, not a
    correctness dependency — round-4 advisor finding.)
    """
    hd = q.shape[-1]
    scale = hd ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    Tq, Tk = q.shape[1], k.shape[1]
    if causal:
        qi = jnp.arange(Tq)[:, None]
        kj = jnp.arange(Tk)[None, :]
        mask = kj <= qi + src_len
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    if valid_len is not None:
        kv_ok = jnp.arange(Tk) < valid_len
        scores = jnp.where(kv_ok[None, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if valid_len is not None:
        # Defense-in-depth only: a fully-masked row would softmax to NaN,
        # but with valid_len >= 1 key 0 is always admitted, so this is
        # unreachable in the bucketed engine (see docstring).
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    probs = _dropout(probs, dropout_rate, dropout_key, deterministic)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def mha(params, x_q, x_kv, *, n_heads: int, causal: bool, rope: bool,
        src_len: int = 0, dropout_rate: float = 0.0, dropout_key=None,
        deterministic: bool = True, impl: str = "auto", mesh=None,
        seq_axis: str = "seq", valid_len=None):
    """Full-sequence multi-head attention.

    x_q: [B, Tq, C]; x_kv: [B, Tk, C]. When ``rope`` is True the reference
    assumes Tq == Tk and rotates both streams with absolute positions 0..T-1
    (base_blocks.py:184,276).

    impl: "auto" (Pallas flash kernel on TPU for long deterministic
    sequences, XLA otherwise), "flash" (force the kernel), "xla" (force
    the reference path), "ring" (sequence-parallel over ``mesh``'s
    ``seq_axis`` — T sharded across devices, k/v shards rotated over ICI
    with jax.lax.ppermute; parallel/ring_attention.py).

    valid_len: optional (traced) scalar prefix length — see
    attention_core. Forces the XLA path (the flash/ring kernels have no
    dynamic key-validity mask); used by the masked bucketed prefix
    rollout engine for non-causal configs.
    """
    q, k, v = _project_qkv(params, x_q, x_kv)
    out = multihead_core(q, k, v, n_heads=n_heads, causal=causal,
                         rope=rope, src_len=src_len,
                         dropout_rate=dropout_rate, dropout_key=dropout_key,
                         deterministic=deterministic, impl=impl, mesh=mesh,
                         seq_axis=seq_axis, valid_len=valid_len)
    return linear(params["proj"], out, tp_role="row")


def multihead_core(q, k, v, *, n_heads: int, causal: bool, rope: bool,
                   src_len: int = 0, dropout_rate: float = 0.0,
                   dropout_key=None, deterministic: bool = True,
                   impl: str = "auto", mesh=None, seq_axis: str = "seq",
                   valid_len=None):
    """Everything between the q/k/v projections and the output projection:
    head split, RoPE, the ring/flash/XLA dispatch, head merge. Shared by
    ``mha`` and the stacked per-field attention path
    (models/temporal._stacked_attention), which batches the projections
    over fields but must run the attention math per field (the flash
    kernel and its dropout keys are per-call).

    q: [B, Tq, C]; k, v: [B, Tk, C] pre-head-split projected tensors.
    Returns [B, Tq, C].
    """
    B, Tq, C = q.shape
    q = _split_heads(q, n_heads)
    k = _split_heads(k, n_heads)
    v = _split_heads(v, n_heads)

    if rope:
        hd = C // n_heads
        cos_q, sin_q = rope_cos_sin(hd, jnp.arange(Tq), dtype=jnp.float32)
        q = apply_rope(q, cos_q, sin_q)
        Tk = k.shape[1]
        if Tk == Tq:
            cos_k, sin_k = cos_q, sin_q
        else:
            cos_k, sin_k = rope_cos_sin(hd, jnp.arange(Tk), dtype=jnp.float32)
        k = apply_rope(k, cos_k, sin_k)

    if impl == "ring":
        if valid_len is not None:
            raise ValueError("valid_len (masked prefix rollout) is not "
                             "supported under ring attention")
        if mesh is None:
            raise ValueError("impl='ring' needs a jax.sharding.Mesh with a "
                             f"'{seq_axis}' axis (see parallel.mesh."
                             "make_seq_mesh)")
        # Same semantics as the XLA fallback (layers.dropout): dropout only
        # applies when training AND a key is provided (the pool-exchange
        # site deliberately passes dropout_key=None).
        seed = None
        rate = 0.0
        if dropout_rate > 0.0 and not deterministic and \
                dropout_key is not None:
            rate, seed = dropout_rate, _key_to_seed(dropout_key)
        from sea_tpu.parallel.ring_attention import ring_attention
        out = ring_attention(q, k, v, mesh, axis=seq_axis, causal=causal,
                             src_len=src_len, dropout_rate=rate,
                             dropout_seed=seed)
        return out.reshape(B, Tq, C)

    use_flash = False
    if valid_len is not None:
        impl = "xla"  # the flash kernel has no dynamic key-validity mask
    if impl == "flash":
        if dropout_rate > 0.0 and not deterministic and dropout_key is None:
            raise ValueError(
                "impl='flash' with attention-probability dropout needs a "
                "dropout_key (the kernel seeds its in-kernel PRNG from it)")
        use_flash = True
    elif impl == "xla":
        use_flash = False
    elif impl == "auto":
        try:
            from sea_tpu.ops import flash_attention as _fa
            use_flash = _fa.flash_supported(
                q, k, causal=causal, dropout_rate=dropout_rate,
                deterministic=deterministic,
                has_dropout_key=dropout_key is not None)
        except ImportError:  # pragma: no cover
            use_flash = False

    sharding_ctx = None
    if use_flash:
        from sea_tpu.ops.dispatch import kernel_sharding
        sharding_ctx = kernel_sharding()
        if sharding_ctx is not None:
            from sea_tpu.parallel.kernel_shard import can_shard_attention
            if not can_shard_attention(sharding_ctx, B, n_heads):
                use_flash = False  # uneven shards: XLA partitions fine

    if use_flash:
        rate = dropout_rate if (dropout_rate > 0.0
                                and not deterministic) else 0.0
        seed = _key_to_seed(dropout_key) if rate > 0.0 else None
        if sharding_ctx is not None:
            # Multi-device GSPMD trace: run the kernel through shard_map
            # over the mesh's (batch, head) axes — the single-chip kernel
            # on each local shard, zero collectives, global-position
            # dropout hash (parallel/kernel_shard.py).
            from sea_tpu.parallel.kernel_shard import \
                sharded_flash_attention
            out = sharded_flash_attention(
                sharding_ctx, q, k, v, causal=causal, src_len=src_len,
                dropout_rate=rate, dropout_seed=seed)
        else:
            from sea_tpu.ops import flash_attention as _fa
            if rate > 0.0:
                out = _fa.flash_attention(q, k, v, causal=causal,
                                          src_len=src_len,
                                          dropout_rate=rate,
                                          dropout_seed=seed)
            else:
                out = _fa.flash_attention(q, k, v, causal=causal,
                                          src_len=src_len)
    else:
        out = attention_core(q, k, v, causal=causal, src_len=src_len,
                             dropout_rate=dropout_rate,
                             dropout_key=dropout_key,
                             deterministic=deterministic,
                             valid_len=valid_len)
    return out.reshape(B, Tq, C)


def _key_to_seed(key):
    """PRNGKey (typed or legacy uint32[2]) -> int32 seed words for the
    Pallas kernel's counter PRNG."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return jax.lax.bitcast_convert_type(key, jnp.int32).reshape(-1)[:2]


def mha_step(params, x_q_t, x_kv_t, cache, t, *, n_heads: int, rope: bool,
             src_len: int = 0):
    """Single-token incremental attention with a KV cache.

    x_q_t:  [B, C] query token at absolute position t.
    x_kv_t: [B, C] key/value token at absolute position t (for self-attention
            pass the same tensor; for the SEA cross-exchange pass the other
            stream's token).
    cache:  {"k": [B, H, T_max, hd], "v": [B, H, T_max, hd]} carried through
            jax.lax.scan; entries at positions > t are masked out. Head-major
            layout so the flash-decode kernel's [B*H, T, hd] view is a free
            reshape — time-major caches cost a full-cache relayout copy
            every rollout step to feed the Pallas operand.
    t:      scalar int32 absolute position.

    Returns (out [B, C], new_cache). Equivalent to the reference's
    prefix-recompute rollout (utils/train_utils.py:202-207) because causal
    attention output at position t depends only on tokens <= t + src_len and
    rollout runs with dropout disabled.
    """
    B, C = x_q_t.shape
    hd = C // n_heads
    q, k, v = _project_qkv(params, x_q_t, x_kv_t)
    q = q.reshape(B, 1, n_heads, hd)
    k = k.reshape(B, 1, n_heads, hd)
    v = v.reshape(B, 1, n_heads, hd)

    if rope:
        pos = jnp.full((1,), t, dtype=jnp.int32)
        cos, sin = rope_cos_sin(hd, pos, dtype=jnp.float32)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    quantized = "k_s" in cache
    if quantized:
        # int8 cache (init_kv_cache docstring): quantize this token with
        # its own per-(b, h) symmetric scale at write time.
        kq, ks = _quantize_token(k.transpose(0, 2, 1, 3)[:, :, 0])
        vq, vs = _quantize_token(v.transpose(0, 2, 1, 3)[:, :, 0])
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache["k"], kq[:, :, None], t, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache["v"], vq[:, :, None], t, axis=2)
        k_s = jax.lax.dynamic_update_slice_in_dim(
            cache["k_s"], ks[:, :, None], t, axis=2)
        v_s = jax.lax.dynamic_update_slice_in_dim(
            cache["v_s"], vs[:, :, None], t, axis=2)
        new_cache = {"k": cache_k, "v": cache_v, "k_s": k_s, "v_s": v_s}
    else:
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache["k"], k.transpose(0, 2, 1, 3).astype(cache["k"].dtype),
            t, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache["v"], v.transpose(0, 2, 1, 3).astype(cache["v"].dtype),
            t, axis=2)
        new_cache = {"k": cache_k, "v": cache_v}

    T_max = cache_k.shape[2]

    from sea_tpu.ops.decode_attention import (decode_attention,
                                              decode_supported)
    from sea_tpu.ops.dispatch import kernel_sharding
    ctx = kernel_sharding()
    B_loc, H_loc = B, n_heads
    kernel_ok = True
    if ctx is not None:
        # Multi-device GSPMD trace: gate on the per-device LOCAL shapes
        # and dispatch through shard_map (parallel/kernel_shard.py).
        # Uneven shards CANNOT fall back to the bare kernel — a pallas
        # call has no GSPMD partitioning rule, so tracing it unsharded
        # here would all-gather the KV cache every step (review finding);
        # the XLA cache attention partitions fine instead.
        from sea_tpu.parallel.kernel_shard import can_shard_attention
        if can_shard_attention(ctx, B, n_heads):
            nd = ctx.mesh.shape[ctx.batch_axis]
            nm = ctx.mesh.shape[ctx.head_axis]
            B_loc, H_loc = B // nd, n_heads // nm
        else:
            ctx = None
            kernel_ok = False
    if kernel_ok and src_len == 0 \
            and decode_supported(B_loc, T_max, H_loc, hd):
        # Fused flash-decode kernel: online softmax over the cache with
        # the k-block index clamped to position t via scalar prefetch —
        # blocks beyond t are never DMA'd, halving average cache traffic
        # over a rollout (ops/decode_attention.py; equality + A/B tested).
        scales = ((new_cache["k_s"], new_cache["v_s"]) if quantized
                  else (None, None))
        if ctx is not None:
            from sea_tpu.parallel.kernel_shard import \
                sharded_decode_attention
            out = sharded_decode_attention(ctx, q.reshape(B, n_heads, hd),
                                           cache_k, cache_v, t,
                                           k_scale=scales[0],
                                           v_scale=scales[1])
        else:
            out = decode_attention(q.reshape(B, n_heads, hd), cache_k,
                                   cache_v, t, k_scale=scales[0],
                                   v_scale=scales[1])
        out = out.astype(x_q_t.dtype).reshape(B, C)
        return linear(params["proj"], out, tp_role="row"), new_cache

    scale = hd ** -0.5
    if quantized:
        # int8 planes: the astype(bf16) fuses into the dot's operand read
        # (no dequantized copy materializes); the per-token scales fold
        # in per KEY column after the q@k dot and into the probabilities
        # before p@v.
        scores = jnp.einsum("bqhd,bhkd->bhqk", q,
                            cache_k.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * scale
        scores = scores * new_cache["k_s"][:, :, None, :]
    else:
        scores = jnp.einsum("bqhd,bhkd->bhqk", q, cache_k,
                            preferred_element_type=jnp.float32) * scale
    # Causality allows positions <= t + src_len, but the cache only holds
    # entries <= t; admitting t+1..t+src_len would attend to zero-initialized
    # slots and diverge from prefix recompute for src_len > 0.
    limit = jnp.minimum(t + src_len, t)
    valid = jnp.arange(T_max)[None, None, None, :] <= limit
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if quantized:
        probs_v = (probs * new_cache["v_s"][:, :, None, :]).astype(
            jnp.bfloat16)
        out = jnp.einsum("bhqk,bhkd->bqhd", probs_v,
                         cache_v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bhqk,bhkd->bqhd", probs.astype(cache_v.dtype),
                         cache_v, preferred_element_type=jnp.float32)
    out = out.astype(x_q_t.dtype).reshape(B, C)
    return linear(params["proj"], out, tp_role="row"), new_cache


def init_kv_cache(batch: int, t_max: int, n_heads: int, head_dim: int,
                  dtype=jnp.float32):
    """Head-major [B, H, T, hd] — see mha_step's cache contract.

    dtype=jnp.int8: QUANTIZED cache for batched serving — a batched
    rollout is cache-traffic-bound (the weight stream amortizes over B;
    BASELINE.md round-3e row), so int8 storage halves the dominant HBM
    stream vs bf16. Each token is quantized at WRITE time with its own
    per-(b, h, t) symmetric scale (stored beside the planes as "k_s"/
    "v_s" f32 [B, H, T]); reads fold the scales into the score/output
    math — scores scale per KEY column after the q@k dot, and the value
    scale folds into the probabilities before p@v — so the cache is
    never dequantized into a materialized f32 copy."""
    shape = (batch, n_heads, t_max, head_dim)
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        cache["k_s"] = jnp.zeros((batch, n_heads, t_max), jnp.float32)
        cache["v_s"] = jnp.zeros((batch, n_heads, t_max), jnp.float32)
    return cache


def _quantize_token(x, int_max: float = 127.0):
    """x: [B, H, hd] f32 -> (int8 [B, H, hd], scale f32 [B, H]).
    Symmetric per-(batch, head) max-abs scale; zero tokens get scale 0
    (the slot dequantizes to exact zeros)."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = amax / int_max
    q = jnp.where(scale[..., None] > 0.0, x / jnp.maximum(
        scale[..., None], 1e-30), 0.0)
    return jnp.round(q).astype(jnp.int8), scale
