"""shard_map wrappers that keep the Pallas kernels active in multi-device
GSPMD programs (round-3 VERDICT item 1).

Pallas calls have no GSPMD partitioning rule, so a bare kernel inside a
multi-device jit makes XLA all-gather its operands. But all three kernel
families are embarrassingly parallel over (batch, head):

- flash attention: each (b, h) attention matrix is independent,
- flash-decode:    each (b, h) cache row is independent,
- int4 matvec:     rows of the activation matrix are independent
                   (weights replicated under pure data parallelism).

So a shard_map over the mesh's (batch, head) axes runs the EXACT
single-chip kernel on each device's local shard with ZERO collectives —
GSPMD keeps doing global layout around it. These wrappers derive the
specs from ops.dispatch.KernelSharding; ops/attention.py and
ops/layers.py consult that context at trace time.

Dropout correctness: the flash kernels hash (seed, batch*head, global
q, global k) for their in-kernel masks. Under shard_map the local
(b, h) indices restart at 0 per device, so the wrapper passes a
local->global ``bh_map`` built from jax.lax.axis_index — the sharded
program drops bit-identically to the single-device one (pinned by
tests/test_kernel_shard.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sea_tpu.ops.dispatch import KernelSharding


def _axis_sizes(ctx: KernelSharding):
    return (ctx.mesh.shape[ctx.batch_axis], ctx.mesh.shape[ctx.head_axis])


def can_shard_attention(ctx: KernelSharding, batch: int, heads: int) -> bool:
    """shard_map needs even shards; fall back to XLA attention otherwise."""
    nd, nm = _axis_sizes(ctx)
    return batch % nd == 0 and heads % nm == 0


def _bh_map(ctx: KernelSharding, b_loc: int, h_loc: int, h_glob: int):
    """Local (b*h) grid index -> global, from the device's mesh position."""
    b0 = jax.lax.axis_index(ctx.batch_axis) * b_loc
    h0 = jax.lax.axis_index(ctx.head_axis) * h_loc
    return ((b0 + jnp.arange(b_loc, dtype=jnp.int32))[:, None] * h_glob
            + (h0 + jnp.arange(h_loc, dtype=jnp.int32))[None, :]).reshape(-1)


def sharded_flash_attention(ctx: KernelSharding, q, k, v, *, causal: bool,
                            src_len: int = 0, dropout_rate: float = 0.0,
                            dropout_seed=None):
    """flash_attention with batch/head dims sharded over ctx.mesh.

    q: [B, Tq, H, hd]; k, v: [B, Tk, H, hd] — B sharded over
    ctx.batch_axis, H over ctx.head_axis, T/hd replicated (sequence
    sharding goes through ring attention instead). Differentiable: the
    custom-vjp backward runs inside the shard_map transpose, i.e. the
    fused dQ/dK/dV kernels also execute shard-wise.
    """
    from sea_tpu.ops.flash_attention import _as_seed, flash_attention
    nd, nm = _axis_sizes(ctx)
    B, _, H, _ = q.shape
    b_loc, h_loc = B // nd, H // nm
    spec = P(ctx.batch_axis, None, ctx.head_axis, None)
    seed = _as_seed(dropout_seed)

    def body(q, k, v, seed):
        return flash_attention(
            q, k, v, causal=causal, src_len=src_len,
            dropout_rate=dropout_rate, dropout_seed=seed,
            bh_map=_bh_map(ctx, b_loc, h_loc, H))

    # check_vma=False: pallas_call has no varying-mesh-axes rule.
    return jax.shard_map(body, mesh=ctx.mesh,
                         in_specs=(spec, spec, spec, P()),
                         out_specs=spec, check_vma=False)(q, k, v, seed)


def sharded_decode_attention(ctx: KernelSharding, q, cache_k, cache_v, t,
                             *, k_scale=None, v_scale=None):
    """decode_attention (fused single-token cache attention) with
    batch/head dims sharded over ctx.mesh.

    q: [B, H, hd]; cache_k/v: [B, H, T, hd] head-major. The kernel's
    scalar-prefetch cache-block clamp (blocks beyond position t never
    DMA'd) now applies per shard — the ~2x batched-serving win survives
    --mesh serving instead of falling back to XLA cache attention.
    k_scale/v_scale: per-token f32 [B, H, T] scales for int8 caches.
    """
    from sea_tpu.ops.decode_attention import decode_attention
    spec_q = P(ctx.batch_axis, ctx.head_axis, None)
    spec_c = P(ctx.batch_axis, ctx.head_axis, None, None)
    spec_s = P(ctx.batch_axis, ctx.head_axis, None)
    t = jnp.asarray(t, jnp.int32)

    if k_scale is not None:
        def body_q8(q, ck, cv, ks, vs, t):
            return decode_attention(q, ck, cv, t, k_scale=ks, v_scale=vs)

        # check_vma=False: pallas_call has no varying-mesh-axes rule.
        return jax.shard_map(
            body_q8, mesh=ctx.mesh,
            in_specs=(spec_q, spec_c, spec_c, spec_s, spec_s, P()),
            out_specs=spec_q, check_vma=False)(q, cache_k, cache_v,
                                               k_scale, v_scale, t)

    def body(q, ck, cv, t):
        return decode_attention(q, ck, cv, t)

    # check_vma=False: pallas_call has no varying-mesh-axes rule.
    return jax.shard_map(body, mesh=ctx.mesh,
                         in_specs=(spec_q, spec_c, spec_c, P()),
                         out_specs=spec_q,
                         check_vma=False)(q, cache_k, cache_v, t)


def can_shard_int4(ctx: KernelSharding, rows: int) -> bool:
    """The REPLICATED-weight decomposition: x's leading dim shards over
    the batch axis, the packed weight replicates everywhere (each device
    in a model-axis column repeats the same local matvec — free, since
    replicated serving weights exist on every device anyway). For
    weights actually SHARDED over the model axis use the col/row
    decompositions below (can_shard_int4_tp)."""
    nd, nm = _axis_sizes(ctx)
    return rows % nd == 0 and rows >= nd


def sharded_int4_matmul(ctx: KernelSharding, x, wp, s):
    """int4_matmul with x's leading (batch) dim sharded over
    ctx.batch_axis and the packed weight/scale replicated. Each device
    runs the single-chip kernel on its local rows — previously the
    pallas call forced an all-gather of the sharded activations."""
    from sea_tpu.ops.quant_matmul import int4_matmul
    lead = (ctx.batch_axis,) + (None,) * (x.ndim - 1)

    def body(x, wp, s):
        return int4_matmul(x, wp, s)

    # check_vma=False: pallas_call has no varying-mesh-axes rule.
    return jax.shard_map(body, mesh=ctx.mesh,
                         in_specs=(P(*lead), P(None, None), P(None)),
                         out_specs=P(*lead), check_vma=False)(x, wp, s)


def can_shard_fused_adaln(ctx: KernelSharding, x, cw, cb) -> bool:
    """Fused AdaLN-modulate under a mesh: rows are batch-local, so the
    kernel shards perfectly over the batch axis (params replicated on
    every device; each model-axis column repeats the local pass)."""
    from sea_tpu.ops.fused_adaln import fused_supported
    nd, _ = _axis_sizes(ctx)
    return (x.ndim == 3 and x.shape[0] % nd == 0 and x.shape[0] >= nd
            and fused_supported(x, cw, cb, local_batch=x.shape[0] // nd))


def sharded_fused_adaln(ctx: KernelSharding, x, cw, cb, w, b,
                        eps: float):
    """ops/fused_adaln.fused_adaln_modulate through shard_map over
    ctx.mesh's batch axis, with a wrapper-level custom VJP: the backward
    kernel's per-trajectory cond reductions are batch-local, and the
    base d(w)/d(b) partials get the one explicit psum over the batch
    axis that a check_vma=False shard_map transpose would silently drop
    (the reason the bare custom_vjp cannot just be wrapped)."""
    from sea_tpu.ops import fused_adaln as fa
    mesh, data = ctx.mesh, ctx.batch_axis
    s3 = P(data, None, None)

    @jax.custom_vjp
    def f(x, cw, cb, w, b):
        def body(x, cw, cb, w, b):
            return fa._fwd_call(x, cw, cb, w, b, eps=eps)
        # check_vma=False: pallas_call has no varying-mesh-axes rule.
        return jax.shard_map(body, mesh=mesh,
                             in_specs=(s3, s3, s3, P(None), P(None)),
                             out_specs=s3, check_vma=False)(x, cw, cb, w, b)

    def f_fwd(x, cw, cb, w, b):
        return f(x, cw, cb, w, b), (x, cw, w)

    def f_bwd(res, g):
        x, cw, w = res

        def body(x, cw, g, w):
            dx, dgw, dgb = fa._bwd_call(x, cw, g, w, eps=eps)
            dw = jax.lax.psum(jnp.sum(dgw, axis=(0, 1)), data)
            db = jax.lax.psum(jnp.sum(dgb, axis=(0, 1)), data)
            return dx, dgw, dgb, dw, db

        # check_vma=False: pallas_call has no varying-mesh-axes rule.
        dx, dgw, dgb, dw, db = jax.shard_map(
            body, mesh=mesh, in_specs=(s3, s3, s3, P(None)),
            out_specs=(s3, s3, s3, P(None), P(None)),
            check_vma=False)(x, cw, g, w)
        return (dx, dgw.astype(cw.dtype), dgb.astype(cw.dtype),
                dw.astype(w.dtype), db.astype(w.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(x, cw, cb, w, b)


def can_shard_int4_tp(ctx: KernelSharding, rows: int, K: int, N: int,
                      role: str) -> bool:
    """Gate for the TENSOR-PARALLEL int4 decompositions (round-4 VERDICT
    item 5: TP'd quantized serving previously lost the packed-nibble
    kernel to the XLA dequant fallback).

    role='col' (Megatron column-parallel: first MLP linear, attention
    q/k/v): the packed weight [K/2, N] shards its OUTPUT dim over the
    model axis — nibble packing runs along K, so each shard is a valid
    packed array untouched.

    role='row' (row-parallel: last MLP linear, attention out-proj): the
    packed weight shards dim 0 (packed input rows). Packed row k pairs
    unpacked inputs k and k + K/2, so shard d needs x slices
    [d*K2l:(d+1)*K2l] and [K/2 + d*K2l : K/2 + (d+1)*K2l]
    (K2l = K/(2*nm)) — exactly the last-axis shards of x viewed as
    [..., 2, K/2]. The wrapper reshapes, shard_maps, and psums the
    partial products (scales/corrections are linear, so scaling partials
    before the psum is exact)."""
    nd, nm = _axis_sizes(ctx)
    if nm <= 1 or rows % nd or rows < nd:
        return False
    if role == "col":
        return N % nm == 0
    if role == "row":
        # Each local packed shard must itself be pack-aligned.
        return K % (2 * nm) == 0 and (K // 2) % nm == 0
    return False


def sharded_int4_matmul_tp(ctx: KernelSharding, x, wp, s, role: str):
    """int4_matmul with the packed weight sharded over the model axis
    (see can_shard_int4_tp) and x's leading dim over the batch axis.
    'col' runs shard-local with zero collectives (output stays sharded
    over the model axis, feeding the distributed-LN hidden constraint);
    'row' psums the partial products — the single Megatron all-reduce."""
    from sea_tpu.ops.quant_matmul import int4_matmul
    data, model = ctx.batch_axis, ctx.head_axis
    lead = (data,) + (None,) * (x.ndim - 2)
    if role == "col":
        def body(x, wp, s):
            return int4_matmul(x, wp, s)

        # check_vma=False: pallas_call has no varying-mesh-axes rule.
        return jax.shard_map(
            body, mesh=ctx.mesh,
            in_specs=(P(*lead, None), P(None, model), P(model)),
            out_specs=P(*lead, model), check_vma=False)(x, wp, s)

    K = x.shape[-1]
    xr = x.reshape(*x.shape[:-1], 2, K // 2)

    def body(xr, wp, s):
        x_loc = xr.reshape(*xr.shape[:-2], 2 * xr.shape[-1])
        return jax.lax.psum(int4_matmul(x_loc, wp, s), model)

    # check_vma=False: pallas_call has no varying-mesh-axes rule.
    return jax.shard_map(
        body, mesh=ctx.mesh,
        in_specs=(P(*lead, None, model), P(model, None), P(None)),
        out_specs=P(*lead, None), check_vma=False)(xr, wp, s)
