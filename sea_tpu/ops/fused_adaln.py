"""Fused AdaLN-modulate Pallas kernel (training-side).

The AdaLN x-half (ops/layers.adaln_modulate — reference
base_blocks.py:343-350) is normalize + scale/shift:

    out = (x - mean) * rsqrt(var + eps) * (w + cw) + (b + cb)

XLA lowers this as separate reduce + elementwise fusions, reading the
[B, T, E] activation from HBM more than once per pass; the round-4
cylinder-train ablation charged ~11% of the step to AdaLN modulation
(BASELINE.md). This kernel does the whole row in one VMEM pass — one
read, one write — and the fused backward recomputes the row statistics
in-register (one read of x and g, one write of dx, plus the per-
trajectory [B, E] reductions the cond deltas need).

Scope (dispatch gates in ops/layers.adaln_modulate): the teacher-forced
training shape x: [B, T, E] with TIME-CONSTANT conditioning
cw/cb: [B, 1, E] (TemporalModelConfig.ib_time_constant — the shipped
AdaLN recipe) and E % 128 == 0. Everything else stays on the XLA path.

Backward math (per row; a = w + cw, xhat = (x - mean) * rsqrt(var+eps)):
    dxhat = g * a
    dx    = rsqrt(var+eps) * (dxhat - mean_E(dxhat) - xhat * mean_E(dxhat * xhat))
    d(w + cw) = sum_rows g * xhat     (dw over all rows; dcw per trajectory)
    d(b + cb) = sum_rows g
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5

# Row-block: 8-multiple (Mosaic second-to-last-dim rule); edge blocks of
# a non-multiple T are masked in-kernel via t_actual.
_BLOCK_T = 128

_FORCE_INTERPRET = False


def _fwd_kernel(x_ref, cw_ref, cb_ref, w_ref, b_ref, o_ref, *,
                eps: float, block_t: int, t_actual: int):
    x = x_ref[0].astype(jnp.float32)  # [bt, E]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    # (w + cw) / (b + cb) round in the PARAM dtype first — bf16 params
    # must match the XLA path bit-for-bit (the sharded-vs-single-device
    # equality tests compare across the two paths). Operands stay 2-D
    # [1, E] (Mosaic-friendly broadcast; rank-1 vectors are not).
    a = (w_ref[:] + cw_ref[0]).astype(jnp.float32)
    out = xhat * a + (b_ref[:] + cb_ref[0]).astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, cw_ref, g_ref, w_ref, dx_ref, dgw_ref, dgb_ref,
                acc_gw, acc_gb, *, eps: float, block_t: int, t_actual: int,
                nt: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc_gw[:] = jnp.zeros_like(acc_gw)
        acc_gb[:] = jnp.zeros_like(acc_gb)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    a = (w_ref[:] + cw_ref[0]).astype(jnp.float32)  # [1, E]
    dxhat = g * a
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # Per-trajectory reductions for d(w+cw) / d(b+cb); edge rows beyond
    # t_actual would pollute the sums — mask them.
    row = t * block_t + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_t, 1), 0)
    valid = row < t_actual
    # where, not multiply-by-0: OOB edge-block rows hold garbage that can
    # be non-finite, and 0 * nan poisons the reductions.
    gx = jnp.where(valid, g * xhat, 0.0)
    gm = jnp.where(valid, g, 0.0)
    acc_gw[:] += jnp.sum(gx, axis=0, keepdims=True)
    acc_gb[:] += jnp.sum(gm, axis=0, keepdims=True)

    @pl.when(t == nt - 1)
    def _finalize():
        dgw_ref[0] = acc_gw[:]
        dgb_ref[0] = acc_gb[:]


def _fwd_call(x, cw, cb, w, b, *, eps: float, interpret: bool = False):
    B, T, E = x.shape
    bt = min(_BLOCK_T, ((T + 7) // 8) * 8)
    nt = pl.cdiv(T, bt)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, block_t=bt, t_actual=T),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, bt, E), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, E), lambda i, j: (0, 0)),
            pl.BlockSpec((1, E), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, E), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, E), x.dtype),
        interpret=interpret or _FORCE_INTERPRET,
    )(x, cw, cb, w.reshape(1, E), b.reshape(1, E))


def _bwd_call(x, cw, g, w, *, eps: float, interpret: bool = False):
    B, T, E = x.shape
    bt = min(_BLOCK_T, ((T + 7) // 8) * 8)
    nt = pl.cdiv(T, bt)
    dx, dgw, dgb = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, block_t=bt, t_actual=T,
                          nt=nt),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, bt, E), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bt, E), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, E), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bt, E), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, E), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, E), x.dtype),
            jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, E), jnp.float32),
                        pltpu.VMEM((1, E), jnp.float32)],
        interpret=interpret or _FORCE_INTERPRET,
    )(x, cw, g, w.reshape(1, E))
    return dx, dgw, dgb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_adaln_modulate(x, cw, cb, w, b, eps: float = LN_EPS):
    """x: [B, T, E]; cw/cb: [B, 1, E]; w/b: [E] -> [B, T, E].

    Numerically the same computation as ops/layers.adaln_modulate on a
    time-constant cond (f32 statistics, input-dtype output); one fused
    VMEM pass instead of XLA's reduce + elementwise fusions."""
    return _fwd_call(x, cw, cb, w, b, eps=eps)


def _vjp_fwd(x, cw, cb, w, b, eps):
    out = _fwd_call(x, cw, cb, w, b, eps=eps)
    return out, (x, cw, w)


def _vjp_bwd(eps, res, g):
    x, cw, w = res
    dx, dgw, dgb = _bwd_call(x, cw, g, w, eps=eps)
    # d(w+cw) splits: dcw keeps the per-trajectory shape, dw sums it.
    dw = jnp.sum(dgw, axis=(0, 1)).astype(w.dtype)
    db = jnp.sum(dgb, axis=(0, 1)).astype(w.dtype)
    dcw = dgw.astype(cw.dtype)
    dcb = dgb.astype(cw.dtype)
    return dx, dcw, dcb, dw, db


fused_adaln_modulate.defvjp(_vjp_fwd, _vjp_bwd)


def fused_supported(x, cw, cb, local_batch=None) -> bool:
    """Dispatch gate for ops/layers.adaln_modulate: teacher-forced
    training shapes with time-constant cond only. ``local_batch``: the
    per-device batch under a shard_map dispatch
    (parallel/kernel_shard.can_shard_fused_adaln)."""
    if _FORCE_INTERPRET:
        backend_ok = True
    else:
        backend_ok = jax.default_backend() == "tpu"
    return (backend_ok and x.ndim == 3 and cw.ndim == 3
            and cw.shape[1] == 1 and cb.shape == cw.shape
            and x.shape[0] == cw.shape[0]
            and (local_batch is None or local_batch >= 1)
            and x.shape[-1] % 128 == 0 and x.shape[1] >= 8)
