"""Autoregressive rollout engine.

The reference rollout (utils/train_utils.py:202-207, the #1 perf target) is
prefix-recompute: at step i it re-runs the whole model on all i+1 tokens, so
a T-step rollout costs O(T^2) attention token-pairs *per layer* across O(T)
full forward passes, each a separate framework dispatch.

Here the entire rollout is ONE compiled XLA program: a ``jax.lax.scan`` over
timesteps carrying per-(layer, stream) self-attention and per-(layer, pair)
SEA cross-attention KV caches (models/temporal.py:temporal_step). Each step
does O(T) work against the caches -> O(T^2) total instead of O(T^3)-ish
token work, with no per-step dispatch overhead.

Numerical equivalence to prefix recompute holds because (with dropout off):
- every non-attention op is per-token,
- attention is causal (token t reads tokens <= t + src_len only),
- RoPE uses absolute positions and AdaLN conditions on the per-token ib,
so recomputing the prefix reproduces exactly the cached activations.
Proved in tests/test_rollout.py against both our full forward and the
PyTorch reference loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sea_tpu.configs.base import TemporalModelConfig
from sea_tpu.models.temporal import (init_temporal_cache,
                                     precompute_cond_tables,
                                     temporal_forward, temporal_step)


def rollout_scan(params, cfg: TemporalModelConfig, x0, ib, *,
                 cache_dtype=jnp.float32, precompute_cond: bool = True):
    """x0: [B, G, E] initial latent state (= data[:, 0]);
    ib: [B, T, ib_num] conditioning for steps 0..T-1.

    Returns predictions [B, T, G, E]: prediction k is the model's estimate of
    the state at time k+1 (matching autoregressive_output = autoreg_input[:,1:]
    at train_utils.py:209).

    precompute_cond: hoist every ib-only activation (AdaLN cond nets,
    the ib-injection embedding) out of the scan — they are loop
    invariants, and per-step recomputation re-streams their weights from
    HBM every step (~1/3 of the cylinder preset's serving weight
    stream). Identical numerics (models/temporal.precompute_cond_tables);
    False only for A/B measurement.
    """
    B = x0.shape[0]
    T = ib.shape[1]
    cache = init_temporal_cache(cfg, B, T, dtype=cache_dtype)
    tables = None
    # Hoist policy (measured, BASELINE.md round-4 rows): AdaLN configs
    # only. There the cond nets are ~1/3 of the serving weight stream
    # and hoisting pays +39-61% (cylinder). For plain-LN configs the
    # only ib-only activation is the tiny ib embedding — no weight
    # stream to save — and carrying its table through the scan xs
    # measured 26% SLOWER on the batched multiphase bf16 rollout.
    if precompute_cond and cfg.ln_type.lower() == "adaln":
        tables = precompute_cond_tables(params, cfg, ib)
        if not jax.tree.leaves(tables):
            tables = None

    def step(carry, inp):
        cache, x_t = carry
        t, ib_t = inp[0], inp[1]
        cond_t = inp[2] if len(inp) > 2 else None
        y, cache = temporal_step(params, cfg, x_t, ib_t, cache, t,
                                 cond_t=cond_t)
        return (cache, y), y

    ts = jnp.arange(T, dtype=jnp.int32)
    xs = (ts, jnp.swapaxes(ib, 0, 1))
    if tables is not None:
        xs = xs + (tables,)
    (_, _), ys = jax.lax.scan(step, (cache, x0), xs)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, G, E]


@functools.partial(jax.jit, static_argnums=(1, 4), donate_argnums=())
def rollout_jit(params, cfg: TemporalModelConfig, x0, ib,
                cache_dtype=jnp.float32):
    """Jitted rollout; cfg and cache_dtype are static."""
    return rollout_scan(params, cfg, x0, ib, cache_dtype=cache_dtype)


def rollout_prefix_recompute(params, cfg: TemporalModelConfig, x0, ib):
    """Reference-fidelity rollout: re-run the full model on the growing
    prefix each step (train_utils.py:202-207). T distinct compile shapes;
    kept as the equivalence ORACLE only — the dispatcher serves non-causal
    configs with the masked bucketed engine, which is exactly equivalent
    (tests/test_rollout.py) and compiles ~T/bucket programs instead."""
    T = ib.shape[1]
    autoreg = x0[:, None]  # [B, 1, G, E]
    for i in range(T):
        out = temporal_forward(params, cfg, autoreg, ib[:, : i + 1])
        autoreg = jnp.concatenate([autoreg, out[:, -1:]], axis=1)
    return autoreg[:, 1:]


@functools.lru_cache(maxsize=64)
def _prefix_chunk(cfg: TemporalModelConfig, masked: bool):
    """Jitted per-(cfg, masked) chunk runner for the bucketed prefix engine
    — module-level-cached so repeated rollouts (training-loop validation,
    eval epochs) reuse the traced/compiled programs instead of re-tracing
    a fresh closure every call."""
    @functools.partial(jax.jit, static_argnames=("L", "i1"))
    def chunk(p, buf, ib_all, i0, *, L, i1):
        def body(i, buf):
            out = temporal_forward(p, cfg, buf[:, :L], ib_all[:, :L],
                                   valid_len=(i + 1) if masked else None)
            y = jax.lax.dynamic_index_in_dim(out, i, axis=1, keepdims=True)
            return jax.lax.dynamic_update_slice_in_dim(buf, y, i + 1,
                                                       axis=1)
        return jax.lax.fori_loop(i0, i1, body, buf)
    return chunk


def rollout_prefix_bucketed(params, cfg: TemporalModelConfig, x0, ib, *,
                            bucket: int = 64):
    """Compile-friendly prefix-recompute: the reference's strategy with
    prefix lengths rounded up to ``bucket`` multiples, so the whole rollout
    is ~T/bucket compiled programs (a fori_loop each) instead of T distinct
    shapes. Step i runs a full forward on the first L >= i+1 positions.

    For causal configs (is_scan_incremental) trailing garbage is
    irrelevant to position i's output and the forward runs unmasked. For
    the NON-causal configs (ib_addition_mode='attention', src_len != 0)
    a bare padded forward would be WRONG — unmasked ib-attention would
    read future ib positions and src_len lets tokens attend forward into
    garbage — so the forward runs with valid_len = i+1: every attention
    masks keys past the prefix and zeroes garbage query rows
    (ops/attention.attention_core), reproducing the reference's
    growing-prefix semantics (train_utils.py:202-207) exactly with
    static shapes.

    Why keep a second serving engine: at B=1 the scan engine is bound by
    streaming the weights from HBM once per step, while this engine reads
    them once per forward and amortizes over L rows of MXU work — measured
    on one v5e (tools/bench_scan_vs_prefix.py), it is ~1.5x FASTER than
    scan for the f32 cylinder preset (2864 vs 1912 steps/s) and within a
    few % at bf16, where halved streaming restores the scan's edge. Scan
    stays the default (wins at reduced precision, batched serving, and
    long T); ``rollout(engine='auto')`` picks this for f32
    single-trajectory serving (select_engine).
    """
    chunk = _prefix_chunk(cfg, not is_scan_incremental(cfg))
    B = x0.shape[0]
    T = ib.shape[1]
    buf = jnp.zeros((B, T + 1) + x0.shape[1:], x0.dtype)
    buf = buf.at[:, 0].set(x0)
    i = 0
    while i < T:
        L = min(-(-(i + 1) // bucket) * bucket, T)
        i1 = min(L, T)
        buf = chunk(params, buf, ib, jnp.int32(i), L=L, i1=i1)
        i = i1
    return buf[:, 1:]


def is_scan_incremental(cfg: TemporalModelConfig) -> bool:
    """True when the model is incrementally computable, i.e. the scan+KV
    engine (and the fused e2e serving program) applies. All four exchange
    modes (sea / pool / addition / simple) are incremental — the pool
    token is per-token (reference temporal.py:244-251) and its
    cross-attention causal. Not incrementally computable:
    - attention-mode ib conditioning (unmasked attention over the ib
      stream),
    - src_len != 0 (the tril diagonal offset lets token p attend
      p+1..p+src_len, so the model is NOT causal and earlier tokens'
      states change as the prefix grows — prefix recompute is the
      defining semantics there; both shipped configs use src_len=0).

    The single source of truth for this predicate — the CLI's serving
    dispatch and rollout/e2e.py's guard both call it."""
    return cfg.ib_addition_mode != "attention" and cfg.src_len == 0


# select_engine policy constants, pinned by tests/test_rollout.py.
# Measured basis (tools/bench_scan_vs_prefix.py on one v5e, BASELINE.md
# "Scan vs prefix" table): the prefix engine wins only where the scan
# step is weight-streaming-bound — full-precision weights at trajectory
# batch 1 (1.5x cylinder, 1.51x multiphase). Reduced-precision weights
# (bf16/int8/int4) stream half or less and the scan wins; batching
# amortizes the weight stream over B; and the prefix engine's O(T^2)
# token work loses at long horizons regardless.
PREFIX_MAX_BATCH = 1
PREFIX_MAX_T = 512


def weights_f32(params) -> bool:
    """True when every param leaf is float32 — i.e. no serving cast
    (bf16) or quantization (int8/int4 pack) has been applied."""
    return all(getattr(leaf, "dtype", None) == jnp.float32
               for leaf in jax.tree.leaves(params))


def select_engine(cfg: TemporalModelConfig, batch: int, horizon: int,
                  params) -> str:
    """Serving-engine policy: 'scan' or 'prefix'.

    Non-incremental configs (attention-mode ib, src_len != 0) MUST use
    the (masked, exact) prefix engine. Incremental configs use scan
    except the one measured regime where prefix is ~1.5x faster: f32
    weights, single trajectory, shipped-scale horizon (constants above).
    """
    if not is_scan_incremental(cfg):
        return "prefix"
    if (batch <= PREFIX_MAX_BATCH and horizon <= PREFIX_MAX_T
            and weights_f32(params)):
        return "prefix"
    return "scan"


def rollout(params, cfg: TemporalModelConfig, x0, ib, *,
            cache_dtype=jnp.float32, engine: str = "auto"):
    """Engine dispatch — the single serving-policy point the CLI, the
    fused e2e eval, and the training-loop validation all inherit.

    engine: 'auto' (select_engine policy), 'scan', 'prefix' (bucketed,
    masked-exact for non-causal configs), or 'prefix_recompute' (the
    T-distinct-shapes reference oracle; tests only).

    cache_dtype: KV-cache storage dtype (scan engine only). bf16 caches
    are the int4-serving default — they buy +8.6% there, where the
    weight stream no longer dominates, and LOSE 3-5% for bf16w/int8w
    weights (measured, BASELINE.md), so f32 stays the default.
    """
    if engine == "auto":
        engine = select_engine(cfg, x0.shape[0], ib.shape[1], params)
    if engine == "scan":
        if not is_scan_incremental(cfg):
            raise ValueError(
                "engine='scan' requires a scan-incremental config "
                "(no attention ib-conditioning, src_len == 0)")
        return rollout_jit(params, cfg, x0, ib, cache_dtype)
    if engine == "prefix":
        return rollout_prefix_bucketed(params, cfg, x0, ib)
    if engine == "prefix_recompute":
        return rollout_prefix_recompute(params, cfg, x0, ib)
    raise ValueError(f"unknown engine {engine!r}")
