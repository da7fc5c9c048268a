"""Rollout engine equivalence proofs.

The scan+KV-cache engine must be numerically identical (f32, ~1e-4) to:
1. our own prefix-recompute oracle (same code path as the full forward), and
2. the PyTorch reference's rollout loop (train_utils.py:202-207) run on the
   reference model with the same converted weights.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.configs.base import TemporalModelConfig
from sea_tpu.models.temporal import init_temporal, temporal_forward
from sea_tpu.rollout.engine import (rollout, rollout_prefix_recompute,
                                    rollout_scan)

REFERENCE = "/root/reference"


def _cfg(**kw):
    base = dict(num_layers=2, embed_dim=16, n_heads=2, block_size=64,
                scale_ratio=2, src_len=0, num_fields=2, down_proj=2,
                dropout=0.0, exchange_mode="sea", ib_scale_mode="mlp",
                ib_addition_mode="add", ib_mlp_layers=1, ib_num=1,
                add_info_after_cross=True, ln_type="adaln")
    base.update(kw)
    return TemporalModelConfig(**base)


VARIANTS = [
    {},
    dict(ln_type="ln", ib_scale_mode="fourier", add_info_after_cross=False),
    dict(exchange_mode="addition", ib_scale_mode="linear",
         ib_addition_mode="none"),
    dict(exchange_mode="simple", num_fields=3),
    dict(src_len=0, num_fields=3),  # G=3 exercises the 6-pair SEA lattice
    dict(exchange_mode="pool", ln_type="ln", pool_update_method="mlp"),
    dict(exchange_mode="pool", ln_type="ln", pool_update_method="pooling",
         num_fields=3),
    dict(exchange_mode="pool", ln_type="adaln", pool_update_method="linear"),
]


@pytest.mark.parametrize("variant", VARIANTS)
def test_scan_equals_prefix_recompute(variant):
    cfg = _cfg(**variant)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    B, T = 2, 7
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (B, T, cfg.ib_num))

    ref = rollout_prefix_recompute(params, cfg, x0, ib)
    got = rollout_scan(params, cfg, x0, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               err_msg=str(variant))


def test_bucketed_prefix_equals_scan():
    """The bucketed prefix serving engine (rollout_prefix_bucketed —
    faster than scan for f32 B=1 serving on TPU) must agree with scan,
    including with a bucket smaller than T (multiple chunks) and a bucket
    larger than T (single full-length chunk)."""
    from sea_tpu.rollout.engine import rollout_prefix_bucketed
    cfg = _cfg()
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    B, T = 2, 11
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (B, T, cfg.ib_num))
    want = np.asarray(rollout_scan(params, cfg, x0, ib))
    for bucket in (4, 64):
        got = np.asarray(rollout_prefix_bucketed(params, cfg, x0, ib,
                                                 bucket=bucket))
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"bucket={bucket}")


def test_single_step_matches_forward():
    """temporal_step at t must reproduce temporal_forward(x[:, :t+1])[:, t]."""
    from sea_tpu.models.temporal import init_temporal_cache, temporal_step
    cfg = _cfg()
    params = init_temporal(jax.random.PRNGKey(2), cfg)
    B, T = 2, 6
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (B, T, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(4), (B, T, cfg.ib_num))
    full = temporal_forward(params, cfg, x, ib)

    cache = init_temporal_cache(cfg, B, T)
    for t in range(T):
        y, cache = temporal_step(params, cfg, x[:, t], ib[:, t], cache,
                                 jnp.int32(t))
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=2e-4, err_msg=f"t={t}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_rollout_matches_torch_reference():
    """Scan rollout == the reference's full_autoregressive_evaluation inner
    loop (train_utils.py:202-207) with converted weights."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch = pytest.importorskip("torch")
    from models.temporal import TemporalModel
    from sea_tpu.utils.torch_compat import (state_dict_to_numpy,
                                            temporal_params_from_torch)

    cfg = _cfg()
    torch.manual_seed(11)
    ref_model = TemporalModel(
        num_layers=cfg.num_layers, embed_dim=cfg.embed_dim,
        n_heads=cfg.n_heads, max_len=cfg.block_size,
        scale_ratio=cfg.scale_ratio, src_len=cfg.src_len,
        num_variables=cfg.num_fields, down_proj=cfg.down_proj, dropout=0.0,
        exchange_mode=cfg.exchange_mode, pos_encoding_mode="learnable",
        ib_scale_mode=cfg.ib_scale_mode,
        ib_addition_mode=cfg.ib_addition_mode,
        ib_mlp_layers=cfg.ib_mlp_layers, ib_num=cfg.ib_num,
        add_info_after_cross=cfg.add_info_after_cross,
        LN_type=cfg.ln_type).eval()

    B, T = 2, 8
    data = torch.randn(B, T + 1, cfg.num_fields, cfg.embed_dim)
    ib = torch.randn(B, T, cfg.ib_num)

    # Reference prefix-recompute loop.
    with torch.no_grad():
        autoreg = data[:, 0:1]
        for i in range(T):
            out = ref_model(autoreg, ib[:, : i + 1])
            autoreg = torch.cat((autoreg, out[:, -1:]), dim=1)
        ref = autoreg[:, 1:].numpy()

    params = temporal_params_from_torch(
        state_dict_to_numpy(ref_model.state_dict()), cfg)
    got = rollout_scan(params, cfg, jnp.asarray(data[:, 0].numpy()),
                       jnp.asarray(ib.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_rollout_dispatch_jit_compiles():
    cfg = _cfg()
    params = init_temporal(jax.random.PRNGKey(5), cfg)
    x0 = jnp.zeros((1, cfg.num_fields, cfg.embed_dim))
    ib = jnp.zeros((1, 5, cfg.ib_num))
    out = rollout(params, cfg, x0, ib)
    assert out.shape == (1, 5, cfg.num_fields, cfg.embed_dim)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.heavy
def test_pool_mode_rollout_uses_scan():
    """Pool mode IS causal-incremental (the pool token is per-token,
    reference temporal.py:244-251): the dispatcher must classify it as
    scan-eligible (select_engine at B>1) and the scan engine must match
    the prefix-recompute oracle."""
    from sea_tpu.rollout.engine import select_engine
    cfg = _cfg(exchange_mode="pool", ln_type="ln",
               pool_update_method="mlp")
    params = init_temporal(jax.random.PRNGKey(7), cfg)
    assert select_engine(cfg, 2, 4, params) == "scan"
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(8),
                                 (1, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(9), (1, 4, cfg.ib_num))
    out = rollout(params, cfg, x0, ib, engine="scan")
    assert out.shape == (1, 4, cfg.num_fields, cfg.embed_dim)
    assert bool(jnp.isfinite(out).all())
    ref = rollout_prefix_recompute(params, cfg, x0, ib)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    scan = rollout_scan(params, cfg, x0, ib)
    np.testing.assert_allclose(np.asarray(out), np.asarray(scan), atol=1e-6)


def test_src_len_offset_dispatches_to_masked_prefix():
    """Regression (review finding): with src_len > 0 the tril diagonal
    offset makes the model NON-causal (token p attends p+1..p+src_len), so
    earlier tokens' states change as the prefix grows and KV caching cannot
    reproduce prefix recompute. The dispatcher must serve it with the
    MASKED bucketed prefix engine — a bare padded forward would be wrong
    too (tokens would attend forward into garbage); valid_len masking
    (ops/attention.attention_core) makes it exactly equivalent to the
    reference's growing-prefix loop."""
    cfg = _cfg(src_len=2)
    params = init_temporal(jax.random.PRNGKey(20), cfg)
    B, T = 2, 7
    x0 = jax.random.normal(jax.random.PRNGKey(21),
                           (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(22), (B, T, cfg.ib_num))
    ref = rollout_prefix_recompute(params, cfg, x0, ib)
    got = rollout(params, cfg, x0, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ib_attention_masked_prefix_equals_oracle():
    """ib_addition_mode='attention' (unmasked attention over the ib
    stream) is the config where naive bucketed padding is MOST wrong: the
    real future ib values are available in the padded buffer and unmasked
    attention would read them. The masked bucketed engine must match the
    reference oracle exactly, across bucket boundaries."""
    from sea_tpu.rollout.engine import rollout_prefix_bucketed
    cfg = _cfg(ib_addition_mode="attention")
    params = init_temporal(jax.random.PRNGKey(23), cfg)
    B, T = 2, 11
    x0 = jax.random.normal(jax.random.PRNGKey(24),
                           (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(25), (B, T, cfg.ib_num))
    ref = rollout_prefix_recompute(params, cfg, x0, ib)
    got = rollout(params, cfg, x0, ib)  # dispatcher -> masked prefix
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    for bucket in (4, 64):
        got_b = rollout_prefix_bucketed(params, cfg, x0, ib, bucket=bucket)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref),
                                   atol=2e-5, err_msg=f"bucket={bucket}")


def test_select_engine_policy():
    """Pin the serving-engine dispatch policy (rollout.engine.select_engine,
    measured basis in BASELINE.md 'Scan vs prefix'):
    - f32 weights + B=1 + shipped-scale T -> prefix (1.5x on-chip win),
    - any reduced-precision weights, B>1, or long horizon -> scan,
    - non-incremental configs -> prefix (the only exact engine)."""
    from sea_tpu.rollout.engine import select_engine
    from sea_tpu.utils.precision import (cast_weights_bf16,
                                         quantize_weights_int8)
    cfg = _cfg()
    params = init_temporal(jax.random.PRNGKey(26), cfg)
    assert select_engine(cfg, 1, 399, params) == "prefix"
    assert select_engine(cfg, 2, 399, params) == "scan"
    assert select_engine(cfg, 1, 2048, params) == "scan"
    assert select_engine(cfg, 1, 399,
                         cast_weights_bf16(params, min_size=1)) == "scan"
    assert select_engine(cfg, 1, 399,
                         quantize_weights_int8(params, min_size=1)) == "scan"
    assert select_engine(_cfg(src_len=2), 8, 399, params) == "prefix"
    assert select_engine(_cfg(ib_addition_mode="attention"), 8, 399,
                         params) == "prefix"
    # engine='scan' must refuse non-incremental configs loudly.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scan-incremental"):
        rollout(params, _cfg(src_len=2),
                jnp.zeros((1, cfg.num_fields, cfg.embed_dim)),
                jnp.zeros((1, 4, cfg.ib_num)), engine="scan")


@pytest.mark.parametrize("variant", [
    {}, dict(num_fields=3),
    dict(exchange_mode="pool", ln_type="ln", pool_update_method="mlp"),
    dict(ib_addition_mode="attention"),  # cross_attn_ib gets fused kv
])
def test_fused_projections_match_unfused(variant):
    """utils.precision.fuse_attention_projections (the single-chip
    serving transform: self-attn q+k+v -> "qkv", cross-attn k+v -> "kv")
    must not change the model: per-output-column math is identical, so
    both the full forward and the scan rollout agree with the unfused
    params to roundoff."""
    from sea_tpu.utils.precision import fuse_attention_projections
    cfg = _cfg(**variant)
    params = init_temporal(jax.random.PRNGKey(30), cfg)
    fused = fuse_attention_projections(params)
    B, T = 2, 6
    key = jax.random.PRNGKey(31)
    x = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (B, T, cfg.ib_num))
    ref = temporal_forward(params, cfg, x, ib)
    got = temporal_forward(fused, cfg, x, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    if cfg.ib_addition_mode != "attention":  # scan needs incremental cfg
        r_ref = rollout_scan(params, cfg, x[:, 0], ib)
        r_got = rollout_scan(fused, cfg, x[:, 0], ib)
        np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref),
                                   atol=1e-5)


def test_fused_projections_quantized_rollout():
    """Fusion composes with the weight-only quantizers: the per-channel
    scales are per OUTPUT column, so quantize(fuse(p)) lands on exactly
    the same int grid as quantize(p) and the rollouts agree to f32
    accumulation-order noise."""
    from sea_tpu.utils.precision import (fuse_attention_projections,
                                         quantize_weights_int4,
                                         quantize_weights_int8)
    cfg = _cfg()
    params = init_temporal(jax.random.PRNGKey(40), cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(41),
                           (1, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(42), (1, 5, cfg.ib_num))
    for quant in (quantize_weights_int8, quantize_weights_int4):
        ref = rollout_scan(quant(params, min_size=1), cfg, x0, ib)
        got = rollout_scan(quant(fuse_attention_projections(params),
                                 min_size=1), cfg, x0, ib)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_fused_qkv_rejects_cross_inputs():
    """"qkv" fusion is self-attention-only: distinct q and k/v inputs
    must be rejected loudly (ops.attention._project_qkv)."""
    from sea_tpu.ops.attention import init_attention, mha
    from sea_tpu.utils.precision import fuse_attention_projections
    att = init_attention(jax.random.PRNGKey(50), 16, 2)
    fused = fuse_attention_projections(
        {"blocks": [{"self_attn": [att]}]})["blocks"][0]["self_attn"][0]
    x1 = jax.random.normal(jax.random.PRNGKey(51), (1, 4, 16))
    x2 = jax.random.normal(jax.random.PRNGKey(52), (1, 4, 16))
    with pytest.raises(ValueError, match="self-attention"):
        mha(fused, x1, x2, n_heads=2, causal=False, rope=False)


def test_cond_table_hoist_matches_per_step():
    """precompute_cond_tables (ib-only activations hoisted out of the
    scan — AdaLN cond nets + ib embedding are loop invariants) must be
    numerically identical to per-step recomputation, and must actually
    produce tables for an AdaLN config."""
    from sea_tpu.models.temporal import precompute_cond_tables
    cfg = _cfg()  # adaln + ib 'mlp'/'add': both hoist classes present
    params = init_temporal(jax.random.PRNGKey(50), cfg)
    B, T = 2, 7
    x0 = jax.random.normal(jax.random.PRNGKey(51),
                           (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(52), (B, T, cfg.ib_num))
    tables = precompute_cond_tables(params, cfg, ib)
    assert jax.tree.leaves(tables), "adaln config must produce tables"
    want = rollout_scan(params, cfg, x0, ib, precompute_cond=False)
    got = rollout_scan(params, cfg, x0, ib, precompute_cond=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
