"""Pallas kernels under shard_map (round-3 VERDICT item 1).

All three kernel families must survive multi-device programs: these tests
run the EXACT shard_map-wrapped dispatch paths on the virtual 8-device CPU
mesh with interpret-mode Pallas and pin

  kernel-on sharded == kernel-on single-device (bit-level for dropout),

i.e. sharding must not change semantics — including the in-kernel
counter-hash dropout mask, which keys on GLOBAL (batch*head, q, k)
positions via the bh_map plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.ops import decode_attention as da
from sea_tpu.ops import flash_attention as fa
from sea_tpu.ops import quant_matmul as qm
from sea_tpu.ops.attention import attention_core
from sea_tpu.ops.dispatch import KernelSharding, attention_kernel_sharding
from sea_tpu.parallel.kernel_shard import (can_shard_attention,
                                           can_shard_int4,
                                           can_shard_int4_tp,
                                           sharded_decode_attention,
                                           sharded_flash_attention,
                                           sharded_int4_matmul,
                                           sharded_int4_matmul_tp)
from sea_tpu.parallel.mesh import make_mesh

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture
def interpret_kernels(monkeypatch):
    """Force interpret-mode Pallas through the PUBLIC kernel APIs so the
    real shard_map dispatch paths run on CPU."""
    monkeypatch.setattr(fa, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(da, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(qm, "_FORCE_INTERPRET", True)


def _qkv(B=4, T=128, H=8, hd=32, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H, hd), jnp.float32)
    k = jax.random.normal(kk, (B, T, H, hd), jnp.float32)
    v = jax.random.normal(kv, (B, T, H, hd), jnp.float32)
    return q, k, v


@requires_8
@pytest.mark.parametrize("shape", [(4, 2), (8, 1), (2, 4)])
def test_sharded_flash_matches_single_device(interpret_kernels, shape):
    """Deterministic forward: shard_map over (data, model) == the
    single-device kernel == the XLA oracle."""
    mesh = make_mesh(*shape)
    ctx = KernelSharding(mesh)
    q, k, v = _qkv(B=shape[0])  # batch must divide the data axis
    assert can_shard_attention(ctx, q.shape[0], q.shape[2])
    want_xla = attention_core(q, k, v, causal=True, src_len=0)
    want_kernel = fa.flash_attention(q, k, v, causal=True,
                                     block_q=128, block_k=128)
    got = sharded_flash_attention(ctx, q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_kernel),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_xla),
                               atol=2e-5)


@requires_8
def test_sharded_flash_dropout_mask_is_global(interpret_kernels):
    """With dropout ON, the sharded kernel must drop EXACTLY the same
    probabilities as the single-device kernel: the counter hash keys on
    global (b*H + h) through bh_map, not the shard-local grid index.
    Bit-level equality, and the result must genuinely depend on dropout
    (differ from the deterministic output)."""
    mesh = make_mesh(4, 2)
    ctx = KernelSharding(mesh)
    q, k, v = _qkv(seed=3)
    seed = jnp.asarray([17, 29], jnp.int32)
    want = fa.flash_attention(q, k, v, causal=True, dropout_rate=0.3,
                              dropout_seed=seed)
    got = sharded_flash_attention(ctx, q, k, v, causal=True,
                                  dropout_rate=0.3, dropout_seed=seed)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    no_drop = sharded_flash_attention(ctx, q, k, v, causal=True)
    assert not np.allclose(np.asarray(got), np.asarray(no_drop))


@requires_8
def test_sharded_flash_gradients_match(interpret_kernels):
    """The custom-vjp backward (fused dQ/dK/dV kernels) runs inside the
    shard_map transpose and must match single-device gradients —
    including the dropout mask agreement between fwd and bwd."""
    mesh = make_mesh(4, 2)
    ctx = KernelSharding(mesh)
    q, k, v = _qkv(B=4, T=128, H=8, hd=16, seed=5)
    seed = jnp.asarray([7, 11], jnp.int32)

    def loss_single(q, k, v):
        return jnp.sum(fa.flash_attention(
            q, k, v, causal=True, dropout_rate=0.2, dropout_seed=seed) ** 2)

    def loss_sharded(q, k, v):
        return jnp.sum(sharded_flash_attention(
            ctx, q, k, v, causal=True, dropout_rate=0.2,
            dropout_seed=seed) ** 2)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"d{name}")


@requires_8
def test_sharded_decode_matches_single_device(interpret_kernels):
    """Flash-decode under shard_map == single-device kernel == the XLA
    cache attention, at a mid-rollout position t."""
    mesh = make_mesh(4, 2)
    ctx = KernelSharding(mesh)
    B, H, T, hd = 4, 8, 64, 32
    key = jax.random.PRNGKey(9)
    q = jax.random.normal(key, (B, H, hd), jnp.float32)
    ck = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, hd))
    cv = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, hd))
    t = jnp.int32(37)
    want = da.decode_attention(q, ck, cv, t)
    got = sharded_decode_attention(ctx, q, ck, cv, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # XLA oracle: masked softmax over positions <= t.
    scores = jnp.einsum("bhd,bhkd->bhk", q, ck) * hd ** -0.5
    scores = jnp.where(jnp.arange(T)[None, None, :] <= t, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    oracle = jnp.einsum("bhk,bhkd->bhd", probs, cv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               atol=2e-5)


@requires_8
def test_sharded_int4_matvec_matches_single_device(interpret_kernels):
    """The packed-nibble matvec under shard_map (pure DP, replicated
    weights) == the single-device kernel == the XLA dequant path."""
    mesh = make_mesh(8, 1)
    ctx = KernelSharding(mesh)
    assert can_shard_int4(ctx, 8)
    # Since round 5 the replicated decomposition also applies under TP
    # meshes (each model-axis column repeats the local matvec).
    assert can_shard_int4(KernelSharding(make_mesh(4, 2)), 8)
    key = jax.random.PRNGKey(13)
    K, N = 256, 256
    x = jax.random.normal(key, (8, K), jnp.float32)
    qw = jax.random.randint(jax.random.fold_in(key, 1), (K, N), -8, 8,
                            jnp.int8)
    wp = qm.pack_int4(qw)
    s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (N,))) + 0.1
    want = qm.int4_matmul(x.astype(jnp.bfloat16), wp, s, force="kernel")
    got = sharded_int4_matmul(ctx, x.astype(jnp.bfloat16), wp, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
    xla = qm.int4_matmul(x.astype(jnp.bfloat16), wp, s, force="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla), atol=1e-3)


@requires_8
@pytest.mark.heavy
def test_model_forward_sharded_kernels_match(interpret_kernels, monkeypatch):
    """Integration: temporal_forward traced under attention_kernel_sharding
    (the DP x TP train-step context) with kernel dispatch forced on must
    equal the plain single-device forward — deterministic AND dropout —
    i.e. the mha-level context dispatch is semantics-preserving."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal, temporal_forward

    # Force the auto-dispatch gates open on CPU (backend/T floors).
    monkeypatch.setattr(fa, "flash_supported",
                        lambda *a, **k: True)
    cfg = TemporalModelConfig(
        num_layers=1, embed_dim=64, n_heads=8, block_size=128,
        scale_ratio=2, src_len=0, num_fields=2, down_proj=2, dropout=0.1,
        exchange_mode="sea", ib_scale_mode="mlp", ib_addition_mode="add",
        ib_mlp_layers=1, ib_num=1, add_info_after_cross=True, ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    B, T = 4, 128
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, T, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.ib_num))
    mesh = make_mesh(4, 2)

    # Deterministic: kernels on, sharded == unsharded.
    want = temporal_forward(params, cfg, x, ib)
    with attention_kernel_sharding(mesh):
        got = temporal_forward(params, cfg, x, ib)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    # Dropout: same rng must produce the SAME masks sharded vs not
    # (global-position hash), so outputs agree bit-for-bit-ish.
    rng = jax.random.PRNGKey(42)
    want_d = temporal_forward(params, cfg, x, ib, rng=rng,
                              deterministic=False)
    with attention_kernel_sharding(mesh):
        got_d = temporal_forward(params, cfg, x, ib, rng=rng,
                                 deterministic=False)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=3e-5)
    assert not np.allclose(np.asarray(got_d), np.asarray(want), atol=1e-3)


@requires_8
@pytest.mark.heavy
def test_sharded_rollout_decode_kernel_matches(interpret_kernels,
                                               monkeypatch):
    """Integration: the sharded scan rollout (make_sharded_rollout) with
    the flash-decode kernel forced on must match the plain XLA rollout —
    the kernel survives GSPMD serving instead of being disabled."""
    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.parallel.train_step import make_sharded_rollout
    from sea_tpu.rollout.engine import rollout_scan

    monkeypatch.setattr(da, "decode_supported", lambda *a, **k: True)
    cfg = TemporalModelConfig(
        num_layers=1, embed_dim=64, n_heads=8, block_size=64,
        scale_ratio=2, src_len=0, num_fields=2, down_proj=2, dropout=0.0,
        exchange_mode="sea", ib_scale_mode="mlp", ib_addition_mode="add",
        ib_mlp_layers=1, ib_num=1, add_info_after_cross=True, ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(3), cfg)
    B, T = 4, 12
    x0 = jax.random.normal(jax.random.PRNGKey(4),
                           (B, cfg.num_fields, cfg.embed_dim))
    ib = jax.random.normal(jax.random.PRNGKey(5), (B, T, cfg.ib_num))

    want = rollout_scan(params, cfg, x0, ib)  # XLA path (no ctx)
    mesh = make_mesh(4, 2)
    run, placed, place = make_sharded_rollout(mesh, cfg, params)
    got = run(placed, *place(np.asarray(x0), np.asarray(ib)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@requires_8
def test_unshardable_decode_never_traces_bare_kernel(monkeypatch):
    """Review finding: when a multi-device trace CANNOT shard_map the
    decode kernel (uneven batch/head shards), mha_step must fall back to
    XLA cache attention — tracing the bare pallas call inside GSPMD
    would all-gather the KV cache every rollout step."""
    import jax.numpy as jnp

    from sea_tpu.ops.attention import (init_attention, init_kv_cache,
                                       mha_step)

    monkeypatch.setattr(da, "decode_supported", lambda *a, **k: True)

    def boom(*a, **k):
        raise AssertionError("bare decode kernel dispatched in an "
                             "unshardable multi-device trace")
    monkeypatch.setattr(da, "decode_attention", boom)

    att = init_attention(jax.random.PRNGKey(0), 32, 2)
    cache = init_kv_cache(3, 8, 2, 16)  # B=3 does not divide data=4
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    with attention_kernel_sharding(make_mesh(4, 2)):
        out, _ = mha_step(att, x, x, cache, jnp.int32(0), n_heads=2,
                          rope=True)
    assert out.shape == (3, 32)


@requires_8
def test_unshardable_int4_forces_xla_dequant(monkeypatch):
    """Under a multi-device trace where NO int4 decomposition applies
    (batch not divisible by the data axis; or a TP-role weight whose
    col/row gates reject), linear() must force the XLA dequant path
    instead of tracing the bare pallas kernel. (Since round 5, a
    tp_role=None weight under a TP mesh — replicated by the
    parallel/mesh spec contract — legitimately takes the replicated
    shard_map decomposition instead of falling back.)"""
    import jax.numpy as jnp

    from sea_tpu.ops import layers as Lx

    def boom(*a, **k):
        raise AssertionError("bare int4 kernel dispatched in an "
                             "unshardable multi-device trace")
    monkeypatch.setattr(qm, "_mv_call", boom)
    # Make the kernel gates pass so only the force= path can save us.
    monkeypatch.setattr(qm, "kernel_supported", lambda *a, **k: True)

    K, N = 256, 256
    key = jax.random.PRNGKey(2)
    qw = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
    p = {"w_p4": qm.pack_int4(qw),
         "w_s": jnp.ones((N,), jnp.float32)}
    want_x = jax.random.normal(jax.random.fold_in(key, 1), (6, K))
    with attention_kernel_sharding(make_mesh(4, 2)):
        # batch 6 % nd=4 != 0: no decomposition fits -> XLA dequant.
        y = Lx.linear(p, want_x)
    assert y.shape == (6, N)
    want = qm.int4_matmul(want_x, p["w_p4"], p["w_s"], force="jnp")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4)

    # col role with N % nm != 0 (196 % 8): gates reject -> forced XLA
    # dequant.
    qw2 = jax.random.randint(key, (K, 196), -8, 8, jnp.int8)
    p2 = {"w_p4": qm.pack_int4(qw2),
          "w_s": jnp.ones((196,), jnp.float32)}
    x8 = jax.random.normal(jax.random.fold_in(key, 3), (8, K))
    with attention_kernel_sharding(make_mesh(1, 8)):
        y2 = Lx.linear(p2, x8, tp_role="col")
    want2 = qm.int4_matmul(x8, p2["w_p4"], p2["w_s"], force="jnp")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want2),
                               atol=1e-4)


@requires_8
def test_sharded_int4_tp_col_row_match_dequant(interpret_kernels):
    """The tensor-parallel int4 decompositions (round-4 VERDICT item 5):
    'col' shards the packed weight's output dim (packing runs along the
    input dim, so each shard is a valid packed array); 'row' shards
    packed input rows and pairs them with x viewed as [..., 2, K/2]
    sharded on the last axis, psum-ing partials. Both must equal the
    unsharded dequant reference."""
    mesh = make_mesh(2, 4)
    ctx = KernelSharding(mesh)
    key = jax.random.PRNGKey(17)
    K, N = 256, 256
    B = 8
    x = jax.random.normal(key, (B, K), jnp.float32).astype(jnp.bfloat16)
    qw = jax.random.randint(jax.random.fold_in(key, 1), (K, N), -8, 8,
                            jnp.int8)
    wp = qm.pack_int4(qw)
    s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (N,))) + 0.1
    assert can_shard_int4_tp(ctx, B, K, N, "col")
    assert can_shard_int4_tp(ctx, B, K, N, "row")
    assert not can_shard_int4_tp(KernelSharding(make_mesh(8, 1)), B, K, N,
                                 "col")  # needs a model axis > 1
    want = qm.int4_matmul(x, wp, s, force="jnp")
    got_col = sharded_int4_matmul_tp(ctx, x, wp, s, "col")
    got_row = sharded_int4_matmul_tp(ctx, x, wp, s, "row")
    np.testing.assert_allclose(np.asarray(got_col), np.asarray(want),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_row), np.asarray(want),
                               atol=2e-3)


@requires_8
def test_sharded_int4_tp_3d_row(interpret_kernels):
    """Row decomposition with a middle (time) dim — the training-shaped
    [B, T, K] call."""
    mesh = make_mesh(2, 2)
    ctx = KernelSharding(mesh)
    key = jax.random.PRNGKey(23)
    K, N = 128, 128
    x = jax.random.normal(key, (4, 3, K), jnp.float32).astype(jnp.bfloat16)
    qw = jax.random.randint(jax.random.fold_in(key, 1), (K, N), -8, 8,
                            jnp.int8)
    wp = qm.pack_int4(qw)
    s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (N,))) + 0.1
    want = qm.int4_matmul(x, wp, s, force="jnp")
    got = sharded_int4_matmul_tp(ctx, x, wp, s, "row")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@requires_8
def test_sharded_fused_adaln_matches_xla(monkeypatch):
    """Fused AdaLN-modulate through the batch-axis shard_map wrapper ==
    the XLA path, values AND gradients — including the base dw/db psum
    the wrapper adds explicitly (a naive check_vma=False transpose would
    drop it)."""
    import sea_tpu.ops.fused_adaln as fadaln
    import sea_tpu.ops.layers as L
    from sea_tpu.parallel.kernel_shard import (can_shard_fused_adaln,
                                               sharded_fused_adaln)

    monkeypatch.setattr(fadaln, "_FORCE_INTERPRET", True)
    mesh = make_mesh(4, 2)
    ctx = KernelSharding(mesh)
    B, T, E = 8, 19, 128
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, T, E))
    cw = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                       (B, 1, E))
    cb = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (B, 1, E))
    w = jnp.ones((E,)) * 1.2
    b = jnp.full((E,), 0.3)
    assert can_shard_fused_adaln(ctx, x, cw, cb)

    def xla(x, cw, cb, w, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        norm = (xf - mean) * jax.lax.rsqrt(var + L.LN_EPS)
        return norm * (w + cw) + (b + cb)

    got = sharded_fused_adaln(ctx, x, cw, cb, w, b, L.LN_EPS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla(x, cw, cb,
                                                               w, b)),
                               atol=2e-6)

    g_shard = jax.grad(
        lambda x, cw, cb, w, b: jnp.sum(
            sharded_fused_adaln(ctx, x, cw, cb, w, b, L.LN_EPS) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, cw, cb, w, b)
    g_xla = jax.grad(
        lambda x, cw, cb, w, b: jnp.sum(xla(x, cw, cb, w, b) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, cw, cb, w, b)
    for a, b_, name in zip(g_shard, g_xla, ("dx", "dcw", "dcb", "dw",
                                            "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


@requires_8
@pytest.mark.heavy
def test_sharded_step_with_fused_adaln_matches_single_device(monkeypatch):
    """DP4xTP2 temporal train step with the fused AdaLN kernel forced on
    (interpret) == the single-device XLA-path step: the shard_map
    dispatch engages (counted) and the loss/params agree."""
    import dataclasses

    import sea_tpu.ops.fused_adaln as fadaln
    import sea_tpu.ops.layers as L
    import sea_tpu.parallel.kernel_shard as ksh
    from sea_tpu.configs.base import TemporalModelConfig, TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.parallel.train_step import make_sharded_temporal_train_step
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    monkeypatch.setattr(fadaln, "_FORCE_INTERPRET", True)
    calls = []
    orig = ksh.sharded_fused_adaln

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ksh, "sharded_fused_adaln", counting)

    cfg = TemporalModelConfig(num_layers=1, embed_dim=128, n_heads=2,
                              block_size=64, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln", ib_time_constant=True)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    B, T = 8, 12
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (B, T, cfg.num_fields, cfg.embed_dim))
    tgt = jax.random.normal(jax.random.fold_in(key, 1), src.shape)
    ib = jnp.broadcast_to(
        jax.random.normal(jax.random.fold_in(key, 2), (B, 1, cfg.ib_num)),
        (B, T, cfg.ib_num))
    rng = jax.random.PRNGKey(3)

    # Single-device reference on the XLA path (kernel off).
    prev = L.FUSED_ADALN
    try:
        L.FUSED_ADALN = False
        step1 = make_train_step(cfg, tx)
        p1, o1, stats1 = step1(jax.tree.map(jnp.copy, params),
                               tx.init(params), src, tgt, ib, rng)
    finally:
        L.FUSED_ADALN = prev

    mesh = make_mesh(4, 2)
    step8, pp, po, place = make_sharded_temporal_train_step(mesh, cfg, tx,
                                                            params)
    s_src, s_tgt, s_ib = place(src, tgt, ib)
    p8, o8, stats8 = step8(pp, po, s_src, s_tgt, s_ib, rng)

    assert calls, "sharded fused-adaln dispatch not taken"
    np.testing.assert_allclose(float(stats8["loss"]), float(stats1["loss"]),
                               rtol=1e-5)
    # Kernel-vs-XLA f32 reduction-order noise (~1e-7 on activations)
    # amplifies through Adam's rsqrt on near-zero second moments.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
