"""Feature-completeness tests: variational path, pool mode, time-shifting,
bf16 policy, public verification API, autoregressive_validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.configs.base import (SpatialModelConfig, TemporalModelConfig)


def test_variational_spatial_forward_and_loss():
    from sea_tpu.models.spatial import init_spatial, spatial_forward
    from sea_tpu.train.metrics import vloss
    cfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=16,
                             num_layers=1, embed_dim=4, n_heads=2,
                             block_size=64, variational=True, n_inp=9)
    params = init_spatial(jax.random.PRNGKey(0), cfg)
    assert "encoders_logvar" in params
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 3, 9))
    recon, mu, logvar = spatial_forward(params, cfg, x,
                                        rng=jax.random.PRNGKey(2),
                                        deterministic=False)
    assert recon.shape == x.shape
    total, rl, kl = vloss(x, recon, mu, logvar, kl_weight_min=0.0,
                          kl_weight_max=1e-4, iteration=10, total_steps=100)
    assert np.isfinite(float(total)) and np.isfinite(float(kl))
    # Deterministic (eval) path: z = mu, no rng needed.
    recon_det, mu2, _ = spatial_forward(params, cfg, x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-6)


def test_variational_heads_match_torch_reference():
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from models.encoder_decoder import SpatialModel
    from sea_tpu.models.spatial import spatial_encode
    from sea_tpu.utils.torch_compat import (spatial_params_from_torch,
                                            state_dict_to_numpy)
    cfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=20,
                             num_layers=1, embed_dim=4, n_heads=2,
                             block_size=64, variational=True, n_inp=7)
    torch.manual_seed(0)
    ref = SpatialModel(field_groups=[[0, 1], [2]], n_inp=7, MLP_hidden=20,
                       num_layers=1, embed_dim=4, n_heads=2, max_len=64,
                       src_len=0, dropout=0.0, variational=True).eval()
    x = torch.randn(2, 6, 3, 7)
    with torch.no_grad():
        _, mu_ref, logvar_ref = ref.encode(x)
    params = spatial_params_from_torch(state_dict_to_numpy(ref.state_dict()),
                                       cfg)
    _, mu, logvar = spatial_encode(params, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), logvar_ref.numpy(),
                               atol=2e-5)


def test_pool_mode_forward_and_torch_parity():
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from models.temporal import TemporalModel
    from sea_tpu.models.temporal import temporal_forward
    from sea_tpu.utils.torch_compat import (state_dict_to_numpy,
                                            temporal_params_from_torch)
    # Pool mode parity at T > 1: check the full sequence AND the scan
    # rollout against the reference prefix-recompute loop. (The adaln
    # variant is pinned separately by test_pool_adaln_torch_parity.)
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="pool",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="ln", pool_update_method="mlp")
    torch.manual_seed(1)
    ref = TemporalModel(num_layers=1, embed_dim=16, n_heads=2, max_len=16,
                        scale_ratio=2, src_len=0, num_variables=2,
                        down_proj=2, dropout=0.0, exchange_mode="pool",
                        pos_encoding_mode="learnable", ib_scale_mode="mlp",
                        ib_addition_mode="add", ib_mlp_layers=1, ib_num=1,
                        add_info_after_cross=True, LN_type="ln").eval()
    x = torch.randn(2, 6, 2, 16)
    ib = torch.randn(2, 6, 1)
    with torch.no_grad():
        out_ref = ref(x, ib).numpy()
    params = temporal_params_from_torch(state_dict_to_numpy(ref.state_dict()),
                                        cfg)
    got = np.asarray(temporal_forward(params, cfg, jnp.asarray(x.numpy()),
                                      jnp.asarray(ib.numpy())))
    np.testing.assert_allclose(got, out_ref, atol=5e-5)
    # Scan rollout (pool KV cache) vs the reference's prefix-recompute loop
    # (train_utils.py:202-207 semantics).
    from sea_tpu.rollout.engine import rollout_scan
    T = 5
    data = torch.randn(2, T + 1, 2, 16)
    ib_r = torch.randn(2, T, 1)
    with torch.no_grad():
        autoreg = data[:, 0:1]
        for i in range(T):
            out = ref(autoreg, ib_r[:, : i + 1])
            autoreg = torch.cat((autoreg, out[:, -1:]), dim=1)
        roll_ref = autoreg[:, 1:].numpy()
    roll = rollout_scan(params, cfg, jnp.asarray(data[:, 0].numpy()),
                        jnp.asarray(ib_r.numpy()))
    np.testing.assert_allclose(np.asarray(roll), roll_ref, atol=5e-4)


def test_pool_adaln_torch_parity():
    """Pin pool x adaln semantics (VERDICT r2 item 8).

    The reference expands + AdaLN-normalizes the learned pool token against
    the FULL [B,T,ib] cond (broadcasting [B,1,dd] -> [B,T,dd],
    temporal.py:268-270) — and then _update_pool_token (:244-251) discards
    that result for every reachable method, rebuilding the pool from
    `normalized` alone. So the combo runs fine at T>1 in the reference and
    the repo's first-step-cond stand-in is output-identical; this test
    pins that with an exact forward comparison."""
    import os, sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from models.temporal import TemporalModel
    from sea_tpu.models.temporal import temporal_forward
    from sea_tpu.utils.torch_compat import (state_dict_to_numpy,
                                            temporal_params_from_torch)
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="pool",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln", pool_update_method="mlp")
    torch.manual_seed(3)
    ref = TemporalModel(num_layers=1, embed_dim=16, n_heads=2, max_len=16,
                        scale_ratio=2, src_len=0, num_variables=2,
                        down_proj=2, dropout=0.0, exchange_mode="pool",
                        pos_encoding_mode="learnable", ib_scale_mode="mlp",
                        ib_addition_mode="add", ib_mlp_layers=1, ib_num=1,
                        add_info_after_cross=True, LN_type="adaln").eval()
    x = torch.randn(2, 6, 2, 16)
    ib = torch.randn(2, 6, 1)
    with torch.no_grad():
        out_ref = ref(x, ib).numpy()
    params = temporal_params_from_torch(state_dict_to_numpy(ref.state_dict()),
                                        cfg)
    got = np.asarray(temporal_forward(params, cfg, jnp.asarray(x.numpy()),
                                      jnp.asarray(ib.numpy())))
    np.testing.assert_allclose(got, out_ref, atol=5e-5)


def test_time_shifted_windows():
    from sea_tpu.data.datasets import make_temporal_windows
    tr, T, G, E = 2, 20, 2, 8
    lat = np.arange(tr * T * G * E, dtype=np.float32).reshape(tr, T, G, E)
    orig = np.zeros((tr, T, 5, 3), np.float32)
    ib = np.zeros((tr, T, 1), np.float32)
    rng = np.random.RandomState(0)
    w1 = make_temporal_windows(lat, orig, ib, src_len=6,
                               time_shift_rng=rng)
    w2 = make_temporal_windows(lat, orig, ib, src_len=6)
    assert w1.src.shape == w2.src.shape
    assert not np.array_equal(w1.src, w2.src)  # shifts applied
    # tgt must remain the next-step of src under shifting.
    np.testing.assert_array_equal(w1.src[:, 1:], w1.tgt[:, :-1])


def test_bf16_rollout_close_to_f32():
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan
    from sea_tpu.utils.precision import to_bf16
    cfg = TemporalModelConfig(num_layers=1, embed_dim=32, n_heads=2,
                              block_size=64, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32))
    ib = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1))
    full = np.asarray(rollout_scan(params, cfg, x0, ib))
    half = np.asarray(rollout_scan(
        to_bf16(params), cfg, x0.astype(jnp.bfloat16),
        ib.astype(jnp.bfloat16), cache_dtype=jnp.bfloat16),
        dtype=np.float32)
    rel = np.abs(half - full).max() / (np.abs(full).max() + 1e-8)
    assert rel < 0.1, rel  # bf16 rollout stays in the same regime


def test_verification_api():
    from sea_tpu.configs.base import MeshConfig
    from sea_tpu.data.mesh import MeshProcessor
    from sea_tpu.data.partitioner import build_partition_index
    from sea_tpu.utils.verification import (verify_mesh_processor,
                                            verify_partition_roundtrip)
    rng = np.random.RandomState(0)
    coords = rng.rand(200, 2).astype(np.float32)
    fields = rng.randn(12, 200, 3).astype(np.float32)
    part = build_partition_index(coords, 9, 9)
    stats = verify_partition_roundtrip(part, fields, coords)
    assert stats["passed"]
    mp = MeshProcessor(MeshConfig(), [[0, 1], [2]], coords.T)
    stats = verify_mesh_processor(mp, fields)
    assert stats["passed"]


def test_autoregressive_validation():
    from sea_tpu.configs.base import (CaseConfig, MeshConfig,
                                      SpatialModelConfig)
    from sea_tpu.data.datasets import TemporalWindows
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.evaluate import autoregressive_validation
    tcfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                               block_size=64, scale_ratio=2, num_fields=2,
                               down_proj=2, exchange_mode="sea",
                               ib_scale_mode="mlp", ib_addition_mode="add",
                               ln_type="adaln")
    case = CaseConfig(mesh=MeshConfig(m=3, n=3),
                      spatial=SpatialModelConfig(embed_dim=4),
                      temporal=tcfg)
    params = init_temporal(jax.random.PRNGKey(0), tcfg)
    W, L = 3, 7
    rng = np.random.RandomState(0)
    windows = TemporalWindows(
        src=rng.randn(W, L, 2, 16).astype(np.float32),
        tgt=rng.randn(W, L, 2, 16).astype(np.float32),
        tgt_original=np.zeros((W, L, 5, 3), np.float32),
        ib=rng.randn(W, L, 1).astype(np.float32))
    loss, rel = autoregressive_validation(params, case, windows)
    assert np.isfinite(loss) and np.isfinite(rel)


@pytest.mark.heavy
@pytest.mark.parametrize("policy", ["bfloat16", "bfloat16_mixed"])
def test_bf16_train_step_converges(policy):
    """Reduced-precision temporal train step (weight-only bf16 AND true
    mixed bf16 activations): loss decreases, master params stay f32."""
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=3e-3))
    opt = tx.init(params)
    step = make_train_step(cfg, tx, compute_dtype=policy)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    tgt = src * 0.5
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    losses = []
    for i in range(20):
        params, opt, stats = step(params, opt, src, tgt, ib,
                                  jax.random.fold_in(key, 10 + i))
        losses.append(float(stats["loss"]))
        assert np.isfinite(float(stats["grad_norm"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))


def test_bf16_mu_matches_f32_training():
    """adam_mu_dtype='bfloat16' (halved first-moment HBM traffic) must
    track the f32-moment run: loss decreases and the trajectories stay
    close over tens of steps."""
    import dataclasses
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    tgt = src * 0.5
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))

    losses = {}
    for mu_dtype in ("float32", "bfloat16"):
        tcfg = TrainConfig(learning_rate=3e-3)
        tcfg = dataclasses.replace(tcfg, adam_mu_dtype=mu_dtype)
        tx = make_optimizer(tcfg)
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        opt = tx.init(params)
        if mu_dtype == "bfloat16":
            mus = [l for l in jax.tree.leaves(opt)
                   if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
            assert mus, "no bf16 moment leaves — mu_dtype not applied"
        step = make_train_step(cfg, tx)
        traj = []
        for i in range(25):
            params, opt, stats = step(params, opt, src, tgt, ib,
                                      jax.random.fold_in(key, 10 + i))
            traj.append(float(stats["loss"]))
        losses[mu_dtype] = traj
    f32_t, bf16_t = losses["float32"], losses["bfloat16"]
    assert bf16_t[-1] < bf16_t[0] * 0.7, bf16_t
    # Trajectories agree within a few percent relative at every step.
    for a, b in zip(f32_t, bf16_t):
        assert abs(a - b) <= 0.05 * abs(a) + 1e-6, (a, b)


def test_bf16_mixed_forward_tracks_f32():
    """bf16 params + bf16 inputs: output comes back bf16 (no silent f32
    upcast anywhere in the stream — LN/RoPE/PE preserve input dtype) and
    tracks the f32 forward within bf16 tolerance."""
    import jax
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    from sea_tpu.utils.precision import to_bf16
    cfg = TemporalModelConfig(num_layers=2, embed_dim=32, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 8, 2, 32))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 1))
    full = np.asarray(temporal_forward(params, cfg, src, ib))
    half_out = temporal_forward(to_bf16(params), cfg,
                                src.astype(jnp.bfloat16),
                                ib.astype(jnp.bfloat16))
    assert half_out.dtype == jnp.bfloat16, half_out.dtype
    half = np.asarray(half_out, dtype=np.float32)
    rel = np.abs(half - full).max() / (np.abs(full).max() + 1e-8)
    assert rel < 0.05, rel


def test_variational_latent_service_returns_post_transformer_z():
    """Regression (review finding): the frozen-encoder service must return
    the post-transformer latent z, not the raw mu head output."""
    import jax
    from sea_tpu.data.latents import LatentService
    from sea_tpu.models.spatial import init_spatial, spatial_encode
    cfg = SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=8,
                             num_layers=1, embed_dim=4, n_heads=2,
                             block_size=32, variational=True, n_inp=7)
    params = init_spatial(jax.random.PRNGKey(0), cfg)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, 4, 3, 7)))
    svc = LatentService(cfg, params)
    got = svc.encode_dataset(x)
    z, mu, _ = spatial_encode(params, cfg, x)  # deterministic: z from mu
    np.testing.assert_allclose(got, np.asarray(z), atol=1e-6)
    assert not np.allclose(got, np.asarray(mu).reshape(got.shape), atol=1e-3)


def test_init_temporal_large_G_attention_mode():
    """Regression (review finding): key pool must not exhaust at G >= 8
    with attention ib-conditioning."""
    import jax
    from sea_tpu.models.temporal import init_temporal
    cfg = TemporalModelConfig(num_layers=1, embed_dim=32, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=8,
                              down_proj=2, exchange_mode="sea",
                              ib_scale_mode="mlp",
                              ib_addition_mode="attention", ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    assert len(params["blocks"][0]["cross_attn_ib"]) == 8


def test_mixed_sea_layout_roundtrip_and_training():
    """SEA_mixed layout (train_encoder.py:126-130): reshape without permute
    — deliberate field/cell mixing. Round-trips and trains."""
    import jax
    from sea_tpu.data.datasets import apply_sea_layout, invert_sea_layout
    rng = np.random.RandomState(0)
    patched = rng.randn(4, 6, 5, 3).astype(np.float32)  # [B,P,C,F]
    mixed = apply_sea_layout(patched, "mixed")
    assert mixed.shape == (4, 6, 3, 5)
    back = invert_sea_layout(mixed, "mixed")
    np.testing.assert_array_equal(back, patched)
    # isolate and mixed genuinely differ (permute vs reshape).
    iso = apply_sea_layout(patched, "isolate")
    assert not np.array_equal(mixed, iso)


def test_linear_scheduler():
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.configs.base import TrainConfig
    import jax, optax
    tx = make_optimizer(TrainConfig(learning_rate=1e-3, scheduler="linear"),
                        transition_steps=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    # First update uses ~0.1x lr; after transition, ~1x.
    u1, state = tx.update(g, state, params)
    for _ in range(12):
        u2, state = tx.update(g, state, params)
    assert abs(float(u1["w"][0])) < abs(float(u2["w"][0]))


def test_single_field_group_sea():
    """Regression (review finding): G=1 SEA exchange must behave like the
    reference's empty sum() — no crash, exchange is a no-op."""
    import jax
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    from sea_tpu.rollout.engine import rollout_scan
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=1,
                              down_proj=2, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 1, 16))
    ib = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 1))
    out = temporal_forward(params, cfg, x, ib)
    assert out.shape == x.shape
    roll = rollout_scan(params, cfg, x[:, 0], ib)
    assert bool(jnp.isfinite(roll).all())


def test_ib_mlp_dropout_active_in_training():
    """Regression (review finding): the ib MLP must apply dropout in
    training, matching the reference (temporal.py:109)."""
    import jax
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.5, exchange_mode="simple",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="ln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 16))
    ib = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 1))
    a = temporal_forward(params, cfg, x, ib, rng=jax.random.PRNGKey(3),
                         deterministic=False)
    b = temporal_forward(params, cfg, x, ib, rng=jax.random.PRNGKey(4),
                         deterministic=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
@pytest.mark.parametrize("remat", [True, "dots"])
def test_remat_gradients_match(remat):
    """cfg.remat (jax.checkpoint per block; 'dots' saves matmul outputs
    and recomputes only elementwise interiors) must not change gradients."""
    import dataclasses
    import jax
    from sea_tpu.models.temporal import init_temporal, temporal_forward
    cfg = TemporalModelConfig(num_layers=2, embed_dim=16, n_heads=2,
                              block_size=16, scale_ratio=2, num_fields=2,
                              down_proj=2, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    cfg_remat = dataclasses.replace(cfg, remat=remat)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 2, 16))
    ib = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 1))

    def loss(c):
        return lambda p: jnp.sum(temporal_forward(p, c, x, ib) ** 2)

    g1 = jax.grad(loss(cfg))(params)
    g2 = jax.grad(loss(cfg_remat))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_per_tensor_observability_step():
    """TrainConfig.log_per_tensor (the wandb.watch per-tensor equivalent,
    reference utils/train_utils.py:75-76): stats["tensors"] carries one L2
    norm per gradient tensor and per parameter tensor, named by tree path,
    and the parameter norms match an eager per-leaf computation."""
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train import metrics as M
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig

    # Path naming + exact values on a hand-built tree.
    tree = {"a": {"w": jnp.arange(3.0)}, "b": [jnp.full((2, 2), 2.0)]}
    norms = M.per_tensor_norms(tree, "G/")
    assert set(norms) == {"G/a/w", "G/b/0"}
    np.testing.assert_allclose(float(norms["G/a/w"]), np.sqrt(5.0),
                               rtol=1e-6)
    np.testing.assert_allclose(float(norms["G/b/0"]), 4.0, rtol=1e-6)

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    snapshot = jax.tree.map(np.asarray, params)
    n_leaves = len(jax.tree.leaves(params))
    tx = make_optimizer(TrainConfig(learning_rate=3e-3))
    opt = tx.init(params)
    step = make_train_step(cfg, tx, per_tensor=True)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    _, _, stats = step(params, opt, src, src * 0.5, ib,
                       jax.random.PRNGKey(2))
    tensors = stats["tensors"]
    assert len(tensors) == 2 * n_leaves
    assert all(np.isfinite(float(v)) for v in tensors.values())
    # Param norms are the PRE-update params' norms, leaf by leaf.
    expected = M.per_tensor_norms(snapshot, "Param_Norm/")
    for k, v in expected.items():
        np.testing.assert_allclose(float(tensors[k]), float(v), rtol=1e-5)
    # Grad norms compose to the logged global norm.
    gsq = sum(float(v) ** 2 for k, v in tensors.items()
              if k.startswith("Grad_Norm/"))
    np.testing.assert_allclose(np.sqrt(gsq), float(stats["grad_norm"]),
                               rtol=1e-4)


def test_bf16_shadow_matches_mixed_training():
    """compute_dtype='bfloat16_shadow' (persistent bf16 weight copy in the
    optimizer state, bf16 gradients) must track 'bfloat16_mixed': the two
    run numerically identical forwards (the shadow IS to_bf16 of the f32
    masters), so the only divergence is gradient rounding to bf16 — loss
    decreases and the trajectories stay close. Also pins the invariant
    shadow == to_bf16(params) after every step."""
    import dataclasses
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import ShadowOptState, make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.utils.precision import to_bf16

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    tgt = src * 0.5
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))

    losses = {}
    for policy in ("bfloat16_mixed", "bfloat16_shadow"):
        tcfg = dataclasses.replace(TrainConfig(learning_rate=3e-3),
                                   compute_dtype=policy)
        tx = make_optimizer(tcfg)
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        opt = tx.init(params)
        if policy == "bfloat16_shadow":
            assert isinstance(opt, ShadowOptState)
            for s, p in zip(jax.tree.leaves(opt.shadow),
                            jax.tree.leaves(params)):
                assert s.dtype == (jnp.bfloat16 if jnp.issubdtype(
                    p.dtype, jnp.floating) else p.dtype)
        step = make_train_step(cfg, tx, compute_dtype=policy)
        traj = []
        for i in range(25):
            params, opt, stats = step(params, opt, src, tgt, ib,
                                      jax.random.fold_in(key, 10 + i))
            traj.append(float(stats["loss"]))
        if policy == "bfloat16_shadow":
            # The shadow is exactly the bf16 image of the new masters.
            want = to_bf16(params)
            for a, b in zip(jax.tree.leaves(opt.shadow),
                            jax.tree.leaves(want)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        losses[policy] = traj
    mixed, shadow = losses["bfloat16_mixed"], losses["bfloat16_shadow"]
    assert shadow[-1] < shadow[0] * 0.7, shadow
    for a, b in zip(mixed, shadow):
        assert abs(a - b) <= 0.05 * max(abs(a), abs(b)) + 1e-6, (mixed,
                                                                 shadow)


def test_bf16_shadow_checkpoint_roundtrip(tmp_path):
    """A full checkpoint saved mid-run under compute_dtype=
    'bfloat16_shadow' restores the ShadowOptState (bf16 shadow leaves
    intact) through the npz template path, and the restored state steps."""
    import dataclasses
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.utils.checkpoint import (load_full_checkpoint,
                                          save_checkpoint)

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2)
    tcfg = dataclasses.replace(TrainConfig(learning_rate=1e-3),
                               compute_dtype="bfloat16_shadow")
    tx = make_optimizer(tcfg)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    step = make_train_step(cfg, tx, compute_dtype="bfloat16_shadow")
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    params, opt, _ = step(params, opt, src, src * 0.5, ib,
                          jax.random.PRNGKey(2))

    path = save_checkpoint(str(tmp_path), "temporal", "c", "r", params,
                           opt_state=opt, meta={"epoch": 1})
    rparams, ropt, _ = load_full_checkpoint(path, params, tx.init(params))
    assert ropt is not None
    assert jax.tree.structure(ropt) == jax.tree.structure(opt)
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(ropt)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The restored state steps (shadow consumed by the forward).
    rparams, ropt, stats = step(rparams, ropt, src, src * 0.5, ib,
                                jax.random.PRNGKey(3))
    assert np.isfinite(float(stats["loss"]))


def test_adafactor_train_step_converges_and_composes_with_shadow():
    """TrainConfig.optimizer='adafactor' (factored second moment, no
    first moment — the optimizer-state-HBM-traffic recipe): the temporal
    train step converges, and composing it with
    compute_dtype='bfloat16_shadow' keeps bf16 shadow leaves in the
    state and still converges."""
    import dataclasses
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import ShadowOptState, make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              block_size=32, scale_ratio=2, num_fields=2,
                              down_proj=2, dropout=0.0, exchange_mode="sea",
                              ib_scale_mode="mlp", ib_addition_mode="add",
                              ln_type="adaln")
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    tgt = src * 0.5
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))

    for policy in ("float32", "bfloat16_shadow"):
        tcfg = dataclasses.replace(TrainConfig(learning_rate=3e-3),
                                   optimizer="adafactor",
                                   compute_dtype=policy)
        tx = make_optimizer(tcfg)
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        opt = tx.init(params)
        if policy == "bfloat16_shadow":
            assert isinstance(opt, ShadowOptState)
            shadows = [l for l in jax.tree.leaves(opt.shadow)
                       if hasattr(l, "dtype")]
            assert shadows and all(l.dtype == jnp.bfloat16 for l in shadows)
        step = make_train_step(cfg, tx, compute_dtype=policy)
        losses = []
        for i in range(25):
            params, opt, stats = step(params, opt, src, tgt, ib,
                                      jax.random.fold_in(key, 10 + i))
            losses.append(float(stats["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0] * 0.7, (policy, losses)
        # Master params stay f32 under both policies.
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params)
                   if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                             jnp.floating))


def test_adafactor_state_is_factored_and_checkpoints(tmp_path):
    """Factoring engages on big matrices (row/col stats instead of a
    full-shape nu) so the optimizer state is a tiny fraction of the
    params, and the state round-trips through the npz checkpoint path
    with an exact continuation."""
    import dataclasses
    import jax
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step
    from sea_tpu.configs.base import TrainConfig
    from sea_tpu.utils.checkpoint import (load_full_checkpoint,
                                          save_checkpoint)

    tcfg = dataclasses.replace(TrainConfig(learning_rate=1e-3),
                               optimizer="adafactor")
    tx = make_optimizer(tcfg)

    # Factoring check on a matrix past optax's min_dim_size_to_factor=128:
    # second-moment storage collapses to v_row + v_col (+ a placeholder v).
    big = {"w": jnp.zeros((256, 384), jnp.float32)}
    st = tx.init(big)
    n_state = sum(np.asarray(l).size for l in jax.tree.leaves(st))
    assert n_state <= 256 + 384 + 8, n_state  # count + placeholders

    # Full checkpoint round-trip on a real model + exact continuation.
    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (2, 6, 2, 16))
    ib = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 1))
    params, opt, _ = step(params, opt, src, src * 0.5, ib,
                          jax.random.PRNGKey(2))

    path = save_checkpoint(str(tmp_path), "temporal", "c", "r", params,
                           opt_state=opt, meta={"epoch": 1})
    rparams, ropt, _ = load_full_checkpoint(path, params, tx.init(params))
    assert ropt is not None
    assert jax.tree.structure(ropt) == jax.tree.structure(opt)
    out_a = step(params, opt, src, src * 0.5, ib, jax.random.PRNGKey(3))
    out_b = step(rparams, ropt, src, src * 0.5, ib, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree.leaves(out_a[:2]), jax.tree.leaves(out_b[:2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stack_fields_equals_sequential():
    """TemporalModelConfig.stack_fields (SURVEY §7 stacked-params vmap):
    the batched per-field LN->MLP->proj tail must be EXACTLY the
    sequential loop — deterministic and with dropout (same per-field
    fold_in keys, vmapped), for both ln and adaln."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal, temporal_forward

    for ln_type in ("ln", "adaln"):
        cfg = TemporalModelConfig(
            num_layers=2, embed_dim=32, n_heads=2, block_size=64,
            scale_ratio=2, src_len=0, num_fields=3, down_proj=2,
            dropout=0.2, exchange_mode="sea", ib_scale_mode="mlp",
            ib_addition_mode="add", ib_mlp_layers=1, ib_num=1,
            add_info_after_cross=True, ln_type=ln_type)
        scfg = dataclasses.replace(cfg, stack_fields=True)
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        B, T = 2, 6
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (B, T, cfg.num_fields, cfg.embed_dim))
        ib = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.ib_num))

        want = temporal_forward(params, cfg, x, ib)
        got = temporal_forward(params, scfg, x, ib)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=ln_type)

        rng = jax.random.PRNGKey(7)
        want_d = temporal_forward(params, cfg, x, ib, rng=rng,
                                  deterministic=False)
        got_d = temporal_forward(params, scfg, x, ib, rng=rng,
                                 deterministic=False)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   atol=1e-6, err_msg=f"{ln_type} dropout")
        assert not np.allclose(np.asarray(got_d), np.asarray(want),
                               atol=1e-3)


def test_ib_time_constant_equals_full():
    """TemporalModelConfig.ib_time_constant: with conditioning constant
    over T (per-trajectory Reynolds number — both shipped datasets), the
    ib-only sites compute on [B, 1] rows and broadcast. Must be exactly
    the full-T computation, for adaln + every ib injection mode."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sea_tpu.configs.base import TemporalModelConfig
    from sea_tpu.models.temporal import init_temporal, temporal_forward

    for mode in ("add", "concat", "none"):
        cfg = TemporalModelConfig(
            num_layers=1, embed_dim=32, n_heads=2, block_size=64,
            scale_ratio=2, src_len=0, num_fields=2, down_proj=2,
            dropout=0.0, exchange_mode="sea", ib_scale_mode="mlp",
            ib_addition_mode=mode, ib_mlp_layers=1, ib_num=1,
            # concat must inject BEFORE the attention stack: the blocks
            # are sized for the concatenated internal dim (reference
            # semantics — after_cross+concat is shape-invalid there too)
            add_info_after_cross=(mode != "concat"), ln_type="adaln")
        ccfg = dataclasses.replace(cfg, ib_time_constant=True)
        params = init_temporal(jax.random.PRNGKey(0), cfg)
        B, T = 2, 6
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (B, T, cfg.num_fields, cfg.embed_dim))
        # constant-over-T conditioning, distinct per trajectory
        ib = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(2), (B, 1, cfg.ib_num)),
            (B, T, cfg.ib_num))
        want = temporal_forward(params, cfg, x, ib)
        got = temporal_forward(params, ccfg, x, ib)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=mode)

        # TRAINING with dropout must also be exact (review finding: the
        # ib-MLP's trailing dropout mask is per token — the optimization
        # must not broadcast one mask over T, so the injection stream
        # stays full-length when that dropout is live).
        dcfg = dataclasses.replace(cfg, dropout=0.2)
        dccfg = dataclasses.replace(ccfg, dropout=0.2)
        rng = jax.random.PRNGKey(9)
        want_d = temporal_forward(params, dcfg, x, ib, rng=rng,
                                  deterministic=False)
        got_d = temporal_forward(params, dccfg, x, ib, rng=rng,
                                 deterministic=False)
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                                   atol=1e-6, err_msg=f"{mode} dropout")


def test_ib_time_constant_autodetect(tmp_path, capsys):
    """The temporal train driver detects constant-over-T conditioning
    from the actual host data and enables the optimization — and does
    NOT when the data varies."""
    import dataclasses

    import numpy as np

    from sea_tpu.configs.cylinder_flow_smoke import get_case
    from sea_tpu.data.synthetic import cylinder_like
    from sea_tpu.train import train_spatial, train_temporal

    case = get_case()
    case = case.replace(run=dataclasses.replace(
        case.run, save_dir=str(tmp_path)))
    data = cylinder_like(tr=6, T=10, n_nodes=200,
                         seed=case.spatial_split.random_seed)
    tt = case.temporal_train
    case = case.replace(temporal_train=dataclasses.replace(
        tt, dataset_src_len=9, batch_size=2))
    assert case.temporal.ln_type == "adaln"
    train_spatial.train(case, data=data, epochs=1)
    capsys.readouterr()
    train_temporal.train(case, data=data, epochs=1)
    assert "ib_time_constant" in capsys.readouterr().out

    # Time-VARYING ib: detection must decline.
    fields, coords, ib = data
    ib = ib + np.linspace(0, 1, ib.shape[1])[None, :, None].astype(
        np.float32)
    train_temporal.train(case, data=(fields, coords, ib), epochs=1)
    assert "ib_time_constant" not in capsys.readouterr().out


def test_hash_dropout_semantics():
    """ops.layers.dropout (counter-hash mask, round-5): Bernoulli(rate)
    statistics, inverted-scale values {0, 1/(1-rate)}, deterministic per
    (key, position), key-sensitive, and identical under vmap vs the
    sequential per-field fold_in loop (the stacked-params paths rely on
    that)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import sea_tpu.ops.layers as L

    assert L.HASH_DROPOUT
    x = jnp.ones((8, 64, 32))
    key = jax.random.PRNGKey(42)
    y = np.asarray(L.dropout(x, 0.25, key, False))
    np.testing.assert_allclose(np.unique(y.round(5)), [0.0, 1 / 0.75],
                               atol=1e-5)
    assert abs((y == 0).mean() - 0.25) < 0.02
    y2 = np.asarray(L.dropout(x, 0.25, key, False))
    assert (y == y2).all()
    y3 = np.asarray(L.dropout(x, 0.25, jax.random.fold_in(key, 1), False))
    assert (y != y3).any()
    # passthroughs
    assert L.dropout(x, 0.0, key, False) is x
    assert L.dropout(x, 0.25, key, True) is x

    ks = jnp.stack([jax.random.fold_in(key, i) for i in range(3)])
    xv = jnp.ones((3, 16, 8))
    yv = jax.vmap(lambda k, x: L.dropout(x, 0.25, k, False))(ks, xv)
    ys = jnp.stack([L.dropout(xv[i], 0.25, jax.random.fold_in(key, i),
                              False) for i in range(3)])
    assert (np.asarray(yv) == np.asarray(ys)).all()
