"""Numerical parity against the PyTorch reference implementation.

These tests import the reference (read-only, mounted at /root/reference),
build its modules with torch-seeded weights, convert the state dict into
SEA-TPU parameter pytrees (sea_tpu/utils/torch_compat.py), and assert that
our JAX forward passes reproduce the reference outputs on identical inputs.

This is the strongest correctness evidence we can produce without trained
checkpoints: same weights, same inputs, same outputs (f32, atol ~1e-4).
Skipped automatically when the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available")

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

from sea_tpu.configs.base import SpatialModelConfig, TemporalModelConfig  # noqa: E402
from sea_tpu.models.spatial import init_spatial, spatial_forward  # noqa: E402
from sea_tpu.models.temporal import temporal_forward  # noqa: E402
from sea_tpu.utils.torch_compat import (spatial_params_from_torch,  # noqa: E402
                                        state_dict_to_numpy,
                                        temporal_params_from_torch)


def _to_np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# Primitive parity
# ---------------------------------------------------------------------------

def test_rope_parity():
    from models.base_blocks import apply_rotary_emb, precompute_freqs_cis
    from sea_tpu.ops.rope import apply_rope, rope_cos_sin
    torch.manual_seed(0)
    B, T, H, hd = 2, 10, 4, 16
    q = torch.randn(B, T, H, hd)
    k = torch.randn(B, T, H, hd)
    freqs = precompute_freqs_cis(hd, T)
    q_ref, k_ref = apply_rotary_emb(q, k, freqs)

    cos, sin = rope_cos_sin(hd, np.arange(T))
    q_got = np.asarray(apply_rope(_to_np(q), cos, sin))
    k_got = np.asarray(apply_rope(_to_np(k), cos, sin))
    # f32 trig: torch.polar vs cos/sin differ in the last couple of ulps.
    np.testing.assert_allclose(q_got, _to_np(q_ref), atol=1e-4)
    np.testing.assert_allclose(k_got, _to_np(k_ref), atol=1e-4)


def test_adaln_parity():
    from models.base_blocks import AdaLN
    from sea_tpu.ops.layers import adaln
    torch.manual_seed(1)
    m = AdaLN(embed_dim=24, cond_dim=3)
    # Give the cond MLP non-trivial weights.
    for p in m.parameters():
        torch.nn.init.normal_(p, std=0.5)
    x = torch.randn(2, 7, 24)
    cond = torch.randn(2, 7, 3)
    ref = _to_np(m(x, cond))
    sd = state_dict_to_numpy(m.state_dict())
    params = {"w": sd["weight"], "b": sd["bias"],
              "cond_fc1": {"w": sd["cond_mlp.0.weight"].T,
                           "b": sd["cond_mlp.0.bias"]},
              "cond_fc2": {"w": sd["cond_mlp.2.weight"].T,
                           "b": sd["cond_mlp.2.bias"]}}
    got = np.asarray(adaln(params, _to_np(x), _to_np(cond)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_masked_mha_parity():
    from models.base_blocks import MaskedMultiHeadAttention
    from sea_tpu.ops.attention import mha
    torch.manual_seed(2)
    m = MaskedMultiHeadAttention(n_heads=4, embed_dim=32, max_len=64,
                                 src_len=0, dropout=0.0).eval()
    x = torch.randn(2, 20, 32)
    ref = _to_np(m(x))
    sd = state_dict_to_numpy(m.state_dict())
    params = {"q": {"w": sd["q.weight"].T, "b": sd["q.bias"]},
              "k": {"w": sd["k.weight"].T, "b": sd["k.bias"]},
              "v": {"w": sd["v.weight"].T, "b": sd["v.bias"]},
              "proj": {"w": sd["projection.weight"].T}}
    got = np.asarray(mha(params, _to_np(x), _to_np(x), n_heads=4,
                         causal=True, rope=True, src_len=0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_masked_cross_mha_parity():
    from models.base_blocks import MaskedMultiHeadCrossAttention
    from sea_tpu.ops.attention import mha
    torch.manual_seed(3)
    m = MaskedMultiHeadCrossAttention(n_heads=2, embed_dim=16, max_len=64,
                                      src_len=0, dropout=0.0).eval()
    x1 = torch.randn(2, 12, 16)
    x2 = torch.randn(2, 12, 16)
    ref = _to_np(m(x1, x2))
    sd = state_dict_to_numpy(m.state_dict())
    params = {"q": {"w": sd["q.weight"].T, "b": sd["q.bias"]},
              "k": {"w": sd["k.weight"].T, "b": sd["k.bias"]},
              "v": {"w": sd["v.weight"].T, "b": sd["v.bias"]},
              "proj": {"w": sd["projection.weight"].T}}
    got = np.asarray(mha(params, _to_np(x1), _to_np(x2), n_heads=2,
                         causal=True, rope=True, src_len=0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_mlp_parity():
    from models.base_blocks import MLP
    from sea_tpu.utils.torch_compat import _mlp
    from sea_tpu.ops.layers import mlp as jmlp
    for num_layers in (None, 1, 3):
        torch.manual_seed(4)
        m = MLP(dim_in=12, dropout=0.0, scale_ratio=2, dim_out=8,
                num_layers=num_layers).eval()
        x = torch.randn(3, 5, 12)
        ref = _to_np(m(x))
        sd = state_dict_to_numpy(m.state_dict())
        params = _mlp({f"x.{k}": v for k, v in sd.items()}, "x",
                      num_layers=num_layers)
        got = np.asarray(jmlp(params, _to_np(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"num_layers={num_layers}")


def test_positional_encoding_parity():
    from models.base_blocks import PositionalEncoding
    from sea_tpu.ops.layers import positional_encoding, sinusoidal_pe_table
    m = PositionalEncoding(d_model=20, dropout=0.0).eval()
    x = torch.randn(2, 15, 20)
    ref = _to_np(m(x))
    pe = sinusoidal_pe_table(20)
    got = np.asarray(positional_encoding(pe, _to_np(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gaussian_fourier_parity():
    from models.base_blocks import GaussianFourierProjection
    from sea_tpu.ops.layers import gaussian_fourier
    torch.manual_seed(5)
    m = GaussianFourierProjection(input_dim=2, half_dim=8)
    x = torch.randn(3, 7, 2)
    ref = _to_np(m(x))
    params = {"W": _to_np(m.W)}
    got = np.asarray(gaussian_fourier(params, _to_np(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Full-model parity
# ---------------------------------------------------------------------------

def _spatial_cfg(variational=False):
    return SpatialModelConfig(field_groups=((0, 1), (2,)), mlp_hidden=40,
                              num_layers=2, embed_dim=8, n_heads=2,
                              block_size=128, src_len=0, dropout=0.0,
                              variational=variational, n_inp=11)


def test_spatial_model_parity():
    from models.encoder_decoder import SpatialModel
    cfg = _spatial_cfg()
    torch.manual_seed(6)
    ref_model = SpatialModel(field_groups=[[0, 1], [2]], n_inp=cfg.n_inp,
                             MLP_hidden=cfg.mlp_hidden,
                             num_layers=cfg.num_layers,
                             embed_dim=cfg.embed_dim, n_heads=cfg.n_heads,
                             max_len=cfg.block_size, src_len=0,
                             dropout=0.0, variational=False).eval()
    x = torch.randn(4, 12, 3, cfg.n_inp)  # [B,P,F,C], P=12 patches
    with torch.no_grad():
        ref = _to_np(ref_model(x.clone()))
    params = spatial_params_from_torch(
        state_dict_to_numpy(ref_model.state_dict()), cfg)
    got = np.asarray(spatial_forward(params, cfg, _to_np(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


TEMPORAL_VARIANTS = [
    dict(exchange_mode="sea", ln_type="adaln", ib_scale_mode="mlp",
         ib_addition_mode="add", add_info_after_cross=True),
    dict(exchange_mode="sea", ln_type="ln", ib_scale_mode="fourier",
         ib_addition_mode="add", add_info_after_cross=False),
    dict(exchange_mode="addition", ln_type="adaln", ib_scale_mode="linear",
         ib_addition_mode="none", add_info_after_cross=True),
    dict(exchange_mode="simple", ln_type="ln", ib_scale_mode="mlp",
         ib_addition_mode="add", add_info_after_cross=True),
    # concat widens the stream to E+64 and only works with the conditioning
    # injected BEFORE the self-attention (after_cross=True would feed an
    # E-dim input into (E+64)-dim modules and crash in the reference too).
    dict(exchange_mode="sea", ln_type="ln", ib_scale_mode="linear",
         ib_addition_mode="concat", add_info_after_cross=False),
    # attention-mode ib conditioning: unmasked cross-attn over the ib stream.
    dict(exchange_mode="sea", ln_type="adaln", ib_scale_mode="mlp",
         ib_addition_mode="attention", add_info_after_cross=True),
]


@pytest.mark.parametrize("variant", TEMPORAL_VARIANTS)
def test_temporal_model_parity(variant):
    from models.temporal import TemporalModel
    G, E, T, B = 3, 24, 14, 2
    cfg = TemporalModelConfig(num_layers=2, embed_dim=E, n_heads=2,
                              block_size=64, scale_ratio=2, src_len=0,
                              num_fields=G, down_proj=2, dropout=0.0,
                              ib_mlp_layers=1, ib_num=1, **variant)
    torch.manual_seed(7)
    ref_model = TemporalModel(
        num_layers=cfg.num_layers, embed_dim=E, n_heads=cfg.n_heads,
        max_len=cfg.block_size, scale_ratio=cfg.scale_ratio, src_len=0,
        num_variables=G, down_proj=cfg.down_proj, dropout=0.0,
        exchange_mode=cfg.exchange_mode,
        pos_encoding_mode=cfg.pos_encoding_mode,
        ib_scale_mode=cfg.ib_scale_mode,
        ib_addition_mode=cfg.ib_addition_mode,
        ib_mlp_layers=cfg.ib_mlp_layers, ib_num=cfg.ib_num,
        add_info_after_cross=cfg.add_info_after_cross,
        LN_type=cfg.ln_type).eval()
    x = torch.randn(B, T, G, E)
    ib = torch.randn(B, T, 1)
    with torch.no_grad():
        ref = _to_np(ref_model(x, ib))
    params = temporal_params_from_torch(
        state_dict_to_numpy(ref_model.state_dict()), cfg)
    got = np.asarray(temporal_forward(params, cfg, _to_np(x), _to_np(ib)))
    np.testing.assert_allclose(got, ref, atol=5e-5,
                               err_msg=str(variant))
