"""ops/quant_matmul: packed-nibble int4 serving matmul.

The Pallas kernel itself needs a real TPU (Mosaic); CPU tests pin the
packing format, the jnp fallback numerics, and the dispatch predicate.
Kernel-vs-fallback exactness on hardware is asserted both here (skipped
off-TPU) and by tools/bench_quant_matvec.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sea_tpu.ops.quant_matmul import (int4_matmul, kernel_supported,
                                      pack_int4, unpack_int4)


def _rand_q(key, K, N):
    return jax.random.randint(key, (K, N), -7, 8, dtype=jnp.int8)


def test_pack_unpack_roundtrip_exact():
    q = _rand_q(jax.random.PRNGKey(0), 64, 256)
    wp = pack_int4(q)
    assert wp.dtype == jnp.uint8 and wp.shape == (32, 256)
    back = unpack_int4(wp, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
    # full nibble range survives, including the -8 corner the quantizer
    # never emits but the format must represent
    q_edge = jnp.array([[-8, -7, 0, 7]] * 2, dtype=jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(pack_int4(q_edge), dtype=jnp.int32)),
        np.asarray(q_edge))


def test_fallback_matches_reference_dequant():
    key = jax.random.PRNGKey(1)
    q = _rand_q(key, 128, 256)
    s = jax.random.uniform(jax.random.fold_in(key, 1), (256,), minval=0.01)
    x = jax.random.normal(jax.random.fold_in(key, 2), (3, 128))
    ref = (x @ q.astype(jnp.bfloat16)) * s
    got = int4_matmul(x, pack_int4(q), s, force="jnp")
    # split-K (two-plane) summation reorders the f32 accumulation vs the
    # single reference dot — absolute f32-epsilon slack, no rtol (near-
    # zero outputs have unbounded relative error)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-5)
    # leading dims flatten/restore
    got3 = int4_matmul(x.reshape(1, 3, 128), pack_int4(q), s, force="jnp")
    np.testing.assert_allclose(np.asarray(got3)[0], np.asarray(got),
                               rtol=0, atol=0)


def test_dispatch_predicate():
    # serving shapes on TPU -> kernel; everything else -> fallback
    assert not kernel_supported(1, 2048, 16384, backend="cpu")
    assert kernel_supported(1, 2048, 16384, backend="tpu")
    assert kernel_supported(8, 16384, 2048, backend="tpu")
    assert not kernel_supported(9, 2048, 16384, backend="tpu")   # M cap
    assert not kernel_supported(1, 2048, 200, backend="tpu")     # N % 128
    assert not kernel_supported(1, 10, 16384, backend="tpu")     # K/2 % 8
    # the kernel serves every quantized size (all-kernel measured best
    # once native S4 is off the table, docs/ROUND3.md): small attention
    # mats qualify, but below the quantizers' min_size it stays off
    assert kernel_supported(1, 2048, 2048, backend="tpu")
    assert not kernel_supported(1, 128, 256, backend="tpu")      # < 2^16


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel needs a real TPU")
def test_kernel_matches_fallback_exactly():
    key = jax.random.PRNGKey(2)
    for K, N, M in [(2048, 16384, 1), (16384, 2048, 1), (2048, 2048, 8)]:
        q = _rand_q(jax.random.fold_in(key, K + N), K, N)
        s = jax.random.uniform(jax.random.fold_in(key, N), (N,),
                               minval=0.01)
        x = jax.random.normal(jax.random.fold_in(key, M), (M, K),
                              dtype=jnp.bfloat16)
        wp = pack_int4(q)
        ref = int4_matmul(x, wp, s, force="jnp")
        got = int4_matmul(x, wp, s, force="kernel")
        # both paths accumulate f32; the kernel's split-K + rank-1
        # correction reorders the sum, so allow f32-epsilon slack
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
