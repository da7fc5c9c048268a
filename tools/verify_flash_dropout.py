"""On-chip verification of in-kernel flash-attention dropout.

Interpret mode has no faithful TPU PRNG emulation, so this runs on real
TPU hardware. It establishes full correctness of the dropout path:

1. Extract the EXACT {0, 1/(1-rate)} mask the kernels generate
   (flash_attention._dropout_mask_dense — same seeding, same PRNG).
2. Feed that mask to an XLA oracle (softmax -> mask multiply -> @ v).
3. Assert forward outputs AND all gradients (dq, dk, dv) match, proving
   the fused backward regenerates the identical mask.
4. Same seed -> identical outputs; different seed -> different outputs.
5. Keep-rate of the mask is within 4 sigma of 1 - rate.

Prints one JSON line with the max abs errors.
"""

import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sea_tpu.ops.flash_attention import (_dropout_mask_dense,
                                             flash_attention)

    assert jax.default_backend() == "tpu", jax.default_backend()
    B, T, H, hd = 2, 512, 4, 64
    rate = 0.1
    causal, src_len = True, 0
    bq = bk = 256
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, T, H, hd))
    k = jax.random.normal(jax.random.fold_in(key, 2), (B, T, H, hd))
    v = jax.random.normal(jax.random.fold_in(key, 3), (B, T, H, hd))
    g = jax.random.normal(jax.random.fold_in(key, 4), (B, T, H, hd))
    seed = jnp.asarray([123, 456], jnp.int32)

    @jax.jit
    def flash_fwd_bwd(q, k, v, seed):
        f = functools.partial(flash_attention, causal=causal,
                              src_len=src_len, block_q=bq, block_k=bk,
                              dropout_rate=rate, dropout_seed=seed)
        out, vjp = jax.vjp(lambda q, k, v: f(q, k, v), q, k, v)
        return (out,) + vjp(g)

    @jax.jit
    def oracle_fwd_bwd(q, k, v, mask):
        def f(q, k, v):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * hd ** -0.5
            qi = jnp.arange(T)[:, None]
            kj = jnp.arange(T)[None, :]
            s = jnp.where((kj <= qi + src_len)[None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            # mask is [B*H, T, T] -> [B, H, T, T]
            p = p * mask.reshape(B, H, T, T)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                              preferred_element_type=jnp.float32)
        out, vjp = jax.vjp(f, q, k, v)
        return (out,) + vjp(g)

    mask = jax.jit(lambda s: _dropout_mask_dense(
        B * H, T, T, s, rate, block_q=bq, block_k=bk))(seed)

    got = [np.asarray(x) for x in flash_fwd_bwd(q, k, v, seed)]
    ref = [np.asarray(x) for x in oracle_fwd_bwd(q, k, v, mask)]
    errs = {}
    # Tolerance note: on TPU, f32 matmuls run at DEFAULT precision (bf16
    # MXU passes) in BOTH the Pallas kernels and the XLA oracle, but with
    # different roundings — measured ~8e-3 deviation of EACH from a f64
    # host truth at T=512. A wrong/inconsistent dropout mask produces
    # errors O(0.1-1) (a dropped-vs-kept prob changes a whole softmax
    # weight), so 2e-2 cleanly separates the failure mode under test.
    # Exact-math equivalence of the same kernels is asserted on CPU in
    # tests/test_flash_attention.py::test_flash_dropout_matches_oracle.
    for name, a, b in zip(("out", "dq", "dk", "dv"), got, ref):
        errs[name + "_max_abs_err"] = float(np.abs(a - b).max())
        np.testing.assert_allclose(a, b, atol=2e-2, err_msg=name)

    # Determinism / seed-dependence.
    got2 = np.asarray(flash_fwd_bwd(q, k, v, seed)[0])
    assert np.array_equal(got[0], got2), "same seed must be deterministic"
    got3 = np.asarray(flash_fwd_bwd(q, k, v,
                                    jnp.asarray([7, 8], jnp.int32))[0])
    assert not np.array_equal(got[0], got3), "different seed must differ"

    # Keep-rate sanity (binomial 4-sigma band).
    keep = float((np.asarray(mask) > 0).mean())
    n = mask.size
    sigma = (rate * (1 - rate) / n) ** 0.5
    assert abs(keep - (1 - rate)) < 4 * sigma, (keep, 1 - rate, sigma)

    print(json.dumps({"ok": True, "keep_rate": round(keep, 5),
                      "expected_keep": 1 - rate, **{k_: round(v_, 8)
                                                    for k_, v_ in
                                                    errs.items()}}))


if __name__ == "__main__":
    main()
