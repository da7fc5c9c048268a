"""Flash-attention kernel bench vs the XLA path on the real chip.

Shapes: [2, 2048, 8, 128] causal (the VERDICT target shape). Respects the
tunnel quirks: distinct inputs per repeat, all repeats inside one jitted
lax.map dispatch, single scalar readback.

Prints one JSON line with fwd and fwd+bwd times for pallas vs XLA, plus
the dropout-enabled pallas numbers (in-kernel mask).
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

B, T, H, HD = 2, 2048, 8, 128
REPEATS = 8


def timeit(fn, stacks):
    @jax.jit
    def run_many(qs, ks, vs, gs):
        return jax.lax.map(lambda x: fn(*x), (qs, ks, vs, gs)).sum()

    warm = tuple(s[1:] for s in stacks)
    timed = tuple(s[:REPEATS] for s in stacks)
    float(run_many(*warm))
    t0 = time.perf_counter()
    float(run_many(*timed))
    return (time.perf_counter() - t0) / REPEATS * 1e3  # ms


def main():
    from sea_tpu.ops.flash_attention import flash_attention, _xla_attention

    key = jax.random.PRNGKey(0)
    mk = lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                     (REPEATS + 1, B, T, H, HD))
    stacks = (mk(1), mk(2), mk(3), mk(4))
    seed = jnp.asarray([3, 5], jnp.int32)

    flash = functools.partial(flash_attention, causal=True, src_len=0)
    flash_do = functools.partial(flash_attention, causal=True, src_len=0,
                                 dropout_rate=0.1, dropout_seed=seed)
    xla = functools.partial(_xla_attention, causal=True, src_len=0)

    def fwd(f):
        return lambda q, k, v, g: f(q, k, v).sum()

    def fwdbwd(f):
        def run(q, k, v, g):
            out, vjp = jax.vjp(lambda q, k, v: f(q, k, v), q, k, v)
            return sum(x.sum() for x in vjp(g))
        return run

    res = {
        "shape": [B, T, H, HD],
        "pallas_fwd_ms": round(timeit(fwd(flash), stacks), 3),
        "xla_fwd_ms": round(timeit(fwd(xla), stacks), 3),
        "pallas_fwdbwd_ms": round(timeit(fwdbwd(flash), stacks), 3),
        "xla_fwdbwd_ms": round(timeit(fwdbwd(xla), stacks), 3),
        "pallas_dropout_fwdbwd_ms": round(timeit(fwdbwd(flash_do), stacks),
                                          3),
    }
    res["fwd_speedup"] = round(res["xla_fwd_ms"] / res["pallas_fwd_ms"], 2)
    res["fwdbwd_speedup"] = round(res["xla_fwdbwd_ms"]
                                  / res["pallas_fwdbwd_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
