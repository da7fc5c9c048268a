"""A/B the train-loop data path: host batching vs device-resident gather.

Round 3 made the temporal/spatial drivers upload the train split ONCE and
gather shuffled minibatches on-device (TrainConfig.device_resident_data,
reference has no equivalent — its loop does a per-batch `.to(device)`,
reference train/train_temporal.py:252-258). This tool isolates exactly
that difference on the real chip: the same jitted train step driven N
steps, (a) feeding freshly-transferred host numpy batches per step, and
(b) gathering from resident device arrays by index.

On the tunneled backend a host->device transfer costs RTT + bytes/s, so
(a) also models the dispatch-pipeline stall the resident path removes.
One readback fences each timed loop (block_until_ready returns early on
the tunnel).

Prints one JSON line. Run manually on the chip (serialize TPU use).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["multiphase", "cylinder"],
                    default="multiphase")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--windows", type=int, default=64,
                    help="size of the synthetic train split (windows)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtype", default="bf16_shadow",
                    choices=["f32", "bf16", "bf16_mixed", "bf16_shadow"])
    ap.add_argument("--mu", choices=["f32", "bf16"], default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tools.bench_training import build
    from sea_tpu.data.datasets import batch_index_iterator
    from sea_tpu.models.temporal import init_temporal

    mu = "bfloat16" if args.mu == "bf16" else "float32"
    cfg, step, tx, B, T = build(args.case, "auto", args.dtype,
                                batch=args.batch, mu_dtype=mu)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)

    N = args.windows
    rs = np.random.RandomState(0)
    src_h = rs.randn(N, T, cfg.num_fields, cfg.embed_dim).astype(np.float32)
    tgt_h = rs.randn(N, T, cfg.num_fields, cfg.embed_dim).astype(np.float32)
    ib_h = rs.randn(N, T, cfg.ib_num).astype(np.float32)
    key = jax.random.PRNGKey(1)

    def index_stream(n_steps):
        sels, epoch = [], 1
        while len(sels) < n_steps:
            for sel in batch_index_iterator(N, B, shuffle=True, seed=0,
                                            epoch=epoch,
                                            drop_remainder=True):
                sels.append(sel)
                if len(sels) == n_steps:
                    break
            epoch += 1
        return sels

    @jax.jit
    def _gather(arrays, idx):
        return tuple(jnp.take(a, idx, axis=0) for a in arrays)

    def run_host(p, o, n_steps):
        k = key
        for sel in index_stream(n_steps):
            k, sk = jax.random.split(k)
            src, tgt, ib = (jnp.asarray(src_h[sel]), jnp.asarray(tgt_h[sel]),
                            jnp.asarray(ib_h[sel]))
            p, o, stats = step(p, o, src, tgt, ib, sk)
        float(stats["loss"])  # fence
        return p, o

    resident = None

    def run_resident(p, o, n_steps):
        k = key
        for sel in index_stream(n_steps):
            k, sk = jax.random.split(k)
            src, tgt, ib = _gather(resident, jnp.asarray(sel))
            p, o, stats = step(p, o, src, tgt, ib, sk)
        float(stats["loss"])
        return p, o

    # Warm both programs (compile) before timing either.
    params, opt_state = run_host(params, opt_state, 2)
    resident = (jnp.asarray(src_h), jnp.asarray(tgt_h), jnp.asarray(ib_h))
    params, opt_state = run_resident(params, opt_state, 2)

    t0 = time.perf_counter()
    params, opt_state = run_host(params, opt_state, args.steps)
    host_dt = (time.perf_counter() - t0) / args.steps

    t0 = time.perf_counter()
    params, opt_state = run_resident(params, opt_state, args.steps)
    res_dt = (time.perf_counter() - t0) / args.steps

    sel0 = index_stream(1)[0]
    bytes_per_batch = (src_h[sel0].nbytes + tgt_h[sel0].nbytes
                       + ib_h[sel0].nbytes)
    print(json.dumps({
        "metric": f"{args.case}_train_loop_data_path",
        "dtype": args.dtype, "B": B, "T": T, "steps": args.steps,
        "host_batching_ms_per_step": round(host_dt * 1000, 2),
        "device_resident_ms_per_step": round(res_dt * 1000, 2),
        "speedup": round(host_dt / res_dt, 3),
        "h2d_mb_per_step_removed": round(bytes_per_batch / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
