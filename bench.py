"""Headline benchmark: north-star 250-step multiphase autoregressive rollout.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- value: rollout steps/sec/chip of the scan+KV-cache engine on the default
  JAX device (the driver runs this on a real TPU chip).
- vs_baseline: value / (reference steps/sec from BASELINE_MEASURED.json,
  the PyTorch reference's prefix-recompute rollout measured on this
  machine's CPU — the reference targets CUDA, unavailable here; see
  BASELINE.md). North-star target is >=10x.

Model: multiphase-flow temporal SEA at full size (E=2048, 1 layer, 8 heads,
down_dim=1024, plain LN), batch 1, 250 steps — matching the reference
measurement protocol in tools/measure_reference.py.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

STEPS = 250
BATCH = 1
REPEATS = 5
# SEA_BENCH_DTYPE=bf16 runs with bf16 matmul weights (1544 vs 878 steps/s
# measured on v5e, ~1.6% latent deviation over 250 steps on random weights);
# default f32 keeps the headline number quantization-free.
DTYPE = os.environ.get("SEA_BENCH_DTYPE", "float32")


def main():
    from sea_tpu.configs.multiphase_flow import get_case
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.rollout.engine import rollout_scan

    # The actual multiphase preset — the bench measures what users run.
    cfg = get_case().temporal

    params = init_temporal(jax.random.PRNGKey(0), cfg)
    if DTYPE == "bf16":
        from sea_tpu.utils.precision import cast_weights_bf16
        params = cast_weights_bf16(params)
    key = jax.random.PRNGKey(1)
    # Distinct inputs per repeat: the tunneled TPU backend caches identical
    # dispatches, which would make repeated identical calls measure ~0.
    x0s = [jax.random.normal(jax.random.fold_in(key, i),
                             (BATCH, cfg.num_fields, cfg.embed_dim))
           for i in range(REPEATS + 1)]
    ibs = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                             (BATCH, STEPS, cfg.ib_num))
           for i in range(REPEATS + 1)]

    # All repeats inside ONE jit dispatch (lax.map over stacked inputs)
    # with a single scalar readback: per-dispatch tunnel RTT would
    # otherwise pollute the timing, and on the tunneled backend
    # block_until_ready alone has been observed to return early.
    @jax.jit
    def run_many(p, x0_stack, ib_stack):
        outs = jax.lax.map(lambda xi: rollout_scan(p, cfg, xi[0], xi[1]),
                           (x0_stack, ib_stack))
        return jnp.stack([o.sum() for o in [outs]])[0].sum()

    # Warm and timed calls use DIFFERENT input stacks: the tunneled
    # backend caches identical dispatches.
    warm_stack = (jnp.stack(x0s[1:]), jnp.stack(ibs[1:]))
    timed_stack = (jnp.stack(x0s[:REPEATS]), jnp.stack(ibs[:REPEATS]))
    sink = float(run_many(params, *warm_stack))  # compile + warm
    t0 = time.perf_counter()
    sink = float(run_many(params, *timed_stack))
    elapsed = time.perf_counter() - t0
    assert sink == sink, "rollout produced NaNs"
    steps_per_sec = STEPS * REPEATS / elapsed

    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            baseline = json.load(fh)
        ref = baseline.get("multiphase_250step_steps_per_sec")
        if ref:
            vs_baseline = steps_per_sec / ref

    print(json.dumps({
        "metric": "multiphase_250step_rollout_steps_per_sec"
                  + ("_bf16w" if DTYPE == "bf16" else ""),
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
