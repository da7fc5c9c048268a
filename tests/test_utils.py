"""Utility coverage: profiling timer, multihost no-op init, precision."""

import jax
import jax.numpy as jnp
import numpy as np


def test_step_timer():
    import time
    from sea_tpu.utils.profiling import StepTimer
    t = StepTimer(skip=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0.005
    assert s["steps_per_sec"] > 0


def test_trace_writes_profile(tmp_path):
    from sea_tpu.utils.profiling import annotate, trace
    with trace(str(tmp_path)):
        with annotate("mul"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os
    found = any("plugins" in root or f.endswith((".pb", ".json.gz", ".xplane.pb"))
                for root, _, fs in os.walk(tmp_path) for f in fs)
    assert found, "no trace artifacts written"


def test_multihost_single_process_noop():
    from sea_tpu.parallel.multihost import initialize_multihost, is_primary
    initialize_multihost()  # must not raise single-process
    assert is_primary()


def test_cast_weights_bf16_selectivity():
    from sea_tpu.utils.precision import cast_weights_bf16
    tree = {"big": jnp.zeros((512, 512)), "small": jnp.zeros((4, 4)),
            "bias": jnp.zeros((512,)), "idx": jnp.zeros((512, 512), jnp.int32)}
    out = cast_weights_bf16(tree)
    assert out["big"].dtype == jnp.bfloat16
    assert out["small"].dtype == jnp.float32
    assert out["bias"].dtype == jnp.float32
    assert out["idx"].dtype == jnp.int32
