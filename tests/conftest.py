"""Test configuration: force CPU JAX with a virtual 8-device mesh.

The session environment pins JAX_PLATFORMS=axon (a tunneled TPU backend) and
something in the stack rewrites the env var to "axon,cpu", so env vars alone
don't stick — we must update jax.config after import. Multi-chip sharding is
validated on 8 virtual host CPU devices (xla_force_host_platform_device_count),
the TPU-world substitute for multi-node testing without a real slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Optional persistent compilation cache (opt-in: SEA_TPU_JAX_CACHE=<dir>).
# The suite is compile-bound on small CI hosts and re-runs go ~3x faster
# with the cache, but jax's CPU AOT loader logs machine-feature-mismatch
# errors on some hosts, so it stays off by default.
if os.environ.get("SEA_TPU_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SEA_TPU_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
