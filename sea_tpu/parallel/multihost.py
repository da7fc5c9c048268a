"""Multi-host (multi-slice) initialization.

The reference is single-process (SURVEY §2.10). For TPU pods/multi-slice:
call ``initialize_multihost()`` once at program start on every host before
any jax call; ``make_mesh`` (parallel/mesh.py) then spans all processes'
devices — ICI within a slice, DCN across slices. Shardings and train steps
need no changes (single-program SPMD).

Checkpointing note: training drivers save from process 0 only (guarded by
``is_primary()``); params are replicated across the mesh so any process
holds the full state for its addressable shards.
"""

from __future__ import annotations

from typing import Optional

import jax


_CLUSTER_ENV_VARS = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                     "MEGASCALE_COORDINATOR_ADDRESS")


def _cluster_env_present() -> bool:
    import os
    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        return True
    # TPU_WORKER_HOSTNAMES exists even on single-host TPU VMs; it only
    # indicates a pod when it lists more than one host.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-ops on single-process runs
    where no coordinator is configured (TPU pod environments auto-detect
    all arguments).

    Failures are only swallowed when nothing indicates a real cluster
    (no explicit args, no coordinator env vars) — a transient init failure
    on an actual pod must fail loudly, not silently split training into N
    independent single-process jobs all claiming to be primary."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        explicit = any(a is not None for a in (coordinator_address,
                                               num_processes, process_id))
        if explicit or _cluster_env_present():
            raise
        print(f"multihost init skipped ({e}); running single-process")


def is_primary() -> bool:
    return jax.process_index() == 0
