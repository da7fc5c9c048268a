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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-ops on single-process runs
    where no coordinator is configured (TPU pod environments auto-detect
    all arguments)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        if num_processes not in (None, 1):
            raise
        # Single process / no cluster env: proceed single-host.
        print(f"multihost init skipped ({e}); running single-process")


def is_primary() -> bool:
    return jax.process_index() == 0
