"""Trace-time kernel-dispatch policy shared by the Pallas attention paths.

Pallas calls have no GSPMD partitioning rule: inside a multi-device
GSPMD-jitted program, XLA either replicates the kernel's operands
(all-gathering sharded q/k/v or KV caches every call) or rejects the
custom call outright — both wrong for a pod. Inside ``shard_map`` the
kernel sees local shards and is the intended pattern (ring attention,
pipeline stages). The GSPMD step constructors in parallel/train_step.py
therefore trace their bodies under ``attention_kernels_disabled`` when
the mesh spans more than one device; `flash_supported` /
`decode_supported` consult the flag.

Thread-local because tracing can happen on any thread; the flag only
matters during trace (dispatch decisions are Python-level), so nothing
is carried into the compiled program.
"""

from __future__ import annotations

import contextlib
import threading

_state = threading.local()


def attention_kernels_allowed() -> bool:
    return not getattr(_state, "disabled", False)


@contextlib.contextmanager
def attention_kernels_disabled(active: bool = True):
    """Disable Pallas attention-kernel dispatch while tracing under this
    context (no-op when ``active`` is False, so call sites can pass
    ``mesh.size > 1`` directly)."""
    prev = getattr(_state, "disabled", False)
    _state.disabled = prev or active
    try:
        yield
    finally:
        _state.disabled = prev
