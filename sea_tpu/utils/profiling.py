"""Tracing and per-step timing.

The reference has no profiling beyond coarse wall-clock totals
(train_encoder.py:310-312; SURVEY §5.1). TPU-native observability:
- ``trace(logdir)``: context manager around jax.profiler for Perfetto/
  TensorBoard traces of compiled programs.
- ``StepTimer``: per-step wall-clock with compile-step exclusion and
  steps/sec summaries, for the training drivers and benchmarks.
- ``annotate``: named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per step; the first ``skip`` steps (compile) are excluded
    from the steady-state summary."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def steady(self) -> List[float]:
        return self.times[self.skip:] if len(self.times) > self.skip \
            else self.times

    def summary(self) -> Dict[str, float]:
        st = self.steady
        if not st:
            return {"steps": 0}
        total = sum(st)
        return {"steps": len(st), "mean_s": total / len(st),
                "steps_per_sec": len(st) / total,
                "first_step_s": self.times[0] if self.times else 0.0}
