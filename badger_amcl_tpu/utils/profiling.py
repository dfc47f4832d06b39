"""Tracing and per-phase timing.

The reference has no profiling at all — observability of slow phases is
ROS_INFO bracketing logs (SURVEY.md §5). Here both are first-class:

- `PhaseTimer`: lightweight named wall-clock accumulators around host-side
  phases (scan prep, device step, publication). `report()` gives per-phase
  mean/max/total.
- `trace()`: context manager around `jax.profiler` emitting a TensorBoard
  trace of device execution.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class PhaseTimer:
    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._maxs: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._sums[name] += dt
            self._counts[name] += 1
            if dt > self._maxs[name]:
                self._maxs[name] = dt

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": self._counts[name],
                "total_s": self._sums[name],
                "mean_ms": 1e3 * self._sums[name] / max(self._counts[name], 1),
                "max_ms": 1e3 * self._maxs[name],
            }
            for name in self._sums
        }

    def reset(self) -> None:
        self._sums.clear()
        self._maxs.clear()
        self._counts.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
