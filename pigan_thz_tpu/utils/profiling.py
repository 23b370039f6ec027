"""Profiling: first-class tracing + step timing.

The reference's only observability is wall-clock ETA arithmetic
(train_pigan.py:113,218-223).  Here profiling is structural (SURVEY §5):
- `trace(dir)` wraps a region in a `jax.profiler` trace viewable in
  TensorBoard/XProf (device timelines, HLO cost, HBM usage);
- `StepTimer` measures steady-state steps/s with explicit warmup and
  `block_until_ready` semantics so compile time never pollutes numbers
  (the methodology bench.py uses).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Warmup-aware throughput timer.

    >>> timer = StepTimer(warmup=2)
    >>> for i in range(10):
    ...     out = step(...)
    ...     timer.tick(out)
    >>> timer.steps_per_sec()
    """

    warmup: int = 2
    _count: int = 0
    _t0: float | None = None
    _laps: List[float] = field(default_factory=list)

    def tick(self, result: Any = None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        self._count += 1
        now = time.perf_counter()
        if self._t0 is None:
            # warmup<=1 anchors on the FIRST tick (no pre-step start time
            # exists), so warmup=0 measures from step 2 like warmup=1
            # instead of never starting and returning NaN forever
            if self._count >= max(1, self.warmup):
                self._t0 = now
        else:
            self._laps.append(now)

    def steps_per_sec(self) -> float:
        if not self._laps or self._t0 is None:
            return float("nan")
        return len(self._laps) / (self._laps[-1] - self._t0)

    def mean_step_ms(self) -> float:
        sps = self.steps_per_sec()
        return 1000.0 / sps if sps == sps and sps > 0 else float("nan")


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
