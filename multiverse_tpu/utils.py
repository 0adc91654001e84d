"""Observability utilities: moving averages, per-step timing, profiler
hooks.

The reference's only observability is print + a FIFO moving average
(reference: code/pred_utils.py:310-331 `FIFO_ME`); it has no tracing or
profiling of any kind (SURVEY.md §5.1).  Here per-step timing and
`jax.profiler` traces are first-class.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


class MovingAverage:
    """Fixed-window moving average (reference: code/pred_utils.py:310-331)."""

    def __init__(self, size: int):
        if size <= 0:
            raise ValueError("size must be positive")
        self._q = deque(maxlen=size)

    def put(self, val) -> None:
        if val is not None:
            self._q.append(float(val))

    def me(self) -> float:
        if not self._q:
            return 0.0
        return sum(self._q) / len(self._q)

    def __repr__(self) -> str:
        return "%.6f" % self.me()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion (compiles)."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._count = 0
        self._total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self._total += dt
        return False

    @property
    def steps_per_sec(self) -> float:
        n = self._count - self.skip_first
        if n <= 0 or self._total == 0.0:
            return 0.0
        return n / self._total

    @property
    def mean_step_ms(self) -> float:
        n = self._count - self.skip_first
        if n <= 0:
            return 0.0
        return self._total / n * 1e3


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """`jax.profiler` trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
