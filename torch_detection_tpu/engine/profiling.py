"""Profiling / observability helpers.

The reference has none (SURVEY.md §5 "Tracing/profiling: absent"); here:
``trace`` wraps a scope in a jax.profiler trace (view in TensorBoard/XProf),
``annotate`` tags host spans so input-pipeline time is visible next to
device time, and ``ThroughputMeter`` tracks images/sec (the north-star
metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device+host profile for the enclosed scope."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-span annotation context (shows up on the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Rolling images/sec with warmup skip (first N steps excluded: they
    include compilation)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._steps = 0
        self._images = 0
        self._t0: Optional[float] = None

    def step(self, batch_size: int) -> None:
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._images = 0
        elif self._steps > self.warmup_steps:
            self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._t0)
