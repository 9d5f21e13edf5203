"""Tracing / profiling hooks (the reference has none — SURVEY §5).

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace of a training/decoding region.
- :func:`annotate`: named scope so kernels (selective scan, cross-attention)
  show up labeled in the trace.
- :class:`StepTimer`: robust wall-clock step timing with warm-up skip.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler scope (usable as context manager or decorator)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self._times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    @property
    def best(self) -> float:
        return min(self._times) if self._times else float("nan")
