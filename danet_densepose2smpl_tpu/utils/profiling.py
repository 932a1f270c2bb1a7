"""Profiling: tic/toc timers and JAX profiler trace capture.

The reference's aux tooling was a dormant Timer (`utils/timer.py`); here
timing is first-class (per-step wall clock logged with the training
metrics) and `trace` wraps `jax.profiler` so a training window can be
captured for TensorBoard/Perfetto (SURVEY.md §5 tracing note).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Streaming tic/toc with running mean (reference utils/timer.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self._t0 = None
        self.last = 0.0

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        self.last = time.perf_counter() - self._t0
        self.total += self.last
        self.calls += 1
        return self.last

    @property
    def average(self) -> float:
        return self.total / max(self.calls, 1)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
