"""Profiling/tracing (the reference has none — SURVEY.md §5; here:
jax.profiler traces viewable in TensorBoard/Perfetto + stage timers)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a device trace for the enclosed block when log_dir is set."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Wall-clock block timer: with Timer() as t: ...; t.seconds"""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False
