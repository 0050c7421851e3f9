"""Profiling/tracing (the reference has none — SURVEY.md §5; here:
jax.profiler traces viewable in TensorBoard/Perfetto + stage timers)."""

from __future__ import annotations

import contextlib
import os
import time

import jax


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache. On the axon remote-compile
    backend this cuts a repeated flagship-sampler compile from ~260 s to
    ~55 s (measured). Dir override: DSG_COMPILE_CACHE env var."""
    cache_dir = cache_dir or os.environ.get(
        "DSG_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "drivescenegen_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, PermissionError):
        # Read-only HOME / sandbox: run without the cache rather than fail.
        return ""
    return cache_dir


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
