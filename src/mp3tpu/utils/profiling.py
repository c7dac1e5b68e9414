"""Tracing / profiling hooks (SURVEY.md §5.1).

Device-side: jax.profiler traces (XPlane -> TensorBoard/Perfetto) and
per-kernel annotations. Host-side: perf_counter spans feeding Metrics.
All no-ops when profiling is off, so they stay in production code.
"""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def device_trace(logdir: str | None = None):
    """jax.profiler.trace around a region (decode windows, bench runs)."""
    logdir = logdir or os.environ.get("MP3TPU_TRACE_DIR")
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named device annotation (shows up in the trace timeline)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


def fenced(fn, *args, **kw):
    """Run a device function and block until ready — honest host/device
    attribution for benchmarks (SURVEY.md §5.1)."""
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out
