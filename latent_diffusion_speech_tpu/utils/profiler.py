"""Profiling hooks (the reference has none — SURVEY.md section 5).

`profile_trace` wraps a region with `jax.profiler` tracing for TensorBoard's
trace viewer / xprof; `annotate` adds named trace spans around hot ops.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax

__all__ = ["profile_trace", "annotate"]


@contextlib.contextmanager
def profile_trace(logdir: str | Path, enabled: bool = True):
    if not enabled:
        yield
        return
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation
