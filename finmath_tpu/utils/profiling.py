"""Profiling / tracing helpers.

The reference's observability is wall-clock bracketing plus FINEST-level
pool statistics (SURVEY.md §5). The TPU-native equivalents are XLA
profiler traces (viewable in TensorBoard/XProf) and named trace annotations
around model phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

from .config import logger


@contextlib.contextmanager
def trace(label: str) -> Iterator[None]:
    """Annotate a region for the JAX profiler AND log its wall time."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(label):
        yield
    logger.info("%s: %.3f s", label, time.perf_counter() - t0)


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device trace into ``log_dir`` (open with
    TensorBoard's profile plugin / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
