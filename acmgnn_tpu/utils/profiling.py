"""Profiling hooks — capability the reference lacks (SURVEY.md §5: only
wall-clock brackets).  Wraps ``jax.profiler`` traces and step timing."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/acmgnn_trace", enabled: bool = True):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=None):
    """Wall-clock bracket with device sync; appends (label, seconds)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
    else:
        print(f"[timed] {label}: {dt * 1000:.2f} ms")
