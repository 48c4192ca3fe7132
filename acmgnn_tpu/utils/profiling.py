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


def sync_devices():
    """Block until every local device has drained its dispatch queue.

    TPU/CPU backends execute programs in dispatch order per device, so
    blocking on a freshly dispatched no-op implies all earlier work on
    that device has completed — the standard benchmark-sync idiom when no
    result array is at hand to ``block_until_ready`` directly."""
    import jax.numpy as jnp

    for dev in jax.local_devices():
        jax.device_put(jnp.zeros((), jnp.int32), dev).block_until_ready()


@contextlib.contextmanager
def timed(label: str, sink=None, sync=True):
    """Wall-clock bracket with device sync; appends (label, seconds).

    ``sync`` drains the device dispatch queues before AND after the body
    (``sync_devices``) — without it an async-dispatched jax call would
    exit the bracket immediately and the bracket would under-report."""
    if sync:
        sync_devices()
    t0 = time.perf_counter()
    yield
    if sync:
        sync_devices()
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
    else:
        print(f"[timed] {label}: {dt * 1000:.2f} ms")
