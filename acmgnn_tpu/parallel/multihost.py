"""Multi-host runtime support.

The reference is strictly single-process/single-GPU (SURVEY.md §2.9b).
On a multi-host TPU slice this framework runs SPMD: every host calls
``init_multihost()`` once, builds the same global mesh, and loads/places
only its addressable shard of the row-partitioned node arrays (the
sharding layer in ``acmgnn_tpu/parallel/sharded.py`` is already
global-view, so training code is identical on 1 or N hosts).

This module is necessarily exercised only single-host in this
environment; the logic mirrors the standard jax.distributed recipe.
"""

from __future__ import annotations

import jax


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the JAX distributed runtime (no-op when single-process
    env vars are absent and no coordinator is given)."""
    if coordinator_address is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ and (
            "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ
        ):
            return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_rows(boundaries, rows_per_part, mesh):
    """Row ranges of the graph partition owned by THIS host's devices.

    Per-host data loading: each host reads only these row slices of the
    feature matrix / labels instead of the full arrays (matters for
    wiki-scale graphs).
    """
    local = set(d.id for d in jax.local_devices())
    out = []
    for i, dev in enumerate(mesh.devices.flatten()):
        if dev.id in local:
            r0 = int(boundaries[i])
            r1 = int(boundaries[i + 1])
            out.append((i, r0, r1, i * rows_per_part))
    return out
