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


def shard_node_array_per_host(
    loader, boundaries, rows_per_part, mesh, dtype, trailing_shape=(),
):
    """Row-sharded padded global array, materializing ONLY the rows this
    process's addressable devices own.

    The multi-host counterpart of ``sharded.shard_node_array``: instead
    of building the full [N, ...] array on every host and letting
    ``device_put`` slice it, ``loader(r0, r1)`` is called once per
    ADDRESSABLE partition with that partition's logical row range (the
    ``host_local_rows`` ranges) and may read just that slab from disk /
    mmap — the per-host loading wiki-scale graphs need (a 2M x 600 f32
    feature matrix is ~4.6 GB per full copy).  Built on
    ``jax.make_array_from_callback``, which only invokes the callback
    for shards local to this process.

    Equality with the full-load path is tested
    (tests/test_sharded.py::test_per_host_slab_loading_matches_full).
    """
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    n_parts = len(boundaries) - 1
    global_shape = (n_parts * rows_per_part,) + tuple(trailing_shape)
    spec = P(mesh.axis_names[0]) if not trailing_shape else P(
        mesh.axis_names[0], *([None] * len(trailing_shape))
    )
    sharding = NamedSharding(mesh, spec)

    def callback(index):
        row_slice = index[0]
        start = 0 if row_slice.start is None else int(row_slice.start)
        part = start // rows_per_part
        r0, r1 = int(boundaries[part]), int(boundaries[part + 1])
        block = np.zeros(
            (rows_per_part,) + tuple(trailing_shape), dtype=dtype
        )
        if r1 > r0:
            block[: r1 - r0] = loader(r0, r1)
        return block

    return jax.make_array_from_callback(global_shape, sharding, callback)
