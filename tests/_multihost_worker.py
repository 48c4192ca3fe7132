"""Worker for the two-process jax.distributed smoke test
(tests/test_multihost.py).  Each process runs this with
JAX_COORDINATOR/NPROC/PID env vars; asserts the multi-host wiring
(process count, global device view, host-local row ownership, and one
cross-process collective) then prints OK.
"""

import os
import sys

# 2 virtual CPU devices per process -> a 4-device global mesh across hosts
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acmgnn_tpu.parallel.multihost import host_local_rows, init_multihost  # noqa: E402


def main():
    coord = os.environ["TEST_COORDINATOR"]
    nproc = int(os.environ["TEST_NPROC"])
    pid = int(os.environ["TEST_PID"])

    assert init_multihost(coord, nproc, pid) is True
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    devices = jax.devices()  # global view
    assert len(devices) == 2 * nproc, devices
    assert len(jax.local_devices()) == 2

    mesh = jax.sharding.Mesh(np.array(devices), ("rows",))

    # host-local row ownership: 4 partitions over 40 rows, each host owns 2
    boundaries = np.array([0, 10, 20, 30, 40])
    owned = host_local_rows(boundaries, rows_per_part=10, mesh=mesh)
    assert len(owned) == 2, owned
    my_parts = sorted(p for p, _, _, _ in owned)
    expect = [2 * pid, 2 * pid + 1]
    assert my_parts == expect, (my_parts, expect)
    for part, r0, r1, off in owned:
        assert (r0, r1) == (boundaries[part], boundaries[part + 1])
        assert off == part * 10

    # one real cross-process collective through the global mesh
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.array([float(pid)], np.float32)
    )
    np.testing.assert_array_equal(
        np.sort(gathered.flatten()), np.arange(nproc, dtype=np.float32)
    )

    print(f"OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
