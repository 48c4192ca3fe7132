"""Two-process jax.distributed smoke test (VERDICT r1 item #9).

``init_multihost`` + ``host_local_rows`` had only been reviewed, never
executed multi-process.  This spawns TWO real Python processes on the CPU
backend (2 virtual devices each -> a 4-device global mesh), initializes
the distributed runtime against a local coordinator, checks the global
device view, per-host partition ownership, and one cross-process
allgather.  The TPU-pod recipe is identical modulo the platform.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # the workers force their own platform/device-count flags
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            TEST_COORDINATOR=f"127.0.0.1:{port}",
            TEST_NPROC="2",
            TEST_PID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK pid={pid}" in out, out


def _run_workers(nproc, ndev, mode, timeout=420):
    """Spawn ``nproc`` worker processes (ndev virtual devices each) and
    return their stdouts after asserting clean exits."""
    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    procs = []
    for pid in range(nproc):
        env = dict(
            env_base,
            TEST_COORDINATOR=f"127.0.0.1:{port}",
            TEST_NPROC=str(nproc),
            TEST_PID=str(pid),
            TEST_NDEV=str(ndev),
            TEST_MODE=mode,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK pid={pid}" in out, out
    return outs


def _parse_result(out):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            kv = dict(tok.split("=", 1) for tok in line.split()[1:])
            return {
                "devices": int(kv["devices"]),
                "test": float(kv["test"]),
                "splits": [float(v) for v in kv["splits"].split(",")],
            }
    raise AssertionError(f"no RESULT line in:\n{out}")


def test_two_process_sharded_training_end_to_end():
    """The full multi-host recipe, EXECUTED (VERDICT r3 item #7): two
    real processes x 2 virtual devices drive ``run_experiment_sharded``
    at the headline config (ELL + bf16 + joint + hoist) with per-host
    slab loading, and the result matches a single-process run over the
    same 4-device global mesh."""
    golden = _parse_result(_run_workers(1, 4, "train")[0])
    outs = _run_workers(2, 2, "train")
    res = [_parse_result(o) for o in outs]
    assert golden["devices"] == 4
    for r in res:
        assert r["devices"] == 4
    # both processes of one SPMD run must agree exactly
    assert res[0] == res[1], res
    # and the 2-process run must reproduce the single-process result
    # (same global mesh/program; tolerance covers any cross-process
    # collective reduction-order drift)
    np.testing.assert_allclose(
        res[0]["splits"], golden["splits"], atol=1e-5
    )
    # sanity: the toy task is learnable
    assert golden["test"] > 0.7, golden


def test_init_multihost_noop_single_process():
    """Without coordinator args or env markers it must not touch
    jax.distributed (returns False)."""
    from acmgnn_tpu.parallel.multihost import init_multihost

    saved = {
        k: os.environ.pop(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
        if k in os.environ
    }
    try:
        assert init_multihost() is False
    finally:
        os.environ.update(saved)
