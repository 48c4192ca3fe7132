"""Test harness config: force CPU with 8 virtual devices.

Tests always run on the host platform (fast, deterministic, no tunnel),
with an 8-device virtual mesh so multi-chip sharding paths are exercised
without TPU hardware — the TPU-world substitute for a fake backend
(SURVEY.md §4).  Benchmarks (bench.py) use the real chip instead.
"""

import os

# Must be set before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Parity with the reference's fp32 torch math: keep matmuls in full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.fixture(scope="session")
def small_graph():
    """A small random undirected graph with features and labels."""
    rng = np.random.default_rng(42)
    n, f, c = 80, 24, 4
    dense = (rng.random((n, n)) < 0.08).astype(np.float64)
    dense = np.maximum(dense, dense.T)
    np.fill_diagonal(dense, 0.0)
    # one isolated node to exercise zero-degree handling
    dense[5, :] = 0.0
    dense[:, 5] = 0.0
    adj = sp.csr_matrix(dense)
    features = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    return adj, features, labels
