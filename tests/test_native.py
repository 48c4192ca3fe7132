"""Native graphprep library tests (build-on-demand; scipy is the oracle)."""

import numpy as np
import pytest
import scipy.sparse as sp

from acmgnn_tpu.ops import native
from acmgnn_tpu.ops.graph import row_normalized_adjacency


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("native graphprep not built (no g++?)")


def _random_edges(n=200, e=1500, seed=0, with_self=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    if with_self:
        src[:5] = dst[:5]  # ensure some self loops
    return src, dst


def test_build_sym_adjacency_matches_scipy(have_native):
    n = 200
    src, dst = _random_edges(n=n)
    got = native.build_sym_adjacency(src, dst, n)
    a = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    want = ((a + a.T) > 0).astype(np.float64).tocsr()
    assert (got != want).nnz == 0


def test_build_sym_adjacency_drop_self_loops(have_native):
    n = 100
    src, dst = _random_edges(n=n)
    got = native.build_sym_adjacency(src, dst, n, drop_self_loops=True)
    assert got.diagonal().sum() == 0
    a = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    want = ((a + a.T) > 0).astype(np.float64).tolil()
    want.setdiag(0)
    assert (got != want.tocsr()).nnz == 0


def test_lowpass_operator_matches_scipy(have_native, small_graph):
    adj, _, _ = small_graph
    got = native.lowpass_operator(adj)
    want = row_normalized_adjacency(adj)
    diff = np.abs(got - want)
    assert diff.max() < 1e-6


def test_lowpass_with_existing_self_loops(have_native):
    # explicit self-loop: diagonal becomes A_rr + 1 before normalize
    dense = np.array(
        [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]
    )
    adj = sp.csr_matrix(dense)
    got = np.asarray(native.lowpass_operator(adj).todense())
    want = np.asarray(row_normalized_adjacency(adj).todense())
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_csr_transpose_matches_scipy(have_native, small_graph):
    adj, _, _ = small_graph
    mat = row_normalized_adjacency(adj)
    got = native.csr_transpose(mat)
    want = sp.csr_matrix(mat).T.tocsr()
    assert abs(got - want).max() < 1e-7


def test_scipy_fallback_path(small_graph, monkeypatch):
    """With the native lib unavailable everything still works."""
    monkeypatch.setattr(native, "_load", lambda: None)
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    adj = native.build_sym_adjacency(src, dst, 3)
    assert adj.nnz == 6
    lp = native.lowpass_operator(adj)
    np.testing.assert_allclose(
        np.asarray(lp.sum(axis=1)).flatten(), 1.0, atol=1e-12
    )
