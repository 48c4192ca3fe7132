"""Operator precompute + SpMM kernel tests (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from acmgnn_tpu.ops.graph import (
    high_pass,
    k_hop,
    make_coo_op,
    make_dense_op,
    precompute_operators,
    row_normalize,
    row_normalized_adjacency,
    sym_normalized_adjacency,
)
from acmgnn_tpu.ops.spmm import spmm, spmm_high


def test_row_normalized_adjacency_rowsums(small_graph):
    adj, _, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    rowsums = np.asarray(a_hat.sum(axis=1)).flatten()
    # With the added self-loop every row sums to exactly 1.
    np.testing.assert_allclose(rowsums, 1.0, atol=1e-12)


def test_row_normalize_zero_rows():
    mat = sp.csr_matrix(np.array([[0.0, 0.0], [1.0, 3.0]]))
    out = row_normalize(mat).todense()
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0], [0.25, 0.75]])


def test_sym_normalized_adjacency(small_graph):
    adj, _, _ = small_graph
    a_sym = sym_normalized_adjacency(adj)
    # symmetric input + self-loops => symmetric operator
    diff = np.abs((a_sym - a_sym.T)).max()
    assert diff < 1e-12
    # eigenvalues of D^-1/2 (A+I) D^-1/2 lie in [-1, 1+eps]
    eigs = np.linalg.eigvalsh(np.asarray(a_sym.todense()))
    assert eigs.max() <= 1.0 + 1e-8


def test_high_pass_identity(small_graph):
    adj, _, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    hp = high_pass(a_hat)
    np.testing.assert_allclose(
        np.asarray((hp + a_hat).todense()),
        np.eye(adj.shape[0]),
        atol=1e-12,
    )


def test_k_hop_matches_matrix_power(small_graph):
    adj, _, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    a3 = k_hop(a_hat, 3)
    expected = np.linalg.matrix_power(np.asarray(a_hat.todense()), 3)
    np.testing.assert_allclose(np.asarray(a3.todense()), expected, atol=1e-10)


@pytest.mark.parametrize("make_op", [make_dense_op, make_coo_op])
def test_spmm_matches_dense(small_graph, make_op):
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op = make_op(a_hat)
    x = jnp.asarray(features)
    got = np.asarray(spmm(op, x))
    want = np.asarray(a_hat.todense()) @ features
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("make_op", [make_dense_op, make_coo_op])
def test_spmm_high_matches_explicit(small_graph, make_op):
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op = make_op(a_hat)
    x = jnp.asarray(features)
    got = np.asarray(spmm_high(op, x))
    want = np.asarray(high_pass(a_hat).todense()) @ features
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("make_op", [make_dense_op, make_coo_op])
def test_spmm_gradient(small_graph, make_op):
    """Backward must be A^T g (transpose SpMM) — checked against dense."""
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op = make_op(a_hat)
    x = jnp.asarray(features)
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(features.shape[1],)).astype(np.float32)
    )

    def loss(x_):
        return jnp.sum(spmm(op, x_) * w[None, :] ** 2)

    got = np.asarray(jax.grad(loss)(x))
    dense = np.asarray(a_hat.todense())
    want = dense.T @ np.broadcast_to(
        np.asarray(w) ** 2, features.shape
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_coo_padding_is_inert(small_graph):
    """Padded nnz slots (row = N sentinel, val = 0) must not change results."""
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op_tight = make_coo_op(a_hat, pad_multiple=1)
    op_padded = make_coo_op(a_hat, pad_multiple=4096)
    assert op_padded.row.shape[0] == 4096
    x = jnp.asarray(features)
    np.testing.assert_allclose(
        np.asarray(spmm(op_tight, x)), np.asarray(spmm(op_padded, x)), atol=1e-6
    )


def test_precompute_operators_auto_format(small_graph):
    adj, _, _ = small_graph
    ops_dense = precompute_operators(adj, fmt="auto", dense_threshold=1000)
    ops_ell = precompute_operators(adj, fmt="auto", dense_threshold=10)
    assert type(ops_dense.adj_low).__name__ == "DenseOp"
    assert type(ops_ell.adj_low).__name__ == "EllOp"


def _powerlaw_matrix(n=300, seed=3):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < 0.03).astype(np.float64)
    dense[0, :] = 1.0          # hub row
    dense[1, : n // 2] = 1.0
    dense[7, :] = 0.0          # zero row
    dense[:, 9] = 0.0          # zero column (tests transpose bucketing)
    return sp.csr_matrix(dense * rng.random((n, n)))


def test_ell_spmm_matches_dense_powerlaw():
    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op

    mat = _powerlaw_matrix()
    op = make_ell_op(mat, kc=4, min_bucket_rows=16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(mat.shape[0], 20)).astype(np.float32)
    )
    got = np.asarray(ell_spmm(op, x))
    want = np.asarray(mat.todense()).astype(np.float32) @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ell_spmm_gradient_powerlaw():
    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op

    mat = _powerlaw_matrix()
    op = make_ell_op(mat, kc=4, min_bucket_rows=16)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(mat.shape[0], 20)).astype(np.float32)
    )

    def loss(x_):
        return jnp.sum(jnp.sin(ell_spmm(op, x_)))

    got = np.asarray(jax.grad(loss)(x))
    dense = jnp.asarray(np.asarray(mat.todense()).astype(np.float32))

    def loss_ref(x_):
        return jnp.sum(jnp.sin(dense @ x_))

    want = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ell_spmm_under_jit_and_model(small_graph):
    """EllOp must work as the operator inside a jitted model forward."""
    from acmgnn_tpu.models.models import ACMGNN

    adj, features, _ = small_graph
    ops = precompute_operators(adj, fmt="ell")
    model = ACMGNN(nhid=8, nclass=3, model_type="acmgcn", dropout=0.0)
    x = jnp.asarray(features)
    params = model.init(jax.random.key(0), x, ops)
    out = jax.jit(lambda p, x_: model.apply(p, x_, ops))(params, x)
    assert out.shape == (adj.shape[0], 3)

    ops_dense = precompute_operators(adj, fmt="dense")
    out_dense = model.apply(params, x, ops_dense)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_dense), rtol=1e-4, atol=1e-5
    )


def test_precompute_hops_keeps_1hop_high_pass(small_graph):
    """acmsgc quirk: adj_low = A_hat^k but high-pass stays I - A_hat
    (/root/reference/ACM-Pytorch/utils.py:626-637)."""
    adj, features, _ = small_graph
    ops = precompute_operators(adj, hops=3, fmt="dense")
    a_hat = row_normalized_adjacency(adj)
    x = jnp.asarray(features)
    want_low = np.linalg.matrix_power(np.asarray(a_hat.todense()), 3) @ features
    want_high = np.asarray(high_pass(a_hat).todense()) @ features
    np.testing.assert_allclose(
        np.asarray(spmm(ops.adj_low, x)), want_low, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(spmm_high(ops.adj_hp, x)), want_high, rtol=1e-4, atol=1e-5
    )


def test_operators_pytree_roundtrip(small_graph):
    """Operators must be a jit-able pytree (static metadata preserved)."""
    adj, features, _ = small_graph
    ops = precompute_operators(adj, fmt="coo")
    x = jnp.asarray(features)

    @jax.jit
    def f(ops_, x_):
        return spmm(ops_.adj_low, x_) + spmm_high(ops_.adj_hp, x_)

    out = f(ops, x)
    assert out.shape == features.shape


def test_ell_hub_hybrid_matches_dense():
    """Dense-row hub hybrid: rows with degree >= threshold ride an MXU
    matmul block; forward and gradient must match the dense reference
    exactly (hub extraction only re-routes rows, never changes math)."""
    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op

    mat = _powerlaw_matrix().tolil()
    mat[:, 3] = 0.5  # hub column -> hub row of the transpose half
    mat = mat.tocsr()
    op = make_ell_op(mat, kc=4, min_bucket_rows=16, hub_threshold=100)
    # both halves must have engaged the hub block (row 0 is a full row;
    # column 3 is a full column = hub row of the transpose)
    assert op.fwd.hub_mat is not None and op.fwd.hub_mat.shape[0] >= 1
    assert op.bwd.hub_mat is not None
    # hub_nnz bookkeeping (the roofline excludes hub-resident entries
    # from descriptor counts): must equal the nnz of the extracted rows
    deg = np.diff(mat.indptr)
    n_hub = op.fwd.hub_mat.shape[0]
    expect = int(np.sort(deg)[::-1][:n_hub].sum())
    assert op.fwd.hub_nnz == expect, (op.fwd.hub_nnz, expect)
    degT = np.diff(mat.T.tocsr().indptr)
    n_hub_t = op.bwd.hub_mat.shape[0]
    assert op.bwd.hub_nnz == int(np.sort(degT)[::-1][:n_hub_t].sum())

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(mat.shape[0], 20)).astype(np.float32)
    )
    got = np.asarray(ell_spmm(op, x))
    want = np.asarray(mat.todense()).astype(np.float32) @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss(x_):
        return jnp.sum(jnp.sin(ell_spmm(op, x_)))

    dense = jnp.asarray(np.asarray(mat.todense()).astype(np.float32))

    def loss_ref(x_):
        return jnp.sum(jnp.sin(dense @ x_))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_ell_hub_all_rows_dense():
    """Degenerate case: threshold 1 puts every nonzero row in the hub."""
    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op

    mat = _powerlaw_matrix(n=60)
    op = make_ell_op(mat, kc=4, min_bucket_rows=4, hub_threshold=1)
    assert len(op.fwd.buckets) == 0
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(mat.shape[0], 8)).astype(np.float32)
    )
    got = np.asarray(ell_spmm(op, x))
    want = np.asarray(mat.todense()).astype(np.float32) @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _banded_matrix(n=400, halfwidth=10, per_row=6, seed=5):
    """Column-local graph: neighbors within a +-halfwidth band (the
    post-RCM shape the block-column layout targets)."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        js = np.clip(i + rng.integers(-halfwidth, halfwidth + 1, per_row),
                     0, n - 1)
        rows.extend([i] * per_row)
        cols.extend(js.tolist())
    mat = sp.csr_matrix(
        (rng.random(len(rows)).astype(np.float32), (rows, cols)),
        shape=(n, n),
    )
    mat.sum_duplicates()
    return mat


def test_ell_block_column_matches_dense():
    """Forced block-column layout == dense math on banded, random and
    power-law (hub-carrying) matrices, fwd + VJP."""
    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op

    cases = [
        (_banded_matrix(), dict(block=8)),
        (_banded_matrix(), dict(block=16, hub_threshold=1_000_000)),
        (_powerlaw_matrix(), dict(block=8, kc=4, min_bucket_rows=16)),
        (_powerlaw_matrix(), dict(block=4, hub_threshold=32)),
    ]
    for mat, kw in cases:
        op = make_ell_op(mat, **kw)
        blk = max(
            (b.block for h in (op.fwd, op.bwd) for b in h.buckets),
            default=1,
        )
        assert blk == kw["block"], kw
        x = jnp.asarray(
            np.random.default_rng(0)
            .normal(size=(mat.shape[0], 20))
            .astype(np.float32)
        )
        dense = jnp.asarray(np.asarray(mat.todense()).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ell_spmm(op, x)),
            np.asarray(dense @ x),
            rtol=2e-4,
            atol=1e-4,
        )

        def loss(x_, op=op):
            return jnp.sum(jnp.sin(ell_spmm(op, x_)))

        def loss_ref(x_, dense=dense):
            return jnp.sum(jnp.sin(dense @ x_))

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss)(x)),
            np.asarray(jax.grad(loss_ref)(x)),
            rtol=2e-4,
            atol=1e-4,
        )


def test_ell_block_auto_selection():
    """Occupancy auto (-1): block on for high-occupancy (banded)
    operators, off for uniform-random ones; the DEFAULT is plain ELL
    (block measured slower on the current backend — PERF.md)."""
    from acmgnn_tpu.ops.ell import block_occupancy, make_ell_op

    banded = _banded_matrix(n=600, halfwidth=4, per_row=12)
    assert block_occupancy(banded, 8) >= 3.0
    op = make_ell_op(banded, block=-1)
    assert all(b.block == 8 for b in op.fwd.buckets)
    op = make_ell_op(banded)  # default: off
    assert all(b.block == 1 for b in op.fwd.buckets)

    rnd = sp.random(600, 600, density=0.01, random_state=3, format="csr")
    assert block_occupancy(sp.csr_matrix(rnd), 8) < 1.5
    op = make_ell_op(sp.csr_matrix(rnd.astype(np.float32)), block=-1)
    assert all(b.block == 1 for b in op.fwd.buckets)


def test_ell_block_under_jit_and_model(small_graph):
    """Block-column operators must ride through the jitted model."""
    from acmgnn_tpu.models.models import ACMGNN
    from acmgnn_tpu.ops.graph import precompute_operators

    adj, features, _ = small_graph
    ops = precompute_operators(adj, fmt="ell", ell_block=4)
    ops_ref = precompute_operators(adj, fmt="dense")
    x = jnp.asarray(features)
    model = ACMGNN(nhid=8, nclass=3, model_type="acmgcn", dropout=0.0)
    variables = model.init(jax.random.key(0), x, ops)
    out = jax.jit(lambda v, x_: model.apply(v, x_, ops))(variables, x)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(model.apply(variables, x, ops_ref)),
        rtol=2e-4,
        atol=1e-4,
    )


def test_ell_packed_wide_bf16_gather_matches_unpacked():
    """The >128-column bf16 bit-packing path (two bf16 lanes per int32
    gather column, ops/ell.py) is a pure reinterpretation: results must
    match the unpacked bf16 path to f32-accumulation-order noise, for
    both forward and the custom-VJP backward, with and without a hub.
    The knob is a static op-build-time field (EllOp.pack), not a
    trace-time env read (ADVICE r1: env toggles after first trace were
    silently ignored by the jit cache)."""
    from acmgnn_tpu.ops.ell import make_ell_op, ell_spmm

    rng = np.random.default_rng(0)
    n = 1500
    a = sp.random(n, n, density=0.004, random_state=1, format="csr")
    a = sp.csr_matrix(a)
    a[0, :1200] = 1.0  # hub row (dense-hybrid path rides along)
    a = sp.csr_matrix(a)
    x = jnp.asarray(rng.normal(size=(n, 256)).astype(np.float32))

    def run(op, xin):
        f = jax.jit(lambda x_: ell_spmm(op, x_))
        g = jax.jit(jax.grad(lambda x_: jnp.sum(ell_spmm(op, x_) ** 2)))
        return np.asarray(f(xin)), np.asarray(g(xin))

    op0 = make_ell_op(a, gather_dtype=jnp.bfloat16, hub_threshold=1024,
                      pack=False)
    op1 = make_ell_op(a, gather_dtype=jnp.bfloat16, hub_threshold=1024,
                      pack=True)
    y0, g0 = run(op0, x)
    y1, g1 = run(op1, x)
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g1, g0, rtol=1e-4, atol=1e-3)
    # narrow operands bypass packing entirely — and must match the
    # unpacked path in VALUE, not just shape (ADVICE r1)
    xn = x[:, :64]
    yn1, gn1 = run(op1, xn)
    yn0, gn0 = run(op0, xn)
    np.testing.assert_allclose(yn1, yn0, rtol=0, atol=0)
    np.testing.assert_allclose(gn1, gn0, rtol=0, atol=0)
    # operands whose PACKED view would still cross the 128-column cliff
    # (> 256 bf16 columns) also bypass — value-checked against unpacked
    xw = jnp.concatenate([x, x[:, :64]], axis=1)  # 320 columns
    yw1, _ = run(op1, xw)
    yw0, _ = run(op0, xw)
    np.testing.assert_allclose(yw1, yw0, rtol=0, atol=0)


def test_ell_value_free_uniform_rows():
    """Row-uniform operators drop their value planes: the forward half
    post-scales rows, the transpose half pre-scales the operand over the
    binary structure (hub rows binarized); self-loop graphs (diagonal 2
    after A+I) fall back to valued planes bit-exactly."""
    import scipy.sparse as sp

    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op
    from acmgnn_tpu.ops.graph import row_normalized_adjacency

    rng = np.random.default_rng(0)
    n = 800
    a = sp.random(n, n, density=0.01, random_state=1, format="csr")
    a.data[:] = 1.0
    a = ((a + a.T) > 0).astype(np.float64).tolil()
    a.setdiag(0)
    a = a.tocsr()
    a.eliminate_zeros()
    ah = row_normalized_adjacency(a)
    x = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))

    op = make_ell_op(ah, kc=4, min_bucket_rows=16, hub_threshold=20)
    assert op.fwd.row_scale is not None and op.fwd.pre_scale is None
    assert op.bwd.pre_scale is not None and op.bwd.row_scale is None
    assert all(b.vals is None for b in op.fwd.buckets + op.bwd.buckets)

    dense = jnp.asarray(np.asarray(ah.todense(), np.float32))
    np.testing.assert_allclose(
        np.asarray(ell_spmm(op, x)), np.asarray(dense @ x),
        rtol=1e-4, atol=1e-5,
    )
    g = jax.grad(lambda x_: jnp.sum(jnp.sin(ell_spmm(op, x_))))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.sin(dense @ x_)))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )

    # a single self-loop makes one row non-uniform -> valued fallback
    a2 = a.tolil()
    a2[5, 5] = 1.0
    ah2 = row_normalized_adjacency(a2.tocsr())
    op2 = make_ell_op(ah2)
    assert op2.fwd.row_scale is None and op2.bwd.pre_scale is None
    np.testing.assert_allclose(
        np.asarray(ell_spmm(op2, x)),
        np.asarray(ah2.todense(), np.float32) @ np.asarray(x),
        rtol=1e-4, atol=1e-5,
    )


def test_ell_transpose_plane_sharing(monkeypatch):
    """Symmetric-structure value-free operators share the transpose's
    index planes with the forward half by REFERENCE (VERDICT r4 item #6:
    the bwd half no longer builds its own bucketing — halving the
    operator's index-plane memory), bit-identically to an unshared
    build; fully symmetric matrices (binary structure operator) share
    the whole half; asymmetric (directed) operators keep their own
    transpose build and stay correct."""
    import scipy.sparse as sp

    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op
    from acmgnn_tpu.ops.graph import row_normalized_adjacency

    rng = np.random.default_rng(3)
    n = 600
    a = sp.random(n, n, density=0.012, random_state=7, format="csr")
    a.data[:] = 1.0
    a = ((a + a.T) > 0).astype(np.float64).tolil()
    a.setdiag(0)
    a = a.tocsr()
    a.eliminate_zeros()
    ah = row_normalized_adjacency(a)
    x = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    dense = np.asarray(ah.todense(), np.float32)

    op = make_ell_op(ah, kc=4, min_bucket_rows=16, hub_threshold=24)
    # shared by reference: same jnp buffers, not copies
    assert len(op.bwd.buckets) == len(op.fwd.buckets)
    assert all(
        bb.cols is fb.cols
        for bb, fb in zip(op.bwd.buckets, op.fwd.buckets)
    )
    assert op.bwd.inv_perm is op.fwd.inv_perm
    assert op.bwd.pre_scale is not None and op.bwd.row_scale is None

    monkeypatch.setenv("ACMGNN_ELL_SHARE_T", "0")
    op_ref = make_ell_op(ah, kc=4, min_bucket_rows=16, hub_threshold=24)
    assert not any(
        bb.cols is fb.cols
        for bb, fb in zip(op_ref.bwd.buckets, op_ref.fwd.buckets)
    )
    monkeypatch.delenv("ACMGNN_ELL_SHARE_T")

    def bwd_apply(o, g):
        return jax.vjp(lambda x_: ell_spmm(o, x_), x)[1](g)[0]

    g = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    # bit-identical to the unshared build (same planes, same math)
    np.testing.assert_array_equal(
        np.asarray(ell_spmm(op, x)), np.asarray(ell_spmm(op_ref, x))
    )
    np.testing.assert_array_equal(
        np.asarray(bwd_apply(op, g)), np.asarray(bwd_apply(op_ref, g))
    )
    np.testing.assert_allclose(
        np.asarray(bwd_apply(op, g)), dense.T @ np.asarray(g),
        rtol=1e-4, atol=1e-5,
    )

    # fully symmetric (binary structure operator): bwd IS fwd
    op_b = make_ell_op(a.astype(np.float32), kc=4, min_bucket_rows=16)
    assert op_b.bwd is op_b.fwd
    np.testing.assert_allclose(
        np.asarray(ell_spmm(op_b, x)),
        np.asarray(a.todense(), np.float32) @ np.asarray(x),
        rtol=1e-4, atol=1e-5,
    )

    # directed operator: no sharing, transpose still exact
    d = sp.triu(a, k=1).tocsr()
    d.eliminate_zeros()
    dh = row_normalized_adjacency(d)
    op_d = make_ell_op(dh, kc=4, min_bucket_rows=16)
    assert op_d.bwd.buckets[0].cols is not op_d.fwd.buckets[0].cols
    np.testing.assert_allclose(
        np.asarray(bwd_apply(op_d, g)),
        np.asarray(dh.todense(), np.float32).T @ np.asarray(g),
        rtol=1e-4, atol=1e-5,
    )


def test_ell_value_free_bucket_ratio_knob(monkeypatch):
    """ACMGNN_ELL_VF_RATIO re-buckets value-free halves tighter (fewer
    pad slots, more buckets) without changing results (VERDICT r4 item
    #6's measured-A/B knob)."""
    import scipy.sparse as sp

    from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op
    from acmgnn_tpu.ops.graph import row_normalized_adjacency

    rng = np.random.default_rng(11)
    n = 500
    a = sp.random(n, n, density=0.02, random_state=5, format="csr")
    a.data[:] = 1.0
    a = ((a + a.T) > 0).astype(np.float64).tolil()
    a.setdiag(0)
    a = a.tocsr()
    a.eliminate_zeros()
    ah = row_normalized_adjacency(a)
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    want = np.asarray(ah.todense(), np.float32) @ np.asarray(x)

    base = make_ell_op(ah, kc=4, min_bucket_rows=8)

    def pad_slots(half):
        return sum(
            int(np.prod(b.cols.shape)) for b in half.buckets
        )

    monkeypatch.setenv("ACMGNN_ELL_VF_RATIO", "0.95")
    tight = make_ell_op(ah, kc=4, min_bucket_rows=8)
    assert tight.fwd.row_scale is not None  # still value-free
    assert pad_slots(tight.fwd) <= pad_slots(base.fwd)
    np.testing.assert_allclose(
        np.asarray(ell_spmm(tight, x)), want, rtol=1e-4, atol=1e-5
    )
    g = jax.grad(lambda x_: jnp.sum(jnp.cos(ell_spmm(tight, x_))))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.cos(ell_spmm(base, x_))))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )
