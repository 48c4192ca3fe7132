"""Host-side graph representation and operator precompute.

The reference builds its graph operators at load time with torch/scipy
(row-normalized low-pass ``A_hat = D^-1 (A + I)``, high-pass ``I - A_hat``;
see /root/reference/ACM-Pytorch/utils.py:421-438,527-531 and
/root/reference/ACM-Geometric/train.py:76-81).  We do the same preprocessing
on host with scipy, but ship the result to the device in TPU-friendly
formats:

- ``DenseOp``   — the operator as a dense ``[N, N]`` matrix.  For the small
  heterophily benchmarks (N <= ~20k) this is both the fastest and the
  simplest representation: SpMM becomes a plain MXU matmul, and the
  high-pass product is computed as ``z - A_hat z`` (one operator instead of
  two — ``I - A_hat`` never needs to be materialized).
- ``CooOp``     — nnz-sorted COO triplets plus the *precomputed transpose*
  triplets.  The forward SpMM is a gather + segment-sum; the backward needs
  ``A^T g`` which, for a row-normalized (asymmetric) operator, is a different
  sparse matrix — so both sortings are built once on host
  (SURVEY.md §7 "Hard parts").

All precompute is NumPy/SciPy on host; device transfer happens once.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Host-side graph container
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GraphData:
    """A loaded graph dataset, host-side (NumPy / SciPy).

    Mirrors the reference's ``(adj, features, labels)`` tuple
    (/root/reference/ACM-Pytorch/utils.py:294-386) and the OGB-style
    ``NCDataset`` (/root/reference/ACM-Geometric/dataset.py:17-69) in one
    structure.
    """

    name: str
    adj: sp.spmatrix                 # [N, N] raw (unnormalized) adjacency
    features: np.ndarray             # [N, F] float32
    labels: np.ndarray               # [N] int labels, or [N, C] multilabel
    splits: Optional[list] = None    # list of dicts {train/valid/test: idx}
    # node permutation applied to adj/features/labels (locality reorder);
    # split masks loaded from files must be permuted with it
    perm: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def num_edges(self) -> int:
        return int(self.adj.nnz)

    @property
    def num_features(self) -> int:
        return int(self.features.shape[1])

    @property
    def num_classes(self) -> int:
        if self.labels.ndim > 1 and self.labels.shape[1] > 1:
            return int(self.labels.shape[1])
        return int(self.labels.max()) + 1


# ---------------------------------------------------------------------------
# Normalization (host, scipy) — math per reference
# ---------------------------------------------------------------------------


def row_normalize(mat: sp.spmatrix) -> sp.csr_matrix:
    """``D^-1 M`` row normalization; zero rows stay zero.

    Equivalent to the reference's ``normalize_tensor`` / ``normalize``
    (/root/reference/ACM-Pytorch/utils.py:389-406,421-438).
    """
    mat = sp.csr_matrix(mat, dtype=np.float64)
    rowsum = np.asarray(mat.sum(axis=1)).flatten()
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, -1.0)
    r_inv[np.isinf(r_inv)] = 0.0
    return sp.diags(r_inv).dot(mat).tocsr()


def row_normalized_adjacency(adj: sp.spmatrix) -> sp.csr_matrix:
    """``D^-1 (A + I)`` — the reference's default low-pass operator
    (/root/reference/ACM-Pytorch/utils.py:527-531, 626;
    /root/reference/ACM-Geometric/train.py:77)."""
    adj = sp.csr_matrix(adj, dtype=np.float64)
    return row_normalize(adj + sp.eye(adj.shape[0], format="csr"))


def sym_normalized_adjacency(adj: sp.spmatrix) -> sp.csr_matrix:
    """``D^-1/2 (A + I) D^-1/2`` — the paper-discussed symmetric option
    (/root/reference/ACM-Pytorch/utils.py:451-459)."""
    adj = sp.coo_matrix(adj, dtype=np.float64)
    adj = (adj + sp.eye(adj.shape[0])).tocsr()
    rowsum = np.asarray(adj.sum(axis=1)).flatten()
    rowsum = np.where(rowsum == 0, 1.0, rowsum)
    d_inv_sqrt = np.power(rowsum, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return d.dot(adj).dot(d).tocsr()


def high_pass(adj_low: sp.spmatrix) -> sp.csr_matrix:
    """``I - A_hat`` (/root/reference/ACM-Pytorch/utils.py:172-174)."""
    return (sp.eye(adj_low.shape[0], format="csr") - sp.csr_matrix(adj_low)).tocsr()


def k_hop(adj_low: sp.spmatrix, hops: int, dense_threshold: int = 20000) -> sp.spmatrix:
    """``A_hat^k`` for the acmsgc multi-hop operator
    (/root/reference/ACM-Pytorch/utils.py:631-637).

    The reference densifies and chains dense matmuls; we do the same for
    small graphs (the only place acmsgc is used) and keep sparse^k for
    larger ones.
    """
    if hops <= 1:
        return adj_low
    n = adj_low.shape[0]
    if n <= dense_threshold:
        dense = np.asarray(sp.csr_matrix(adj_low).todense())
        out = dense
        for _ in range(hops - 1):
            out = out @ dense
        return sp.csr_matrix(out)
    out = sp.csr_matrix(adj_low)
    base = sp.csr_matrix(adj_low)
    for _ in range(hops - 1):
        out = out @ base
    return out


# ---------------------------------------------------------------------------
# Device operator formats (JAX pytrees)
# ---------------------------------------------------------------------------


class DenseOp(struct.PyTreeNode):
    """Dense operator: SpMM == MXU matmul.  ``mat`` is [N, N] float32."""

    mat: jnp.ndarray
    num_nodes: int = struct.field(pytree_node=False)

    @property
    def nnz(self) -> int:
        return self.num_nodes * self.num_nodes


class CooOp(struct.PyTreeNode):
    """Sorted-COO operator with precomputed transpose for the custom VJP.

    ``row``/``col``/``val`` are sorted by ``row`` (CSR order); the ``*_t``
    triplets represent ``A^T`` sorted by *its* rows (i.e. by ``col`` of A).
    Arrays are padded to ``nnz_padded`` with ``row = num_nodes`` (dropped by
    the scatter) and ``val = 0``.
    """

    row: jnp.ndarray        # [nnz_padded] int32
    col: jnp.ndarray        # [nnz_padded] int32
    val: jnp.ndarray        # [nnz_padded] float32
    row_t: jnp.ndarray      # [nnz_padded] int32
    col_t: jnp.ndarray      # [nnz_padded] int32
    val_t: jnp.ndarray      # [nnz_padded] float32
    num_nodes: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)


SparseOp = Any  # DenseOp | CooOp


def _coo_sorted_triplets(mat: sp.spmatrix):
    coo = sp.coo_matrix(mat)
    order = np.lexsort((coo.col, coo.row))
    return (
        coo.row[order].astype(np.int32),
        coo.col[order].astype(np.int32),
        coo.data[order].astype(np.float32),
    )


def _pad_nnz(arr: np.ndarray, nnz_padded: int, fill) -> np.ndarray:
    pad = nnz_padded - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.full((pad,), fill, dtype=arr.dtype)])


def make_dense_op(mat: sp.spmatrix) -> DenseOp:
    n = mat.shape[0]
    dense = np.asarray(sp.csr_matrix(mat).todense(), dtype=np.float32)
    return DenseOp(mat=jnp.asarray(dense), num_nodes=n)


def make_coo_op(mat: sp.spmatrix, pad_multiple: int = 512) -> CooOp:
    n = mat.shape[0]
    row, col, val = _coo_sorted_triplets(mat)
    row_t, col_t, val_t = _coo_sorted_triplets(mat.T)
    nnz = row.shape[0]
    nnz_padded = max(pad_multiple, -(-nnz // pad_multiple) * pad_multiple)
    return CooOp(
        row=jnp.asarray(_pad_nnz(row, nnz_padded, n)),
        col=jnp.asarray(_pad_nnz(col, nnz_padded, 0)),
        val=jnp.asarray(_pad_nnz(val, nnz_padded, 0.0)),
        row_t=jnp.asarray(_pad_nnz(row_t, nnz_padded, n)),
        col_t=jnp.asarray(_pad_nnz(col_t, nnz_padded, 0)),
        val_t=jnp.asarray(_pad_nnz(val_t, nnz_padded, 0.0)),
        num_nodes=n,
        nnz=nnz,
    )


# ---------------------------------------------------------------------------
# Operator bundle — what models consume
# ---------------------------------------------------------------------------


class Operators(struct.PyTreeNode):
    """The precomputed operator bundle handed to every model forward.

    Equivalent of the reference's ``(adj_low, adj_high, adj_low_unnormalized)``
    triple (/root/reference/ACM-Pytorch/utils.py:619-629), except the
    high-pass never exists as data: ``(I - A_hat) z`` is computed as
    ``z - A_hat z`` reusing the single low-pass operator.
    """

    adj_low: SparseOp
    # Optional raw-adjacency operator for the acmgcnp/pp structure channel.
    adj_unnorm: Optional[SparseOp] = None
    # Base operator for the high-pass channel when it differs from adj_low:
    # with acmsgc hops > 1 the reference computes adj_high = I - A_hat from
    # the 1-hop operator BEFORE exponentiating adj_low to A_hat^k
    # (/root/reference/ACM-Pytorch/utils.py:626-637).
    adj_hp_base: Optional[SparseOp] = None
    # Precomputed ``A_hat @ X`` over the (normalized) feature matrix the
    # model is fed — the first-layer hoist's static aggregate.  Because
    # propagation commutes with the projection for variant-0 ACM layers
    # (``A_hat (X W) == (A_hat X) W``), any layer-1 branch whose input is
    # exactly X (the eval forward; the train forward when dropout == 0)
    # derives BOTH channel aggregations from this array by dense matmuls —
    # zero sparse gathers.  Built once by the trainer (prepare_data /
    # run_experiment_sharded); None when hoisting is off.
    x_agg: Optional[jnp.ndarray] = None

    @property
    def adj_hp(self) -> SparseOp:
        return self.adj_low if self.adj_hp_base is None else self.adj_hp_base

    @property
    def num_nodes(self) -> int:
        return self.adj_low.num_nodes


# Above this node count the auto format switches from the dense [N, N]
# operator to bucketed ELL.  Kept conservative (4096): ELL is perf-
# competitive at mid sizes, dense memory is O(N^2), and this
# environment's experimental TPU backend miscompiles the BACKWARD of
# some dense-operator model configs at ~5k nodes (variant-1 squirrel:
# grad NaN with the dense path, clean with ELL; forward fine, CPU fine —
# see PARITY.md).
DEFAULT_DENSE_THRESHOLD = 4096


def locality_order(adj: sp.spmatrix, method: str = "rcm") -> np.ndarray:
    """Node permutation improving gather locality: neighbors get nearby
    ids, so SpMM row fetches hit nearby HBM pages.

    Returns ``perm`` with ``new_id = position of old_id in perm`` — apply
    as ``adj[perm][:, perm]``, ``x[perm]``.  Metrics/training are
    permutation-invariant, so reordering is free at the protocol level.
    """
    if method == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(
            reverse_cuthill_mckee(sp.csr_matrix(adj), symmetric_mode=True)
        ).astype(np.int64)
    if method == "degree":
        deg = np.asarray(sp.csr_matrix(adj).sum(axis=1)).flatten()
        return np.argsort(-deg, kind="stable").astype(np.int64)
    raise ValueError(f"unknown reorder method: {method!r}")


def permute_graph(adj: sp.spmatrix, perm: np.ndarray) -> sp.csr_matrix:
    """``P A P^T`` for the node permutation ``perm``."""
    csr = sp.csr_matrix(adj)
    return csr[perm][:, perm].tocsr()


def precompute_operators(
    adj: sp.spmatrix,
    *,
    normalization: str = "row",       # "row" = D^-1(A+I) | "sym" = D^-1/2(A+I)D^-1/2
    hops: int = 1,                    # acmsgc: use A_hat^k as the low-pass
    structure_info: bool = False,     # also ship raw A for the structure channel
    fmt: str = "auto",                # "auto" | "dense" | "coo" | "ell"
    dense_threshold: int = DEFAULT_DENSE_THRESHOLD,
    spmm_dtype=None,                  # e.g. jnp.bfloat16: halve ELL gather traffic
    ell_hub_threshold: int | None = None,  # dense-row hybrid for hub rows
    ell_block: int | None = None,     # block-column ELL (-1 auto; 1 off)
) -> Operators:
    """Build the device operator bundle from a raw adjacency matrix."""
    adj = sp.csr_matrix(adj)
    n = adj.shape[0]

    if normalization == "row":
        adj_low = row_normalized_adjacency(adj)
    elif normalization == "sym":
        adj_low = sym_normalized_adjacency(adj)
    else:
        raise ValueError(f"unknown normalization: {normalization!r}")

    adj_hp_base = None
    if hops > 1:
        adj_hp_base = adj_low  # high-pass stays 1-hop (see Operators.adj_hp_base)
        adj_low = k_hop(adj_low, hops)

    if fmt == "auto":
        # dense = MXU matmul for small graphs; bucketed ELL (scatter-free)
        # for everything larger — ~2.7x faster than COO segment-sum on TPU
        fmt = "dense" if n <= dense_threshold else "ell"

    if fmt == "dense":
        make = make_dense_op
    elif fmt == "coo":
        make = make_coo_op
    elif fmt == "ell":
        from acmgnn_tpu.ops.ell import make_ell_op

        make = partial(make_ell_op, hub_threshold=ell_hub_threshold,
                       block=ell_block)
        if spmm_dtype is not None:
            make = partial(make, gather_dtype=spmm_dtype)
    else:
        raise ValueError(f"unknown operator format: {fmt!r}")

    return Operators(
        adj_low=make(adj_low),
        adj_unnorm=make(adj) if structure_info else None,
        adj_hp_base=None if adj_hp_base is None else make(adj_hp_base),
    )
