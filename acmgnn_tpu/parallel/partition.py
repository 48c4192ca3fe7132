"""Graph partitioning for multi-chip SPMD training.

The reference has no distributed layer at all (SURVEY.md §2.9b) — graphs
either fit one GPU or the paper reports OOM.  Here the sparse operator is
1-D row-partitioned across the device mesh with nnz-balanced contiguous
blocks (power-law degree graphs make equal-row blocks badly imbalanced),
and every device's block is padded to identical (rows, nnz) so the SPMD
program is uniform.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def partition_rows(adj: sp.spmatrix, n_parts: int) -> np.ndarray:
    """nnz-balanced contiguous row partition.

    Returns ``boundaries`` of length ``n_parts + 1`` with
    ``boundaries[i]:boundaries[i+1]`` the row range of part ``i``.
    """
    csr = sp.csr_matrix(adj)
    n = csr.shape[0]
    if n_parts <= 1:
        return np.array([0, n], dtype=np.int64)
    # cumulative nnz per row; split at equal nnz quantiles
    cum = csr.indptr[1:].astype(np.float64)  # cumulative nnz after each row
    total = cum[-1] if cum[-1] > 0 else 1.0
    targets = total * np.arange(1, n_parts) / n_parts
    cuts = np.searchsorted(cum, targets, side="left") + 1
    boundaries = np.concatenate([[0], cuts, [n]]).astype(np.int64)
    # enforce monotonicity for degenerate distributions
    boundaries = np.maximum.accumulate(boundaries)
    return boundaries


def _block_triplets(csr: sp.csr_matrix, r0: int, r1: int):
    """COO triplets of rows [r0, r1) with local row ids, CSR-ordered."""
    block = csr[r0:r1]
    coo = block.tocoo()
    order = np.lexsort((coo.col, coo.row))
    return (
        coo.row[order].astype(np.int32),      # local row id
        coo.col[order].astype(np.int32),      # global col id
        coo.data[order].astype(np.float32),
    )


def build_sharded_coo(
    adj_op: sp.spmatrix,
    n_parts: int,
    pad_multiple: int = 512,
    boundaries: np.ndarray | None = None,
):
    """Partition an operator matrix into uniform per-device COO blocks.

    Returns a dict of numpy arrays (stacked over the part axis) for the
    forward operator and its transpose, plus padding metadata:

    - ``row_l``/``col``/``val``: [P, nnz_pad] — local-row COO of A's block
    - ``row_l_t``/``col_t``/``val_t``: [P, nnz_pad_t] — same for A^T
    - ``rows_per_part``: uniform padded block height
    - ``boundaries``: the row partition used (shared by A and A^T)
    """
    csr = sp.csr_matrix(adj_op)
    csr_t = sp.csr_matrix(adj_op).T.tocsr()
    n = csr.shape[0]
    if boundaries is None:
        boundaries = partition_rows(csr, n_parts)
    rows_per_part = int(np.max(np.diff(boundaries))) if n_parts > 0 else n
    # pad rows so every shard is the same height (sentinel rows stay empty)
    rows_per_part = max(rows_per_part, 1)

    # Node arrays are re-laid into padded per-device slabs
    # (pad_node_array), so global column ids must be remapped into that
    # padded index space: node j of part p -> p*rows_per_part + local(j).
    padded_id = np.zeros(n, dtype=np.int32)
    for i in range(n_parts):
        r0, r1 = int(boundaries[i]), int(boundaries[i + 1])
        padded_id[r0:r1] = i * rows_per_part + np.arange(r1 - r0, dtype=np.int32)

    def stack_blocks(mat):
        blocks = [
            _block_triplets(mat, int(boundaries[i]), int(boundaries[i + 1]))
            for i in range(n_parts)
        ]
        nnz_max = max(b[0].shape[0] for b in blocks)
        nnz_pad = max(pad_multiple, -(-nnz_max // pad_multiple) * pad_multiple)
        rows = np.full((n_parts, nnz_pad), rows_per_part, dtype=np.int32)
        cols = np.zeros((n_parts, nnz_pad), dtype=np.int32)
        vals = np.zeros((n_parts, nnz_pad), dtype=np.float32)
        for i, (r, c, v) in enumerate(blocks):
            k = r.shape[0]
            rows[i, :k] = r
            cols[i, :k] = padded_id[c]
            vals[i, :k] = v
        return rows, cols, vals

    row_l, col, val = stack_blocks(csr)
    row_l_t, col_t, val_t = stack_blocks(csr_t)
    return {
        "row_l": row_l,
        "col": col,
        "val": val,
        "row_l_t": row_l_t,
        "col_t": col_t,
        "val_t": val_t,
        "rows_per_part": rows_per_part,
        "boundaries": boundaries,
        "num_nodes": n,
        "nnz": int(csr.nnz),
    }


def pad_node_array(arr: np.ndarray, boundaries: np.ndarray, rows_per_part: int):
    """Re-lay a [N, ...] node array into [P * rows_per_part, ...] so each
    device's contiguous slab holds its partition's rows (zero padded)."""
    n_parts = len(boundaries) - 1
    out_shape = (n_parts * rows_per_part,) + arr.shape[1:]
    out = np.zeros(out_shape, dtype=arr.dtype)
    for i in range(n_parts):
        r0, r1 = int(boundaries[i]), int(boundaries[i + 1])
        out[i * rows_per_part : i * rows_per_part + (r1 - r0)] = arr[r0:r1]
    return out


def unpad_node_array(arr: np.ndarray, boundaries: np.ndarray, rows_per_part: int):
    """Inverse of ``pad_node_array``."""
    n_parts = len(boundaries) - 1
    parts = []
    for i in range(n_parts):
        r0, r1 = int(boundaries[i]), int(boundaries[i + 1])
        parts.append(arr[i * rows_per_part : i * rows_per_part + (r1 - r0)])
    return np.concatenate(parts, axis=0)
