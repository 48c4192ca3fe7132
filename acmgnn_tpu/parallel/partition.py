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


def fennel_partition(
    adj: sp.spmatrix,
    n_parts: int,
    gamma: float = 1.5,
    slack: float = 1.05,
    passes: int = 2,
    order: str = "degree",
) -> np.ndarray:
    """Streaming Fennel partitioning (Tsourakakis et al., WSDM'14):
    assign each node to the part maximizing ``|N(v) ∩ P| − α·γ·load(P)^(γ−1)``
    under a hard load cap — a one-pass approximation of min-cut balanced
    partitioning (the "METIS-style" partitioner SURVEY.md §7 calls for;
    METIS itself isn't in this image).

    Loads are DEGREE-weighted (nnz per part, not node counts) to match the
    nnz-balanced contiguous baseline's compute balance.  ``passes > 1``
    re-streams for refinement (each node may move given the now-complete
    assignment of its neighbors).  Returns ``part[N]`` int32.
    """
    csr = sp.csr_matrix(adj)
    n = csr.shape[0]
    if n_parts <= 1:
        return np.zeros(n, np.int32)
    indptr, indices = csr.indptr, csr.indices
    deg = np.diff(indptr).astype(np.int64)
    total_load = float(max(csr.nnz, 1))
    cap = slack * total_load / n_parts
    # Fennel's alpha with loads rescaled to the nnz measure
    alpha = total_load * (n_parts ** (gamma - 1.0)) / (total_load ** gamma)
    if order == "degree":
        visit = np.argsort(-deg, kind="stable")
    elif order == "bfs":
        from scipy.sparse.csgraph import breadth_first_order

        seen = np.zeros(n, bool)
        visit = []
        for seed in np.argsort(-deg, kind="stable"):
            if seen[seed]:
                continue
            bfs = breadth_first_order(
                csr, int(seed), directed=False, return_predecessors=False
            )
            seen[bfs] = True
            visit.append(bfs)
        visit = np.concatenate(visit) if visit else np.arange(n)
    else:
        visit = np.arange(n)

    part = np.full(n, -1, np.int32)
    loads = np.zeros(n_parts, np.float64)
    for _ in range(max(passes, 1)):
        for v in visit:
            w = float(deg[v])
            p_old = part[v]
            if p_old >= 0:
                loads[p_old] -= w
            nbr_parts = part[indices[indptr[v] : indptr[v + 1]]]
            nbr_parts = nbr_parts[nbr_parts >= 0]
            score = np.bincount(nbr_parts, minlength=n_parts).astype(
                np.float64
            )
            score -= alpha * gamma * np.power(loads, gamma - 1.0)
            over = loads + w > cap
            if not over.all():
                score[over] = -np.inf
            p_new = int(np.argmax(score))
            part[v] = p_new
            loads[p_new] += w
    return part


def degree_balanced_partition(adj: sp.spmatrix, n_parts: int) -> np.ndarray:
    """Serpentine-by-degree assignment: rows sorted by degree descending
    are dealt across parts in boustrophedon order (0..P-1, P-1..0, ...).

    Exists for heavy-tailed graphs under SPMD-uniform plane padding
    (VERDICT r4 weak #3): the sharded ELL format pads every partition's
    hub count and per-class row counts to the CROSS-PARTITION MAX
    (``build_sharded_ell``), so a partition scheme that concentrates
    hubs in one part (contiguous blocks on a degree-ordered graph — the
    Chung-Lu stand-ins' natural id order IS descending expected degree)
    makes every device pay the hub-richest partition's dense-block MXU
    work and class padding.  Serpentine dealing balances hub counts,
    per-class row counts AND total nnz simultaneously (each consecutive
    run of 2P degree-ranked rows contributes once to every part from
    both directions), at the cost of locality — which structure-free
    power-law graphs don't have anyway (PERF.md Fennel table: halo
    volume ties on such graphs).  Returns ``part[N]`` int32.
    """
    csr = sp.csr_matrix(adj)
    n = csr.shape[0]
    if n_parts <= 1:
        return np.zeros(n, np.int32)
    deg = np.diff(csr.indptr)
    order = np.argsort(-deg, kind="stable")
    part = np.empty(n, np.int32)
    ranks = np.arange(n)
    fwd = (ranks // n_parts) % 2 == 0
    part[order] = np.where(
        fwd, ranks % n_parts, n_parts - 1 - (ranks % n_parts)
    ).astype(np.int32)
    return part


def ell_class_widths(maxdeg: int, ratio: float) -> np.ndarray:
    """Ascending ELL degree-class width grid: ``width_{c+1} =
    max(width_c + 1, ceil(width_c / ratio))``.  ``ratio=0.5`` reproduces
    the power-of-two grid (1, 2, 4, ...); tighter ratios bound the
    per-class pad expansion to ~1/ratio at the cost of ~log_{1/r}(maxdeg)
    classes (empty classes build no planes).  The class of a row with
    local degree d is ``searchsorted(widths, d, "left")``."""
    widths = [1]
    while widths[-1] < max(int(maxdeg), 1):
        w = widths[-1]
        widths.append(max(w + 1, int(np.ceil(w / ratio))))
    return np.asarray(widths, np.int64)


def sharded_ell_work_accounting(
    adj_op: sp.spmatrix,
    n_parts: int,
    boundaries: np.ndarray | None = None,
    hub_threshold: int = 0,
) -> dict:
    """Per-device work table for a sharded-ELL partition — the data the
    scaling bench needs to adjudicate 'emulation artifact vs genuine
    SPMD imbalance' (VERDICT r4 item #3).

    Mirrors ``build_sharded_ell``'s class/hub construction arithmetic
    without building planes.  Returns per-partition arrays plus the
    SPMD-uniform padded costs every device pays regardless of its real
    share:

    - ``nnz``: [P] real nnz per partition
    - ``hub_rows``: [P] real rows at/above ``hub_threshold``
    - ``hub_rows_padded``: the cross-partition max every device's dense
      hub block is padded to (0 if hubs disabled/absent)
    - ``class_rows``: [P, ncls] real per-class row counts
    - ``padded_fetches``: slot fetches per device per SpMM
      (sum_c max_p class_rows[p, c] * 2^c) — identical on every device
    - ``pad_expansion``: [P] padded_fetches / max(real plane nnz, 1)
    - ``hub_mxu_macs``: per-device hub matmul MACs per operand column
      (hub_rows_padded * width) — paid by EVERY device
    """
    import os

    csr = sp.csr_matrix(adj_op)
    n = csr.shape[0]
    if boundaries is None:
        boundaries = partition_rows(csr, n_parts)
    deg = np.diff(csr.indptr)
    parts_deg = [
        deg[int(boundaries[i]): int(boundaries[i + 1])]
        for i in range(n_parts)
    ]
    nnz_p = np.array([int(d.sum()) for d in parts_deg])
    hub_p = np.zeros(n_parts, np.int64)
    if hub_threshold > 0:
        hub_p = np.array(
            [int((d >= hub_threshold).sum()) for d in parts_deg]
        )
    n_hub = int(hub_p.max()) if hub_threshold > 0 else 0
    # class arithmetic as in build_sharded_ell: hub rows excluded, class
    # c packs local degrees in (widths[c-1], widths[c]] on the same
    # geometric grid (production path is value-free -> vf ratio)
    class_ratio = float(os.environ.get("ACMGNN_ELL_VF_RATIO", "0.95"))
    cls_counts = []
    plane_nnz_p = np.zeros(n_parts, np.int64)
    maxdeg = 0
    degs_nohub = []
    for p, d in enumerate(parts_deg):
        d = d.copy()
        if hub_threshold > 0 and hub_p[p]:
            hub_rows = np.argsort(-d, kind="stable")[: int(hub_p[p])]
            d[hub_rows] = 0
        degs_nohub.append(d)
        plane_nnz_p[p] = int(d.sum())
        maxdeg = max(maxdeg, int(d.max()) if d.size else 0)
    widths = ell_class_widths(maxdeg, class_ratio)
    ncls = len(widths)
    for d in degs_nohub:
        nz = d > 0
        c = np.searchsorted(widths, d[nz], side="left")
        cls_counts.append(np.bincount(c, minlength=ncls))
    class_rows = np.zeros((n_parts, ncls), np.int64)
    for p, c in enumerate(cls_counts):
        class_rows[p, : len(c)] = c
    padded_rows_c = class_rows.max(axis=0)
    padded_fetches = int((padded_rows_c * widths).sum())
    rpp = int(np.max(np.diff(boundaries)))
    return {
        "nnz": nnz_p,
        "hub_rows": hub_p,
        "hub_rows_padded": n_hub,
        "class_rows": class_rows,
        "class_rows_padded": padded_rows_c,
        "padded_fetches": padded_fetches,
        "pad_expansion": padded_fetches / np.maximum(plane_nnz_p, 1),
        "hub_mxu_macs": n_hub * n_parts * rpp,
        "rows_per_part": rpp,
    }


def partition_to_perm(part: np.ndarray, n_parts: int):
    """Node permutation making each part's rows contiguous, plus the
    resulting row ``boundaries`` — the glue between an arbitrary
    assignment and the contiguous-block sharding machinery
    (``build_sharded_coo`` et al.).  Apply as ``adj[perm][:, perm]``,
    ``x[perm]`` (same convention as ``ops.graph.locality_order``)."""
    perm = np.argsort(part, kind="stable").astype(np.int64)
    counts = np.bincount(part, minlength=n_parts)
    boundaries = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return perm, boundaries


def edge_cut(adj: sp.spmatrix, part: np.ndarray) -> int:
    """Number of (directed) nnz whose endpoints live in different parts —
    the quantity halo exchange pays for."""
    coo = sp.coo_matrix(adj)
    return int((part[coo.row] != part[coo.col]).sum())


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


def build_halo_schedule(blocks: dict, pad_multiple: int = 8) -> dict:
    """Dedup'd boundary (halo) exchange schedule for a sharded operator.

    The plain sharded SpMM all-gathers the full feature matrix before the
    local gather (every device receives (P-1)*rows_per_part remote rows per
    call).  But each device's block only *references* the remote rows that
    appear among its column ids — on a locality-ordered graph (RCM/BFS,
    `ops/graph.py reorder_*`) that set is a thin band around the partition
    boundary.  This precomputes, for every (owner q, consumer p) pair, the
    deduplicated list of q's local rows that p needs, so the device-side
    exchange can be one uniform ``all_to_all`` of ``[P, halo_pad, d]`` send
    slabs instead of a full all-gather.  (The reference has no distributed
    layer at all — SURVEY.md §2.9b lists this halo exchange as a required
    new capability of the TPU build.)

    Input: the dict from ``build_sharded_coo`` (columns in padded-global id
    space ``q * rows_per_part + local``).  Returns, for the forward and
    transpose operators:

    - ``col_h`` / ``col_h_t``: [P, nnz_pad] columns remapped into the
      device-local concat space ``[own block (rows_per_part) | halo slabs
      (P * halo_pad)]``: own-part columns keep their local id, a column in
      remote part q at rank r of its need-list becomes
      ``rows_per_part + q * halo_pad + r``.
    - ``send_idx`` / ``send_idx_t``: [P(owner), P(dest), halo_pad] local row
      ids each owner gathers into its send slab (unused slots send row 0,
      which no remapped column ever references).
    - ``halo_pad`` / ``halo_pad_t``: uniform padded slab width, and
    - ``halo_rows`` / ``halo_rows_t``: total real (pre-pad) halo rows, for
      the halo-vs-allgather volume decision.
    """
    rows_per_part = int(blocks["rows_per_part"])
    n_parts = blocks["row_l"].shape[0]

    def schedule(row_l, col):
        need = [[None] * n_parts for _ in range(n_parts)]  # [p][q] -> local ids
        for p in range(n_parts):
            valid = row_l[p] != rows_per_part  # sentinel rows are padding
            cols_p = np.unique(col[p][valid])
            owner = cols_p // rows_per_part
            local = cols_p % rows_per_part
            for q in range(n_parts):
                if q == p:
                    continue
                need[p][q] = local[owner == q]
        halo_rows = sum(
            n.size for row in need for n in row if n is not None
        )
        h_max = max(
            (n.size for row in need for n in row if n is not None),
            default=0,
        )
        halo_pad = max(pad_multiple, -(-max(h_max, 1) // pad_multiple) * pad_multiple)

        send_idx = np.zeros((n_parts, n_parts, halo_pad), dtype=np.int32)
        col_h = np.zeros_like(col)
        for p in range(n_parts):
            # remap table: padded-global id -> local concat id for part p
            remap = np.zeros(n_parts * rows_per_part, dtype=np.int32)
            own0 = p * rows_per_part
            remap[own0 : own0 + rows_per_part] = np.arange(
                rows_per_part, dtype=np.int32
            )
            for q in range(n_parts):
                if q == p:
                    continue
                ids = need[p][q]
                send_idx[q, p, : ids.size] = ids
                remap[q * rows_per_part + ids] = (
                    rows_per_part + q * halo_pad + np.arange(ids.size, dtype=np.int32)
                )
            col_h[p] = remap[col[p]]
        return col_h, send_idx, halo_pad, halo_rows

    col_h, send_idx, halo_pad, halo_rows = schedule(blocks["row_l"], blocks["col"])
    col_h_t, send_idx_t, halo_pad_t, halo_rows_t = schedule(
        blocks["row_l_t"], blocks["col_t"]
    )
    return {
        "col_h": col_h,
        "send_idx": send_idx,
        "halo_pad": halo_pad,
        "halo_rows": halo_rows,
        "col_h_t": col_h_t,
        "send_idx_t": send_idx_t,
        "halo_pad_t": halo_pad_t,
        "halo_rows_t": halo_rows_t,
    }


def build_sharded_ell(
    blocks: dict,
    col_key: str = "col",
    row_key: str = "row_l",
    val_key: str = "val",
    n_cols: int | None = None,
    kc: int | None = None,
    chunk_fetches: int | None = None,
    hub_threshold: int = 0,
    hub_budget_bytes: int = 512 * 1024 * 1024,
    plane_dtype=np.float32,
    uniform_scale: np.ndarray | None = None,
    scale_mode: str = "post",
) -> dict:
    """Per-partition bucketed-ELL planes with SHARED shapes.

    The single-chip perf format (ops/ell.py: scatter-free bucketed
    ELLPACK, ~2.7x over COO segment-sum on TPU) adapted to shard_map's
    one-uniform-program requirement: rows are grouped into power-of-two
    degree CLASSES (class c holds local degrees in (2^(c-1), 2^c],
    packed at width 2^c), and each class's row count is padded to the
    maximum across partitions so every device holds identically-shaped
    planes.  Pad expansion is bounded by 2x within a class (power-of-two
    widths) plus the cross-partition row padding.

    ``hub_threshold`` > 0 enables the dense-row hub hybrid (the
    single-chip power-law fix, ops/ell.py EllHalf.hub_mat, measured
    1238 -> 277 ms/epoch): each partition's rows with degree >=
    threshold become one dense [n_hub, width] block consumed by an MXU
    matmul instead of per-edge gather descriptors.  The hub row count is
    padded to the max across partitions (SPMD uniformity; pad rows are
    all-zero) and capped by ``hub_budget_bytes``.  Because the operator
    is ROW-partitioned, each local row is the complete global row, so
    local degree == global degree and the hub economics match
    single-chip exactly.

    ``uniform_scale`` (global [N] f32) switches the half VALUE-FREE —
    the sharded port of ops/ell.py's EllHalf.row_scale/pre_scale
    contract (VERDICT r4 item #1; the per-edge multiply and the value
    planes' HBM + exchange traffic disappear).  Because the operator is
    ROW-partitioned, every local row is the complete global row, so
    global row/column uniformity carries over to each partition's block
    verbatim:

    - ``scale_mode="post"`` (row-uniform operators, e.g. A_hat =
      D^-1(A+I)): pad slots index one appended zero row of the operand
      concat (index ``n_cols``/width); the per-row scalar is applied
      ONCE after the inverse permutation.  Hub rows keep real values
      (scale 1.0 in the returned slab).
    - ``scale_mode="pre"`` (column-uniform operators — the transpose of
      a row-uniform one): the OPERAND is scaled before the exchange
      (``A_hat^T g = B^T (s ⊙ g)``); hub rows are stored binarized.

    Input: the dict from ``build_sharded_coo`` (optionally with halo
    ``col_h`` columns — pass ``col_key="col_h"`` and the concat-space
    width as ``n_cols``).  Returns::

      classes:   list of (cols, vals, kc_c) with cols/vals shaped
                 [P, nchunks_c, kc_c, n_rows_c] (rows-MINOR scan layout,
                 pre-chunked like ops/ell.py so the device never re-lays
                 planes); ``vals`` is None for a value-free half
      hub_mat:   [P, n_hub, width] dense hub rows (plane dtype), or None
      inv_perm:  [P, rows_per_part] int32 into the per-device concat
                 [hub rows | class_0 rows | ... | one zero row]
      row_scale: [P, rows_per_part] f32 per-output-row scale slab
                 (post mode), else None
      pre_scale: [P, rows_per_part] f32 per-operand-row scale slab
                 (pre mode), else None
    """
    from acmgnn_tpu.ops.ell import resolve_chunk_fetches, resolve_kc

    kc = resolve_kc(kc)
    chunk_fetches = resolve_chunk_fetches(chunk_fetches)
    rpp = int(blocks["rows_per_part"])
    row_l = blocks[row_key]
    col = blocks[col_key]
    val = blocks[val_key]
    n_parts = row_l.shape[0]
    width = n_cols if n_cols is not None else n_parts * rpp
    value_free = uniform_scale is not None
    if value_free and scale_mode not in ("post", "pre"):
        raise ValueError(f"unknown scale_mode: {scale_mode!r}")

    # per-partition local CSR blocks
    csrs = []
    for p in range(n_parts):
        valid = row_l[p] != rpp
        m = sp.csr_matrix(
            (val[p][valid], (row_l[p][valid], col[p][valid])),
            shape=(rpp, width),
        )
        m.sort_indices()
        csrs.append(m)
    degs = np.stack([np.diff(m.indptr) for m in csrs])  # [P, rpp]

    # dense hub block: highest-degree rows, budget-capped, padded to the
    # cross-partition max so the shard_map program stays uniform
    hub_mat = None
    hub_rows_sel = [np.empty(0, np.int64) for _ in range(n_parts)]
    n_hub = 0
    if hub_threshold > 0 and degs.size:
        cap = int(hub_budget_bytes // max(4 * width, 1))
        n_hub = min(int((degs >= hub_threshold).sum(axis=1).max()), cap)
        if n_hub > 0:
            hub_mat = np.zeros((n_parts, n_hub, width), np.float32)
            for p in range(n_parts):
                hr = np.flatnonzero(degs[p] >= hub_threshold)
                hr = hr[np.argsort(-degs[p][hr], kind="stable")][:n_hub]
                hub_rows_sel[p] = hr
                if hr.size:
                    hub_src = csrs[p][hr].toarray()
                    if value_free and scale_mode == "pre":
                        # the hub matmul consumes the SAME pre-scaled
                        # operand as the gathers, so hub rows hold the
                        # binary structure (ops/ell.py _build_half)
                        hub_src = (hub_src != 0).astype(np.float32)
                    hub_mat[p, : hr.size] = hub_src

    # degree class per row: class c packs at width widths[c] and covers
    # (widths[c-1], widths[c]]; hub rows are marked -1 (handled by the
    # dense block, excluded from every plane).  The width grid is
    # geometric with the class ratio (0.5 = the old power-of-two grid):
    # value-free halves default to the MEASURED single-chip optimum
    # 0.95 (pad slots cost a descriptor fetch but zero value-plane
    # bytes — headline 135.7 -> 111.4 ms; see ops/ell.py make_ell_op),
    # valued halves keep 0.5 (their pads carry value bytes and the
    # doubled plane count costs HBM).
    import os

    if value_free:
        class_ratio = float(
            os.environ.get("ACMGNN_ELL_VF_RATIO", "0.95")
        )
    else:
        class_ratio = 0.5
    cls_deg = degs.copy()
    for p in range(n_parts):
        cls_deg[p][hub_rows_sel[p]] = 0
    maxdeg = int(cls_deg.max()) if cls_deg.size else 0
    widths = ell_class_widths(maxdeg, class_ratio)
    ncls = len(widths)
    cls = np.full_like(degs, -1)
    nz = cls_deg > 0
    cls[nz] = np.searchsorted(widths, cls_deg[nz], side="left").astype(
        degs.dtype
    )
    for p in range(n_parts):
        cls[p][hub_rows_sel[p]] = -1
    counts = np.stack(
        [np.bincount(cls[p][cls[p] >= 0], minlength=ncls)
         for p in range(n_parts)]
    )  # [P, ncls]
    n_rows_c = counts.max(axis=0)

    classes = []
    offsets = []
    off = n_hub  # hub rows lead the per-device concat
    inv_perm = np.zeros((n_parts, rpp), np.int32)
    plane_meta = []
    for c in range(ncls):
        if n_rows_c[c] == 0:
            offsets.append(off)
            plane_meta.append(None)
            continue
        k_c = int(widths[c])
        # scan-chunk sizing as in ops/ell.py: grow kc while each scan
        # step stays under the fetch budget; narrow classes keep width
        kc_b = kc
        while kc_b < k_c and int(n_rows_c[c]) * kc_b < chunk_fetches:
            kc_b *= 2
        kc_b = min(kc_b, k_c)
        # geometric widths need not divide by kc_b — pad the slot axis
        # up to a whole number of scan chunks (ops/ell.py does the same)
        k_c = -(-k_c // kc_b) * kc_b
        nchunks = k_c // kc_b
        # value-free pad slots index the appended zero row of the
        # operand concat (index == width); valued pad slots index 0
        # with val 0 (ops/ell.py _build_half)
        cols_pl = np.full(
            (n_parts, int(n_rows_c[c]), k_c),
            width if value_free else 0, np.int32,
        )
        vals_pl = (
            None if value_free
            else np.zeros((n_parts, int(n_rows_c[c]), k_c), np.float32)
        )
        plane_meta.append((cols_pl, vals_pl, kc_b, nchunks, k_c))
        offsets.append(off)
        off += int(n_rows_c[c])
    zero_idx = off  # one trailing zero row for degree-0 rows

    for p in range(n_parts):
        m = csrs[p]
        deg_p = degs[p]
        # stable order of rows within each class = row id order
        rank = np.zeros(rpp, np.int64)
        for c in range(ncls):
            sel = cls[p] == c
            rank[sel] = np.arange(int(sel.sum()))
        cls_rows = np.flatnonzero(cls[p] >= 0)
        inv_perm[p] = zero_idx
        inv_perm[p, cls_rows] = (
            np.asarray(offsets, np.int64)[cls[p][cls_rows]] + rank[cls_rows]
        ).astype(np.int32)
        # hub rows map to the leading dense-block outputs (rank order)
        hr = hub_rows_sel[p]
        inv_perm[p, hr] = np.arange(hr.size, dtype=np.int32)
        # pack nnz into the class planes (vectorized per partition)
        if m.nnz:
            row_of = np.repeat(np.arange(rpp), deg_p)
            within = np.arange(m.nnz) - np.repeat(
                m.indptr[:-1], deg_p
            )
            c_of = cls[p][row_of]
            r_of = rank[row_of]
            for c in range(ncls):
                if plane_meta[c] is None:
                    continue
                cols_pl, vals_pl = plane_meta[c][0], plane_meta[c][1]
                sel = c_of == c
                cols_pl[p, r_of[sel], within[sel]] = m.indices[sel]
                if vals_pl is not None:
                    vals_pl[p, r_of[sel], within[sel]] = m.data[sel]

    for c in range(ncls):
        if plane_meta[c] is None:
            continue
        cols_pl, vals_pl, kc_b, nchunks, k_c = plane_meta[c]
        nr = cols_pl.shape[1]
        # pre-chunk into the rows-MINOR scan layout [P, nchunks, kc, rows]
        # (kc-minor planes pad to the 128-lane tile: 16x HBM inflation;
        # see ops/ell.py EllBucket)
        cols_pl = cols_pl.reshape(n_parts, nr, nchunks, kc_b).transpose(
            0, 2, 3, 1
        )
        if vals_pl is not None:
            vals_pl = vals_pl.reshape(
                n_parts, nr, nchunks, kc_b
            ).transpose(0, 2, 3, 1)
            vals_pl = np.ascontiguousarray(vals_pl).astype(plane_dtype)
        classes.append(
            (np.ascontiguousarray(cols_pl), vals_pl, kc_b)
        )
    row_scale = pre_scale = None
    if value_free:
        slab = pad_node_array(
            np.asarray(uniform_scale, np.float32),
            blocks["boundaries"], rpp,
        ).reshape(n_parts, rpp).copy()
        if scale_mode == "post":
            # hub rows keep 1.0 — the hub block carries real values
            for p in range(n_parts):
                slab[p, hub_rows_sel[p]] = 1.0
            row_scale = slab
        else:
            pre_scale = slab
    return {
        "classes": classes,
        # stored in the gather dtype like the class-plane values — an
        # f32 block would be converted into a fresh [n_hub, width] temp
        # on every SpMM call under spmm_dtype=bfloat16
        "hub_mat": (
            hub_mat.astype(plane_dtype) if hub_mat is not None else None
        ),
        "inv_perm": inv_perm,
        "concat_rows": zero_idx + 1,
        "row_scale": row_scale,
        "pre_scale": pre_scale,
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
