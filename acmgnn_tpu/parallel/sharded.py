"""Sharded SpMM: the distributed-communication layer the reference lacks.

Design (SURVEY.md §2.9b): 1-D row partition of the operator over a
``jax.sharding.Mesh`` axis ``"graph"``.  Node arrays (features, labels,
masks, activations) live row-sharded in padded per-device slabs; model
weights are replicated (the ACM models are tiny — ≤ 3·F·H per layer).

The SpMM itself runs in ``shard_map``: each device all-gathers the feature
matrix over ICI (XLA collective), then performs its local
gather + segment-sum over its COO block.  The custom VJP runs the same
pattern over the precomputed transpose blocks and reduce-scatters nothing —
the output of ``A^T g`` is already row-partitioned the same way because
both A and A^T are split on the same node boundaries.

All other model ops (channel GEMMs, attention, softmax, dropout, loss) are
row-local, so under ``jit`` the row sharding propagates through them with
zero extra communication; the only collectives per layer are this
all-gather and the scalar ``psum``s of the loss/metric reductions.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acmgnn_tpu.parallel.partition import (
    build_halo_schedule,
    build_sharded_coo,
    pad_node_array,
)

GRAPH_AXIS = "graph"


class ShardedCooOp(struct.PyTreeNode):
    """Row-partitioned COO operator (+ transpose), one block per device.

    Data arrays are [P, nnz_pad] stacked over the mesh axis; placed with
    ``NamedSharding(mesh, P('graph'))`` so device i holds block i.
    """

    row_l: jnp.ndarray      # [P, nnz_pad] local row ids (sentinel = rows_per_part)
    col: jnp.ndarray        # [P, nnz_pad] padded-global col ids
    val: jnp.ndarray        # [P, nnz_pad]
    row_l_t: jnp.ndarray    # [P, nnz_pad_t] transpose blocks
    col_t: jnp.ndarray
    val_t: jnp.ndarray
    rows_per_part: int = struct.field(pytree_node=False)
    num_nodes: int = struct.field(pytree_node=False)       # logical N
    nnz: int = struct.field(pytree_node=False)
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    # Optional dedup'd halo-exchange schedule (build_halo_schedule); when
    # present, sharded_spmm exchanges only boundary rows via all_to_all
    # instead of all-gathering the full feature matrix.
    col_h: jnp.ndarray = None       # [P, nnz_pad] concat-space col ids
    send_idx: jnp.ndarray = None    # [P(owner), P(dest), halo_pad]
    col_h_t: jnp.ndarray = None
    send_idx_t: jnp.ndarray = None
    halo_pad: int = struct.field(pytree_node=False, default=0)
    halo_pad_t: int = struct.field(pytree_node=False, default=0)
    halo_rows: int = struct.field(pytree_node=False, default=0)

    @property
    def padded_nodes(self) -> int:
        return self.row_l.shape[0] * self.rows_per_part


def make_graph_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (GRAPH_AXIS,))


def _choose_halo(blocks: dict, exchange: str, n_parts: int) -> dict:
    """Halo-vs-allgather policy, shared by the COO and ELL builders.

    Returns the halo schedule when ``exchange`` forces it, or (``auto``)
    when its padded per-device exchange volume is under half the
    all-gather volume; ``{}`` means full feature all-gather.
    """
    if exchange not in ("allgather", "halo", "auto"):
        raise ValueError(f"unknown exchange mode: {exchange!r}")
    if exchange == "allgather" or n_parts <= 1:
        return {}
    sched = build_halo_schedule(blocks)
    rpp = int(blocks["rows_per_part"])
    # rows actually moved per device per SpMM, padded slabs included
    halo_vol = n_parts * max(sched["halo_pad"], sched["halo_pad_t"])
    allgather_vol = (n_parts - 1) * rpp
    if exchange == "halo" or halo_vol < 0.5 * allgather_vol:
        return sched
    return {}


def make_sharded_coo_op(
    adj_op,
    mesh: Mesh,
    pad_multiple: int = 512,
    boundaries=None,
    exchange: str = "allgather",
) -> ShardedCooOp:
    """Host-side build + device placement of a sharded operator.

    ``exchange``: ``"allgather"`` (full feature all-gather per SpMM),
    ``"halo"`` (dedup'd boundary-row all_to_all — wins when the graph is
    locality-ordered so partitions only reference a thin boundary band), or
    ``"auto"`` (pick halo iff its padded exchange volume is under half the
    all-gather volume).
    """
    n_parts = mesh.devices.size
    blocks = build_sharded_coo(
        adj_op, n_parts, pad_multiple=pad_multiple, boundaries=boundaries
    )
    halo = _choose_halo(blocks, exchange, n_parts)
    shard = NamedSharding(mesh, P(GRAPH_AXIS))
    dev = lambda a: jax.device_put(jnp.asarray(a), shard)
    return ShardedCooOp(
        row_l=dev(blocks["row_l"]),
        col=dev(blocks["col"]),
        val=dev(blocks["val"]),
        row_l_t=dev(blocks["row_l_t"]),
        col_t=dev(blocks["col_t"]),
        val_t=dev(blocks["val_t"]),
        rows_per_part=int(blocks["rows_per_part"]),
        num_nodes=int(blocks["num_nodes"]),
        nnz=int(blocks["nnz"]),
        mesh=mesh,
        col_h=dev(halo["col_h"]) if halo else None,
        send_idx=dev(halo["send_idx"]) if halo else None,
        col_h_t=dev(halo["col_h_t"]) if halo else None,
        send_idx_t=dev(halo["send_idx_t"]) if halo else None,
        halo_pad=int(halo["halo_pad"]) if halo else 0,
        halo_pad_t=int(halo["halo_pad_t"]) if halo else 0,
        halo_rows=int(halo["halo_rows"]) if halo else 0,
    ), blocks["boundaries"]


def shard_node_array(arr: np.ndarray, boundaries, rows_per_part: int, mesh: Mesh):
    """Pad + place a [N, ...] node array row-sharded over the mesh."""
    padded = pad_node_array(np.asarray(arr), boundaries, rows_per_part)
    spec = P(GRAPH_AXIS) if padded.ndim == 1 else P(GRAPH_AXIS, None)
    return jax.device_put(jnp.asarray(padded), NamedSharding(mesh, spec))


def make_sharded_operators(
    adj,
    mesh: Mesh,
    *,
    normalization: str = "row",
    structure_info: bool = False,
    pad_multiple: int = 512,
    exchange: str = "allgather",
    fmt: str = "ell",
    boundaries=None,
    spmm_dtype=None,
    ell_hub_threshold: int | None = None,
):
    """Sharded counterpart of ``ops.graph.precompute_operators``.

    Returns ``(Operators, boundaries, rows_per_part)``; node arrays must be
    placed with ``shard_node_array(arr, boundaries, rows_per_part, mesh)``.
    ``exchange`` selects the SpMM communication pattern (see
    ``make_sharded_coo_op``): full all-gather, dedup'd boundary halo
    all_to_all, or auto by exchanged volume.  ``fmt`` selects the local
    aggregation format: ``"ell"`` (scatter-free bucketed ELL — the
    single-chip perf format, default) or ``"coo"`` (segment-sum).
    ``spmm_dtype`` (e.g. jnp.bfloat16) and ``ell_hub_threshold`` plumb
    the single-chip headline perf config (bf16 gather/exchange rows +
    dense-hub hybrid) into the ELL format — mirroring
    ``ops.graph.precompute_operators``; ignored for ``fmt="coo"`` just
    as the single-chip path ignores them for non-ELL formats.
    """
    from acmgnn_tpu.ops.graph import (
        Operators,
        row_normalized_adjacency,
        sym_normalized_adjacency,
    )

    if normalization == "row":
        adj_low = row_normalized_adjacency(adj)
    elif normalization == "sym":
        adj_low = sym_normalized_adjacency(adj)
    else:
        raise ValueError(f"unknown normalization: {normalization!r}")

    if fmt == "ell":
        make = partial(
            make_sharded_ell_op,
            gather_dtype=jnp.float32 if spmm_dtype is None else spmm_dtype,
            hub_threshold=ell_hub_threshold,
        )
    else:
        make = make_sharded_coo_op
    op_low, boundaries = make(
        adj_low, mesh, pad_multiple, boundaries=boundaries, exchange=exchange
    )
    adj_unnorm_op = None
    if structure_info:
        # Share A_hat's partition so all node activations line up.
        adj_unnorm_op, _ = make(
            adj, mesh, pad_multiple, boundaries=boundaries, exchange=exchange
        )
    return (
        Operators(adj_low=op_low, adj_unnorm=adj_unnorm_op),
        boundaries,
        op_low.rows_per_part,
    )


class ShardedEllOp(struct.PyTreeNode):
    """Row-partitioned bucketed-ELL operator (+ transpose).

    The multi-chip counterpart of ``ops.ell.EllOp``: per-device
    scatter-free aggregation (gather + dense slot-sum — ~2.7x over the
    COO segment-sum on TPU, PERF.md) under the same exchange patterns as
    ``ShardedCooOp`` (full feature all-gather, or the dedup'd boundary
    halo all_to_all when a schedule is present).  Plane shapes are
    identical across devices (power-of-two degree classes padded to the
    max row count per class — ``partition.build_sharded_ell``), so the
    shard_map program is uniform.
    """

    cls_cols: tuple        # per class: [P, nchunks, kc, n_rows] int32
    cls_vals: tuple        # per class: [P, nchunks, kc, n_rows] gather-dtype
    inv_perm: jnp.ndarray  # [P, rows_per_part] into per-device concat
    cls_cols_t: tuple
    cls_vals_t: tuple
    inv_perm_t: jnp.ndarray
    cls_kc: tuple = struct.field(pytree_node=False)
    cls_kc_t: tuple = struct.field(pytree_node=False)
    rows_per_part: int = struct.field(pytree_node=False)
    num_nodes: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    # halo exchange (None => full all-gather); columns are then in the
    # concat space [own block | halo slabs] (partition.build_halo_schedule)
    send_idx: jnp.ndarray = None     # [P(owner), P(dest), halo_pad]
    send_idx_t: jnp.ndarray = None
    halo_pad: int = struct.field(pytree_node=False, default=0)
    halo_pad_t: int = struct.field(pytree_node=False, default=0)
    gather_dtype: object = struct.field(
        pytree_node=False, default=jnp.float32
    )
    # dense hub blocks (power-law fix, partition.build_sharded_ell):
    # [P, n_hub, width] rows consumed by one MXU matmul per device
    hub_mat: jnp.ndarray = None
    hub_mat_t: jnp.ndarray = None
    # VALUE-FREE halves (the sharded port of ops/ell.py
    # EllHalf.row_scale/pre_scale — VERDICT r4 item #1): when a half is
    # value-free its ``cls_vals``/``cls_vals_t`` entries are None (the
    # slot-sum is pure gather+add; no per-edge multiply, half the plane
    # HBM bytes) and exactly one of these [P, rows_per_part] slabs is
    # set: ``row_scale`` applies per OUTPUT row after the inverse
    # permutation (row-uniform operators; hub rows carry 1.0),
    # ``pre_scale`` scales the OPERAND slab before the exchange
    # (column-uniform operators = the transpose; hub rows binarized).
    row_scale: jnp.ndarray = None
    pre_scale: jnp.ndarray = None
    row_scale_t: jnp.ndarray = None
    pre_scale_t: jnp.ndarray = None

    @property
    def padded_nodes(self) -> int:
        return self.inv_perm.shape[0] * self.rows_per_part


def make_sharded_ell_op(
    adj_op,
    mesh: Mesh,
    pad_multiple: int = 512,
    boundaries=None,
    exchange: str = "allgather",
    gather_dtype=jnp.float32,
    hub_threshold: int | None = None,
):
    """Host-side build + placement of a sharded bucketed-ELL operator.

    Same partition/exchange semantics as ``make_sharded_coo_op``; the
    local aggregation format is the scatter-free bucketed ELL.
    ``hub_threshold`` resolves like the single-chip ``make_ell_op``
    (None = env ``ACMGNN_ELL_HUB``, default 2048 = auto; <= 0 disables):
    rows at or above it become per-partition dense MXU blocks instead of
    gather descriptors — the power-law hub fix, now format-identical to
    the single-chip perf config.
    """
    import os

    import scipy.sparse as sp

    from acmgnn_tpu.ops.ell import _row_uniform_values
    from acmgnn_tpu.parallel.partition import build_sharded_ell

    if hub_threshold is None:
        hub_threshold = int(os.environ.get("ACMGNN_ELL_HUB", "2048"))
    hub_threshold = max(hub_threshold, 0)

    # Value-free half detection — identical policy to the single-chip
    # make_ell_op (ops/ell.py; ACMGNN_ELL_UNIFORM=0 opts out): operators
    # with per-ROW-uniform values (row-normalized A_hat, binary
    # adjacency) drop their value planes; the transpose of a row-uniform
    # matrix is per-COLUMN uniform, so its half scales the operand
    # before the exchange instead.  Row partitioning preserves complete
    # rows, so global uniformity == per-partition uniformity.
    uniform_on = os.environ.get("ACMGNN_ELL_UNIFORM", "1") == "1"
    scale_fwd = scale_bwd = None
    if uniform_on:
        csr = sp.csr_matrix(adj_op)
        csr.sort_indices()
        scale_fwd = _row_uniform_values(csr)
        csr_t = csr.T.tocsr()
        csr_t.sort_indices()
        scale_bwd = _row_uniform_values(csr_t)
    if scale_bwd is not None:
        bwd_scale = dict(uniform_scale=scale_bwd, scale_mode="post")
    elif scale_fwd is not None:
        bwd_scale = dict(uniform_scale=scale_fwd, scale_mode="pre")
    else:
        bwd_scale = {}
    fwd_scale = (
        dict(uniform_scale=scale_fwd, scale_mode="post")
        if scale_fwd is not None else {}
    )

    n_parts = mesh.devices.size
    blocks = build_sharded_coo(
        adj_op, n_parts, pad_multiple=pad_multiple, boundaries=boundaries
    )
    rpp = int(blocks["rows_per_part"])
    halo = _choose_halo(blocks, exchange, n_parts)
    if halo:
        blocks = dict(blocks, col_h=halo["col_h"], col_h_t=halo["col_h_t"])
    # Transpose plane sharing, mirroring the single-chip make_ell_op
    # (ops/ell.py): when the binary structure is symmetric the transpose
    # block triplets are identical to the forward's (undirected A+I —
    # same rows, same column indices, same halo schedule), so a
    # value-free backward half reuses the forward's cols planes and
    # inverse permutation BY REFERENCE (one device buffer, not two —
    # halving the sharded operator's index-plane HBM) and only swaps the
    # scale mode (operand pre-scale before the exchange) plus a
    # binarized hub block.  ACMGNN_ELL_SHARE_T=0 disables for A/B.
    ck, ck_t = ("col_h", "col_h_t") if halo else ("col", "col_t")
    share_struct = (
        os.environ.get("ACMGNN_ELL_SHARE_T", "1") == "1"
        and np.array_equal(blocks["row_l_t"], blocks["row_l"])
        and np.array_equal(blocks[ck_t], blocks[ck])
        and (not halo
             or int(halo["halo_pad_t"]) == int(halo["halo_pad"]))
    )
    # fully symmetric matrix (values too: binary structure operator,
    # symmetric normalization): the backward half IS the forward half
    share_full = share_struct and np.array_equal(
        blocks["val_t"], blocks["val"]
    )
    share_t = (
        share_struct
        and not share_full
        and scale_fwd is not None
        and scale_bwd is None
    )
    if halo:
        fwd = build_sharded_ell(
            blocks, col_key="col_h",
            n_cols=rpp + n_parts * int(halo["halo_pad"]),
            hub_threshold=hub_threshold, plane_dtype=gather_dtype,
            **fwd_scale,
        )
        bwd = None if (share_t or share_full) else build_sharded_ell(
            blocks, col_key="col_h_t", row_key="row_l_t", val_key="val_t",
            n_cols=rpp + n_parts * int(halo["halo_pad_t"]),
            hub_threshold=hub_threshold, plane_dtype=gather_dtype,
            **bwd_scale,
        )
    else:
        fwd = build_sharded_ell(
            blocks, hub_threshold=hub_threshold, plane_dtype=gather_dtype,
            **fwd_scale,
        )
        bwd = None if (share_t or share_full) else build_sharded_ell(
            blocks, col_key="col_t", row_key="row_l_t", val_key="val_t",
            hub_threshold=hub_threshold, plane_dtype=gather_dtype,
            **bwd_scale,
        )
    shard = NamedSharding(mesh, P(GRAPH_AXIS))
    dev = lambda a: (  # noqa: E731
        None if a is None else jax.device_put(jnp.asarray(a), shard)
    )
    cls_cols = tuple(dev(c) for c, _, _ in fwd["classes"])
    cls_vals = tuple(dev(v) for _, v, _ in fwd["classes"])
    inv_perm = dev(fwd["inv_perm"])
    hub_f = dev(fwd["hub_mat"])
    rs_f = dev(fwd["row_scale"])
    ps_f = dev(fwd["pre_scale"])
    if share_full:
        cls_cols_t, cls_vals_t, inv_perm_t = cls_cols, cls_vals, inv_perm
        kc_t = tuple(k for _, _, k in fwd["classes"])
        hub_t, rs_t, ps_t = hub_f, rs_f, ps_f
    elif share_t:
        hub_bin = None
        if fwd["hub_mat"] is not None:
            # pre-scale mode hub rows hold the binary structure (the
            # matmul consumes the pre-scaled operand; ops/ell.py)
            hub_np = np.asarray(fwd["hub_mat"])
            hub_bin = (hub_np != 0).astype(hub_np.dtype)
        pre_slab = pad_node_array(
            np.asarray(scale_fwd, np.float32), blocks["boundaries"], rpp
        ).reshape(n_parts, rpp)
        cls_cols_t, cls_vals_t, inv_perm_t = cls_cols, cls_vals, inv_perm
        kc_t = tuple(k for _, _, k in fwd["classes"])
        hub_t, rs_t, ps_t = dev(hub_bin), None, dev(pre_slab)
    else:
        cls_cols_t = tuple(dev(c) for c, _, _ in bwd["classes"])
        cls_vals_t = tuple(dev(v) for _, v, _ in bwd["classes"])
        inv_perm_t = dev(bwd["inv_perm"])
        kc_t = tuple(k for _, _, k in bwd["classes"])
        hub_t = dev(bwd["hub_mat"])
        rs_t = dev(bwd["row_scale"])
        ps_t = dev(bwd["pre_scale"])
    return ShardedEllOp(
        cls_cols=cls_cols,
        cls_vals=cls_vals,
        inv_perm=inv_perm,
        cls_cols_t=cls_cols_t,
        cls_vals_t=cls_vals_t,
        inv_perm_t=inv_perm_t,
        cls_kc=tuple(k for _, _, k in fwd["classes"]),
        cls_kc_t=kc_t,
        rows_per_part=rpp,
        num_nodes=int(blocks["num_nodes"]),
        nnz=int(blocks["nnz"]),
        mesh=mesh,
        send_idx=dev(halo["send_idx"]) if halo else None,
        send_idx_t=dev(halo["send_idx_t"]) if halo else None,
        halo_pad=int(halo["halo_pad"]) if halo else 0,
        halo_pad_t=int(halo["halo_pad_t"]) if halo else 0,
        gather_dtype=gather_dtype,
        hub_mat=hub_f,
        hub_mat_t=hub_t,
        row_scale=rs_f,
        pre_scale=ps_f,
        row_scale_t=rs_t,
        pre_scale_t=ps_t,
    ), blocks["boundaries"]


def _local_ell_aggregate(cls_cols, cls_vals, cls_kc, inv_perm, x_cat,
                         hub_mat=None, row_scale=None, value_free=False):
    """Per-device scatter-free aggregation over the class planes.

    ``hub_mat`` (optional [1, n_hub, width] local dense block): hub rows
    ride one MXU matmul — they lead the concat, matching ``inv_perm``'s
    [hub | classes | zero] layout (same scheme as ops/ell.py
    ``_half_spmm``).  ``value_free`` halves carry no value planes
    (``cls_vals`` entries are None): one zero row is appended to the
    operand concat (pad slots index it) and ``row_scale`` (optional
    [1, rows_per_part] local slab) applies the per-row scalar once
    after the inverse permutation."""
    from acmgnn_tpu.ops.ell import EllBucket, _bucket_spmm

    parts = []
    if hub_mat is not None:
        parts.append(
            jnp.dot(
                hub_mat[0].astype(x_cat.dtype), x_cat,
                preferred_element_type=jnp.float32,
            )
        )
    x_pl = x_cat
    if value_free:
        # value-free pad slots index this appended zero row (== width)
        x_pl = jnp.concatenate(
            [x_cat, jnp.zeros((1, x_cat.shape[1]), x_cat.dtype)], axis=0
        )
    parts += [
        _bucket_spmm(
            EllBucket(cols=c[0], vals=None if v is None else v[0], kc=kc),
            x_pl,
        )
        for c, v, kc in zip(cls_cols, cls_vals, cls_kc)
    ]
    parts.append(jnp.zeros((1, x_cat.shape[1]), jnp.float32))
    concat = jnp.concatenate(parts, axis=0)
    out = jnp.take(concat, inv_perm[0], axis=0)
    if row_scale is not None:
        out = out * row_scale[0][:, None]
    return out


def _pre_scale_block(x_block, pre_scale, gather_dtype):
    """Column-uniform value-free halves scale the operand slab BEFORE
    the exchange (``A_hat^T g = B^T (s ⊙ g)``): remote consumers then
    receive already-scaled rows, and the hub matmul (binarized rows)
    consumes the same scaled concat.  f32 multiply, one rounding into
    the gather dtype — the same rounding count as the per-edge valued
    multiply it replaces (ops/ell.py ``_half_spmm``)."""
    if pre_scale is None:
        return x_block.astype(gather_dtype)
    return (
        x_block.astype(jnp.float32) * pre_scale[0][:, None]
    ).astype(gather_dtype)


def _spmm_shardmap_ell(cls_cols, cls_vals, cls_kc, inv_perm, hub_mat, x,
                       mesh, gather_dtype, row_scale=None, pre_scale=None,
                       value_free=False):
    def body(cls_cols, cls_vals, inv_perm, hub_mat, row_scale, pre_scale,
             x_block):
        x_full = jax.lax.all_gather(
            _pre_scale_block(x_block, pre_scale, gather_dtype),
            GRAPH_AXIS, axis=0, tiled=True,
        )
        return _local_ell_aggregate(
            cls_cols, cls_vals, cls_kc, inv_perm, x_full, hub_mat,
            row_scale, value_free,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )(cls_cols, cls_vals, inv_perm, hub_mat, row_scale, pre_scale, x)


def _spmm_shardmap_ell_halo(cls_cols, cls_vals, cls_kc, inv_perm, hub_mat,
                            send_idx, x, mesh, halo_pad, gather_dtype,
                            row_scale=None, pre_scale=None,
                            value_free=False):
    def body(cls_cols, cls_vals, inv_perm, hub_mat, send_idx, row_scale,
             pre_scale, x_block):
        send_idx = send_idx[0]  # [P, halo_pad]
        n_parts = send_idx.shape[0]
        xs = _pre_scale_block(x_block, pre_scale, gather_dtype)
        send = jnp.take(xs, send_idx.reshape(-1), axis=0)
        send = send.reshape(n_parts, halo_pad, xs.shape[1])
        halo = jax.lax.all_to_all(
            send, GRAPH_AXIS, split_axis=0, concat_axis=0
        )
        x_cat = jnp.concatenate(
            [xs, halo.reshape(n_parts * halo_pad, xs.shape[1])], axis=0
        )
        return _local_ell_aggregate(
            cls_cols, cls_vals, cls_kc, inv_perm, x_cat, hub_mat,
            row_scale, value_free,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS),
                  P(GRAPH_AXIS), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )(cls_cols, cls_vals, inv_perm, hub_mat, send_idx, row_scale,
      pre_scale, x)


def sharded_ell_spmm_transpose(op: ShardedEllOp, g: jnp.ndarray,
                               mesh: Mesh = None) -> jnp.ndarray:
    """``A^T @ g`` over the transpose planes — the single definition used
    by both the custom-VJP backward and ``ops.spmm.spmm_transpose``."""
    mesh = op.mesh if mesh is None else mesh
    vf = op.row_scale_t is not None or op.pre_scale_t is not None
    if op.send_idx_t is not None:
        return _spmm_shardmap_ell_halo(
            op.cls_cols_t, op.cls_vals_t, op.cls_kc_t, op.inv_perm_t,
            op.hub_mat_t, op.send_idx_t, g, mesh, op.halo_pad_t,
            op.gather_dtype, op.row_scale_t, op.pre_scale_t, vf,
        )
    return _spmm_shardmap_ell(
        op.cls_cols_t, op.cls_vals_t, op.cls_kc_t, op.inv_perm_t,
        op.hub_mat_t, g, mesh, op.gather_dtype,
        op.row_scale_t, op.pre_scale_t, vf,
    )


def sharded_ell_spmm(op: ShardedEllOp, x: jnp.ndarray,
                     mesh: Mesh) -> jnp.ndarray:
    """``A @ x`` over the sharded bucketed-ELL operator; the custom VJP
    runs the transpose planes, mirroring ``sharded_spmm``."""

    @jax.custom_vjp
    def _spmm(op_, x_):
        vf = op_.row_scale is not None or op_.pre_scale is not None
        if op_.send_idx is not None:
            return _spmm_shardmap_ell_halo(
                op_.cls_cols, op_.cls_vals, op_.cls_kc, op_.inv_perm,
                op_.hub_mat, op_.send_idx, x_, mesh, op_.halo_pad,
                op_.gather_dtype, op_.row_scale, op_.pre_scale, vf,
            )
        return _spmm_shardmap_ell(
            op_.cls_cols, op_.cls_vals, op_.cls_kc, op_.inv_perm,
            op_.hub_mat, x_, mesh, op_.gather_dtype,
            op_.row_scale, op_.pre_scale, vf,
        )

    def _fwd(op_, x_):
        return _spmm(op_, x_), op_

    def _bwd(op_, g):
        dx = sharded_ell_spmm_transpose(op_, g, mesh)
        return jax.tree_util.tree_map(jnp.zeros_like, op_), dx

    _spmm.defvjp(_fwd, _bwd)
    return _spmm(op, x)


def _local_spmm(row_l, col, val, x_block, mesh, rows_per_part):
    """Per-device body: all-gather features, local gather+segment-sum."""
    row_l = row_l[0]
    col = col[0]
    val = val[0]
    x_full = jax.lax.all_gather(x_block, GRAPH_AXIS, axis=0, tiled=True)
    gathered = jnp.take(x_full, col, axis=0) * val[:, None]
    # sentinel rows (== rows_per_part) fall outside num_segments -> dropped
    return jax.ops.segment_sum(
        gathered, row_l, num_segments=rows_per_part, indices_are_sorted=True
    )


def _local_spmm_halo(row_l, col_h, val, send_idx, x_block, mesh, rows_per_part):
    """Per-device body, halo mode: exchange only dedup'd boundary rows.

    ``send_idx[0]`` is this owner's [P, halo_pad] send lists; the
    all_to_all delivers slab q (what owner q sent us) into slot q, and
    ``col_h`` indexes the concat ``[own block | halo slabs]`` directly.
    Unused slots carry row 0 and are never referenced.
    """
    row_l = row_l[0]
    col_h = col_h[0]
    val = val[0]
    send_idx = send_idx[0]  # [P, halo_pad]
    n_parts, halo_pad = send_idx.shape
    send = jnp.take(x_block, send_idx.reshape(-1), axis=0)
    send = send.reshape(n_parts, halo_pad, x_block.shape[1])
    halo = jax.lax.all_to_all(send, GRAPH_AXIS, split_axis=0, concat_axis=0)
    x_cat = jnp.concatenate(
        [x_block, halo.reshape(n_parts * halo_pad, x_block.shape[1])], axis=0
    )
    gathered = jnp.take(x_cat, col_h, axis=0) * val[:, None]
    return jax.ops.segment_sum(
        gathered, row_l, num_segments=rows_per_part, indices_are_sorted=True
    )


def _spmm_shardmap(row_l, col, val, x, mesh, rows_per_part):
    fn = partial(_local_spmm, mesh=mesh, rows_per_part=rows_per_part)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )(row_l, col, val, x)


def _spmm_shardmap_halo(row_l, col_h, val, send_idx, x, mesh, rows_per_part):
    fn = partial(_local_spmm_halo, mesh=mesh, rows_per_part=rows_per_part)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS),
            P(GRAPH_AXIS, None),
        ),
        out_specs=P(GRAPH_AXIS, None),
    )(row_l, col_h, val, send_idx, x)


def sharded_spmm_transpose(op: ShardedCooOp, g: jnp.ndarray,
                           mesh: Mesh = None) -> jnp.ndarray:
    """``A^T @ g`` over the transpose blocks — the single definition used
    by both the custom-VJP backward and ``ops.spmm.spmm_transpose``."""
    mesh = op.mesh if mesh is None else mesh
    if op.col_h_t is not None:
        return _spmm_shardmap_halo(
            op.row_l_t, op.col_h_t, op.val_t, op.send_idx_t, g,
            mesh, op.rows_per_part,
        )
    return _spmm_shardmap(
        op.row_l_t, op.col_t, op.val_t, g, mesh, op.rows_per_part
    )


def sharded_spmm(op: ShardedCooOp, x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """``A @ x`` with x row-sharded [padded_nodes, d]; custom VJP uses the
    transpose blocks so backward has identical structure to forward.
    Uses the dedup'd halo exchange when the op carries a schedule."""

    @jax.custom_vjp
    def _spmm(op_, x_):
        if op_.col_h is not None:
            return _spmm_shardmap_halo(
                op_.row_l, op_.col_h, op_.val, op_.send_idx, x_,
                mesh, op_.rows_per_part,
            )
        return _spmm_shardmap(
            op_.row_l, op_.col, op_.val, x_, mesh, op_.rows_per_part
        )

    def _fwd(op_, x_):
        return _spmm(op_, x_), op_

    def _bwd(op_, g):
        dx = sharded_spmm_transpose(op_, g, mesh)
        return jax.tree_util.tree_map(jnp.zeros_like, op_), dx

    _spmm.defvjp(_fwd, _bwd)
    return _spmm(op, x)
