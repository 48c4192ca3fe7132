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

from acmgnn_tpu.parallel.partition import build_sharded_coo, pad_node_array

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

    @property
    def padded_nodes(self) -> int:
        return self.row_l.shape[0] * self.rows_per_part


def make_graph_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (GRAPH_AXIS,))


def make_sharded_coo_op(
    adj_op, mesh: Mesh, pad_multiple: int = 512, boundaries=None
) -> ShardedCooOp:
    """Host-side build + device placement of a sharded operator."""
    n_parts = mesh.devices.size
    blocks = build_sharded_coo(
        adj_op, n_parts, pad_multiple=pad_multiple, boundaries=boundaries
    )
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
):
    """Sharded counterpart of ``ops.graph.precompute_operators``.

    Returns ``(Operators, boundaries, rows_per_part)``; node arrays must be
    placed with ``shard_node_array(arr, boundaries, rows_per_part, mesh)``.
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

    op_low, boundaries = make_sharded_coo_op(adj_low, mesh, pad_multiple)
    adj_unnorm_op = None
    if structure_info:
        # Share A_hat's partition so all node activations line up.
        adj_unnorm_op, _ = make_sharded_coo_op(
            adj, mesh, pad_multiple, boundaries=boundaries
        )
    return (
        Operators(adj_low=op_low, adj_unnorm=adj_unnorm_op),
        boundaries,
        op_low.rows_per_part,
    )


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


def _spmm_shardmap(row_l, col, val, x, mesh, rows_per_part):
    fn = partial(_local_spmm, mesh=mesh, rows_per_part=rows_per_part)
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )(row_l, col, val, x)


def sharded_spmm(op: ShardedCooOp, x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """``A @ x`` with x row-sharded [padded_nodes, d]; custom VJP uses the
    transpose blocks so backward has identical structure to forward."""

    @jax.custom_vjp
    def _spmm(op_, x_):
        return _spmm_shardmap(
            op_.row_l, op_.col, op_.val, x_, mesh, op_.rows_per_part
        )

    def _fwd(op_, x_):
        return _spmm(op_, x_), op_

    def _bwd(op_, g):
        dx = _spmm_shardmap(
            op_.row_l_t, op_.col_t, op_.val_t, g, mesh, op_.rows_per_part
        )
        return jax.tree_util.tree_map(jnp.zeros_like, op_), dx

    _spmm.defvjp(_fwd, _bwd)
    return _spmm(op, x)
