"""SpMM — the single hot kernel of the ACM-GNN family.

The reference delegates this to ``torch.spmm`` (CUDA COO SpMM; call sites
/root/reference/ACM-Pytorch/models/layers.py:163-194). On TPU:

- Dense operators ride the MXU directly (``A_hat @ x`` is a plain matmul —
  for the small/medium heterophily benchmarks this is speed-of-light).
- COO operators use gather + ``segment_sum``; the backward pass is
  ``A^T g``, which is *its own* sorted-COO SpMM over the transpose triplets
  precomputed on host (``CooOp.row_t/col_t/val_t``).  A ``jax.custom_vjp``
  wires the two together, so the autodiff graph never materializes a
  scatter-transpose.

The high-pass product ``(I - A_hat) z`` is always computed as
``z - spmm(adj_low, z)`` (``spmm_high``) — same math as the reference's
explicit ``adj_high`` operand, half the sparse work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from acmgnn_tpu.ops.graph import CooOp, DenseOp, SparseOp


# ---------------------------------------------------------------------------
# COO SpMM with custom VJP
# ---------------------------------------------------------------------------


def _coo_matvec_rows(row, col, val, x, num_nodes):
    """segment-sum SpMM core: out[r] = sum_{k: row[k]==r} val[k] * x[col[k]]."""
    gathered = jnp.take(x, col, axis=0) * val[:, None]
    return jax.ops.segment_sum(
        gathered,
        row,
        num_segments=num_nodes,
        indices_are_sorted=True,
    )


@jax.custom_vjp
def _coo_spmm(op: CooOp, x: jnp.ndarray) -> jnp.ndarray:
    return _coo_matvec_rows(op.row, op.col, op.val, x, op.num_nodes)


def _coo_spmm_fwd(op, x):
    return _coo_spmm(op, x), op


def _coo_spmm_bwd(op, g):
    # d/dx [A x] = A^T g — a forward-structured SpMM over the transpose.
    dx = _coo_matvec_rows(op.row_t, op.col_t, op.val_t, g, op.num_nodes)
    # The operator itself is data, not a differentiable parameter.
    zero_op = jax.tree_util.tree_map(jnp.zeros_like, op)
    return zero_op, dx


_coo_spmm.defvjp(_coo_spmm_fwd, _coo_spmm_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def spmm(op: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """``op @ x`` for any supported operator format."""
    from acmgnn_tpu.ops.ell import EllOp, ell_spmm

    if isinstance(op, DenseOp):
        return jnp.dot(op.mat, x, preferred_element_type=x.dtype)
    if isinstance(op, CooOp):
        return _coo_spmm(op, x)
    if isinstance(op, EllOp):
        return ell_spmm(op, x)
    # Sharded multi-chip operators — imported lazily to avoid a cycle.
    from acmgnn_tpu.parallel.sharded import (
        ShardedCooOp,
        ShardedEllOp,
        sharded_ell_spmm,
        sharded_spmm,
    )

    if isinstance(op, ShardedCooOp):
        return sharded_spmm(op, x, op.mesh)
    if isinstance(op, ShardedEllOp):
        return sharded_ell_spmm(op, x, op.mesh)
    raise TypeError(f"unsupported operator type: {type(op)!r}")


def spmm_high(op_low: SparseOp, x: jnp.ndarray) -> jnp.ndarray:
    """``(I - A_hat) @ x`` computed as ``x - A_hat @ x``.

    Bit-for-bit this differs from the reference's explicit ``adj_high``
    SpMM only in floating-point association; mathematically identical
    (adj_high construction: /root/reference/ACM-Pytorch/utils.py:622,627).
    """
    return x - spmm(op_low, x)


def spmm_transpose(op: SparseOp, g: jnp.ndarray) -> jnp.ndarray:
    """``op^T @ g`` via the precomputed transpose structures."""
    from acmgnn_tpu.ops.ell import EllOp, _half_spmm

    if isinstance(op, DenseOp):
        return jnp.dot(op.mat.T, g, preferred_element_type=g.dtype)
    if isinstance(op, CooOp):
        return _coo_matvec_rows(op.row_t, op.col_t, op.val_t, g, op.num_nodes)
    if isinstance(op, EllOp):
        return _half_spmm(op.bwd, g.astype(op.gather_dtype), pack=op.pack)
    from acmgnn_tpu.parallel.sharded import (
        ShardedCooOp,
        ShardedEllOp,
        sharded_ell_spmm_transpose,
        sharded_spmm_transpose,
    )

    if isinstance(op, ShardedCooOp):
        return sharded_spmm_transpose(op, g)
    if isinstance(op, ShardedEllOp):
        return sharded_ell_spmm_transpose(op, g)
    raise TypeError(f"unsupported operator type: {type(op)!r}")


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _prefix_grad_spmm(op, z_cat, grad_width):
    """``op @ z_cat`` where only the first ``grad_width`` feature columns
    are differentiable — the paired train/eval forward's fused gather.
    The eval columns' cotangents are structurally zero (they only feed
    metrics), so the backward transposes just the train prefix instead of
    dragging zero columns through the gather."""
    return spmm(op, z_cat)


def _prefix_grad_fwd(op, z_cat, grad_width):
    return spmm(op, z_cat), (op, z_cat.shape[1])


def _prefix_grad_bwd(grad_width, res, g):
    op, total = res
    dz_prefix = spmm_transpose(op, g[:, :grad_width])
    dz = jnp.pad(dz_prefix, ((0, 0), (0, total - grad_width)))
    return jax.tree_util.tree_map(jnp.zeros_like, op), dz


_prefix_grad_spmm.defvjp(_prefix_grad_fwd, _prefix_grad_bwd)


def spmm_multi(op_low: SparseOp, zs, high_pass_flags, grad_prefix=None):
    """Batched ACM aggregation: one gather serves ANY number of channel
    matrices that share the operator (they always do within a layer, and
    across the train/eval branch pair in the joint training loop).

    ``zs``: list of [N, d_i] matrices; ``high_pass_flags[i]`` selects
    ``z_i - A z_i`` (the I-A_hat identity trick) instead of ``A z_i``.
    Gather-based formats concat along features — the SpMM is
    descriptor-bound on TPU (PERF.md), so k fused channels cost ~1/k of
    separate calls.  Dense operators just loop (MXU handles it).

    ``grad_prefix``: if set, only the first ``grad_prefix`` entries of
    ``zs`` are differentiable (the paired eval branch's entries carry no
    gradient) — the backward transposes just that prefix.

    Dense operators take the same fused path: one ``[N, N] @ [N, Σd_i]``
    MXU matmul reads the operator (the dominant operand at N >> d) once
    instead of once per channel.
    """
    dims = [z.shape[1] for z in zs]
    z_cat = jnp.concatenate(zs, axis=1)
    if grad_prefix is not None and grad_prefix < len(zs):
        grad_width = sum(dims[:grad_prefix])
        both = _prefix_grad_spmm(op_low, z_cat, grad_width)
    else:
        both = spmm(op_low, z_cat)
    outs = []
    offset = 0
    for z, d, hp in zip(zs, dims, high_pass_flags):
        az = both[:, offset : offset + d]
        outs.append(z - az if hp else az)
        offset += d
    return outs


def spmm_dual(op_low: SparseOp, z_low: jnp.ndarray, z_high: jnp.ndarray):
    """Fused ACM channel aggregation: ``(A z_low, z_high - A z_high)``.

    The two products share the operator's column indices, so for
    gather-based formats both are computed from ONE gather over
    ``concat([z_low, z_high], axis=1)`` — same nnz traffic but twice the
    gather row width (512B rows DMA far better than 256B) and half the
    index processing.  Backward inherits the same fusion through the
    concat/split.  Dense operators ride the same concat (one matmul
    reads the [N, N] operator once for both channels; a Pallas kernel
    that additionally finalized the subtraction in VMEM measured no
    better and was retired — PERF.md "Ruled out: Pallas fused dual").
    """
    d = z_low.shape[1]
    both = spmm(op_low, jnp.concatenate([z_low, z_high], axis=1))
    return both[:, :d], z_high - both[:, d:]
