"""Pallas TPU kernels.

``fused_dual_spmm``: computes BOTH ACM channel aggregations

    out_low  = A_hat @ z_low
    out_high = z_high - A_hat @ z_high     (the I - A_hat identity trick)

in one pass over the dense operator.  The operator matrix (N x N) is by
far the largest operand in the dense regime (the [N, D] activations are
~N/D times smaller), so reading it once instead of twice halves the
memory-bound cost of the ACM layer's aggregation step.  The backward pass
needs A_hat^T on both channels; the same kernel runs with a
transposed-LHS contraction (dot_general contracting dim 0) so no
transposed copy of the operator is ever materialized.

Kernel structure: grid (row blocks i, contraction blocks k), k innermost;
accumulate both outputs in VMEM across k; on the last k step the
high-pass output is finalized as ``z_high_rowblock - acc``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dual_kernel(a_ref, zl_ref, zh_ref, zh_row_ref, ol_ref, oh_ref,
                 *, transpose_lhs: bool):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        ol_ref[:] = jnp.zeros_like(ol_ref)
        oh_ref[:] = jnp.zeros_like(oh_ref)

    a = a_ref[:]
    if transpose_lhs:
        dims = (((0,), (0,)), ((), ()))  # contract a's rows with z's rows
    else:
        dims = (((1,), (0,)), ((), ()))
    ol_ref[:] += jax.lax.dot_general(
        a, zl_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    oh_ref[:] += jax.lax.dot_general(
        a, zh_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        oh_ref[:] = zh_row_ref[:] - oh_ref[:]


@functools.partial(
    jax.jit, static_argnames=("transpose_lhs", "bm", "bk", "interpret")
)
def _dual_spmm_raw(
    a: jnp.ndarray,
    z_low: jnp.ndarray,
    z_high: jnp.ndarray,
    *,
    transpose_lhs: bool = False,
    bm: int = 256,
    bk: int = 512,
    interpret: bool = False,
):
    """Padded pallas call; a is [N, N], z_* are [N, D]."""
    n, d = z_low.shape
    n_pad = _round_up(n, max(bm, bk))
    d_pad = _round_up(d, 128)

    a_p = jnp.pad(a, ((0, n_pad - n), (0, n_pad - n)))
    zl_p = jnp.pad(z_low, ((0, n_pad - n), (0, d_pad - d)))
    zh_p = jnp.pad(z_high, ((0, n_pad - n), (0, d_pad - d)))

    grid = (n_pad // bm, n_pad // bk)
    if transpose_lhs:
        # block covers A[k-block rows, i-block cols]; contraction over rows
        a_spec = pl.BlockSpec((bk, bm), lambda i, k: (k, i),
                              memory_space=pltpu.VMEM)
    else:
        a_spec = pl.BlockSpec((bm, bk), lambda i, k: (i, k),
                              memory_space=pltpu.VMEM)

    out_l, out_h = pl.pallas_call(
        functools.partial(_dual_kernel, transpose_lhs=transpose_lhs),
        grid=grid,
        in_specs=[
            a_spec,
            pl.BlockSpec((bk, d_pad), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, d_pad), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d_pad), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, d_pad), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d_pad), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * n_pad * d_pad,
            bytes_accessed=4 * (n_pad * n_pad + 4 * n_pad * d_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, zl_p, zh_p, zh_p)
    return out_l[:n, :d], out_h[:n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dual_spmm(a, z_low, z_high, interpret=False):
    """(A @ z_low, z_high - A @ z_high) reading A once.  Differentiable in
    z_low/z_high; A is operator data."""
    return _dual_spmm_raw(a, z_low, z_high, interpret=interpret)


def _fused_fwd(a, z_low, z_high, interpret):
    return _dual_spmm_raw(a, z_low, z_high, interpret=interpret), a


def _fused_bwd(interpret, a, cotangents):
    g_low, g_high = cotangents
    # d z_low = A^T g_low ; d z_high = g_high - A^T g_high
    dzl, dzh = _dual_spmm_raw(
        a, g_low, g_high, transpose_lhs=True, interpret=interpret
    )
    return jnp.zeros_like(a), dzl, dzh


fused_dual_spmm.defvjp(_fused_fwd, _fused_bwd)
