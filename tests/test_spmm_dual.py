"""spmm_dual fusion + bf16 gather-dtype tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acmgnn_tpu.ops.ell import ell_spmm, make_ell_op
from acmgnn_tpu.ops.graph import (
    make_coo_op,
    make_dense_op,
    row_normalized_adjacency,
)
from acmgnn_tpu.ops.spmm import spmm_dual


@pytest.mark.parametrize("fmt", ["dense", "coo", "ell"])
def test_spmm_dual_matches_separate(small_graph, fmt):
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    if fmt == "dense":
        op = make_dense_op(a_hat)
    elif fmt == "coo":
        op = make_coo_op(a_hat)
    else:
        op = make_ell_op(a_hat, kc=4, min_bucket_rows=8)
    rng = np.random.default_rng(0)
    zl = jnp.asarray(rng.normal(size=features.shape).astype(np.float32))
    zh = jnp.asarray(rng.normal(size=features.shape).astype(np.float32))

    low, high = spmm_dual(op, zl, zh)
    dense = np.asarray(a_hat.todense()).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(low), dense @ np.asarray(zl), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(high),
        np.asarray(zh) - dense @ np.asarray(zh),
        rtol=1e-4,
        atol=1e-5,
    )


def test_spmm_dual_gradients(small_graph):
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op = make_ell_op(a_hat, kc=4, min_bucket_rows=8)
    rng = np.random.default_rng(1)
    zl = jnp.asarray(rng.normal(size=features.shape).astype(np.float32))
    zh = jnp.asarray(rng.normal(size=features.shape).astype(np.float32))

    def loss(zl_, zh_):
        low, high = spmm_dual(op, zl_, zh_)
        return jnp.sum(jnp.sin(low) + jnp.cos(high))

    gl, gh = jax.grad(loss, argnums=(0, 1))(zl, zh)

    dense = jnp.asarray(np.asarray(a_hat.todense()).astype(np.float32))

    def loss_ref(zl_, zh_):
        return jnp.sum(jnp.sin(dense @ zl_) + jnp.cos(zh_ - dense @ zh_))

    rl, rh = jax.grad(loss_ref, argnums=(0, 1))(zl, zh)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh), rtol=1e-4,
                               atol=1e-5)


def test_ell_bf16_gather_dtype(small_graph):
    """bf16 gather with f32 accumulation: close to f32 result."""
    adj, features, _ = small_graph
    a_hat = row_normalized_adjacency(adj)
    op32 = make_ell_op(a_hat, kc=4, min_bucket_rows=8)
    op16 = make_ell_op(
        a_hat, kc=4, min_bucket_rows=8, gather_dtype=jnp.bfloat16
    )
    x = jnp.asarray(features)
    out32 = np.asarray(ell_spmm(op32, x))
    out16 = np.asarray(ell_spmm(op16, x))
    assert out16.dtype == np.float32
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() < 0.02 * max(scale, 1.0)

    # grads flow through the bf16 path too
    g = jax.grad(lambda x_: jnp.sum(ell_spmm(op16, x_)))(x)
    assert np.isfinite(np.asarray(g)).all()
