"""Pallas fused dual-channel dense kernel — interpret-mode CI tests.

Compiled-mode correctness/perf is exercised on real TPU via the probes in
PERF.md; interpret mode keeps the kernel verified everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acmgnn_tpu.ops.pallas_kernels import fused_dual_spmm


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    n, d = 200, 20
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) * 0.1)
    zl = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    zh = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return a, zl, zh


def test_fused_dual_forward(case):
    a, zl, zh = case
    ol, oh = fused_dual_spmm(a, zl, zh, True)  # interpret=True
    np.testing.assert_allclose(
        np.asarray(ol), np.asarray(a) @ np.asarray(zl), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(oh),
        np.asarray(zh) - np.asarray(a) @ np.asarray(zh),
        rtol=1e-5,
        atol=1e-5,
    )


def test_fused_dual_backward(case):
    a, zl, zh = case

    def loss(zl_, zh_):
        ol, oh = fused_dual_spmm(a, zl_, zh_, True)
        return jnp.sum(jnp.sin(ol) + jnp.cos(oh))

    gl, gh = jax.grad(loss, argnums=(0, 1))(zl, zh)

    def loss_ref(zl_, zh_):
        return jnp.sum(jnp.sin(a @ zl_) + jnp.cos(zh_ - a @ zh_))

    rl, rh = jax.grad(loss_ref, argnums=(0, 1))(zl, zh)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh), rtol=1e-4,
                               atol=1e-5)


def test_unaligned_shapes(case):
    """Padding must handle non-multiple-of-tile N and D."""
    rng = np.random.default_rng(1)
    n, d = 131, 7
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) * 0.1)
    zl = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    zh = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ol, oh = fused_dual_spmm(a, zl, zh, True)
    assert ol.shape == (n, d) and oh.shape == (n, d)
    np.testing.assert_allclose(
        np.asarray(ol), np.asarray(a) @ np.asarray(zl), rtol=1e-5, atol=1e-5
    )
