"""All 12 reference CLI model types must construct, run, and train."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acmgnn_tpu.models.models import ACMGNN, MODEL_TYPES
from acmgnn_tpu.ops.graph import precompute_operators


@pytest.mark.parametrize("model_type", MODEL_TYPES)
@pytest.mark.parametrize("fmt", ["dense", "ell"])
def test_model_forward_and_grad(small_graph, model_type, fmt):
    adj, features, labels = small_graph
    ops = precompute_operators(
        adj, fmt=fmt, structure_info=(model_type in ("acmgcnp", "acmgcnpp"))
    )
    n, c = adj.shape[0], 4
    model = ACMGNN(
        nhid=8,
        nclass=c,
        model_type=model_type,
        nlayers=2,
        nnodes=n,
        structure_info=(model_type in ("acmgcnp", "acmgcnpp")),
        dropout=0.2,
    )
    x = jnp.asarray(features)
    params = model.init(jax.random.key(0), x, ops)
    out = model.apply(params, x, ops)
    assert out.shape == (n, c)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        logits = model.apply(
            p, x, ops, training=True, rngs={"dropout": jax.random.key(1)}
        )
        return jnp.sum(logits**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least one parameter receives nonzero gradient
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_reference_cli_choices_covered():
    """Every model the reference CLI offers
    (/root/reference/ACM-Pytorch/arg_parser.py:22-41) works here."""
    reference_choices = {
        "gcn", "sgc", "graphsage", "snowball", "gcnII", "acmgcn",
        "acmgcnp", "acmgcnpp", "acmsgc", "acmgraphsage", "acmsnowball",
        "mlp",
    }
    assert reference_choices == set(MODEL_TYPES)


@pytest.mark.parametrize("model_type", ["acmgcn", "acmgcnp", "acmgcnpp"])
def test_gemm_dtype_bf16_close_to_f32(small_graph, model_type):
    """gemm_dtype="bfloat16" rounds only the projection operands (f32
    accumulation), so outputs must track the exact-f32 model closely and
    gradients must stay finite."""
    adj, features, labels = small_graph
    ops = precompute_operators(adj, fmt="ell")
    n, c = adj.shape[0], 4
    kw = dict(nhid=8, nclass=c, model_type=model_type, nnodes=n,
              dropout=0.0)
    m32 = ACMGNN(**kw)
    m16 = ACMGNN(gemm_dtype="bfloat16", **kw)
    x = jnp.asarray(features)
    params = m32.init(jax.random.key(0), x, ops)
    # same parameter pytree drives both (gemm_dtype adds no params)
    out32 = np.asarray(m32.apply(params, x, ops))
    out16 = np.asarray(m16.apply(params, x, ops))
    assert np.isfinite(out16).all()
    scale = np.abs(out32).max() + 1e-6
    assert np.max(np.abs(out32 - out16)) / scale < 0.03

    def loss(p):
        return jnp.sum(m16.apply(p, x, ops) ** 2)

    leaves = jax.tree_util.tree_leaves(jax.grad(loss)(params))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_gemm_dtype_trains_through_runner(small_graph):
    """The knob rides TrainConfig end to end (build_model threads it)."""
    from acmgnn_tpu.ops.graph import GraphData
    from acmgnn_tpu.train.config import TrainConfig
    from acmgnn_tpu.train.trainer import run_experiment

    adj, features, labels = small_graph
    data = GraphData(name="toy", adj=adj, features=features, labels=labels)
    cfg = TrainConfig(
        model_type="acmgcnp", epochs=40, early_stopping=0, num_splits=2,
        operator_format="ell", gemm_dtype="bfloat16",
    )
    out = run_experiment(data, cfg)
    assert 0.0 <= out["test_mean"] <= 1.0
    assert out["epochs_total"] == 80
