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
