"""First-layer input-hoist parity: ``A_hat (X W) == (A_hat X) W``.

The hoist (ACMConv.input_hoist / TrainConfig.hoist_first) re-associates
layer 1's propagation so the eval forward rides a precomputed ``A_hat X``
and the train forward's input gather needs no backward transpose.  It must
be numerically equivalent (up to float association) to the projected path
for every model/format/protocol combination that enables it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acmgnn_tpu.models.models import ACMGNN
from acmgnn_tpu.ops.graph import precompute_operators
from acmgnn_tpu.ops.spmm import spmm
from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import run_experiment


HOIST_MODELS = ("acmgcn", "acmgcnp", "acmgcnpp", "acmsnowball")


def _build(small_graph, model_type, fmt, dropout=0.0, hoist=False):
    adj, features, labels = small_graph
    structure = model_type in ("acmgcnp", "acmgcnpp")
    ops = precompute_operators(adj, fmt=fmt, structure_info=structure)
    x = jnp.asarray(features)
    if hoist:
        ops = ops.replace(x_agg=spmm(ops.adj_low, x))
    model = ACMGNN(
        nhid=8,
        nclass=4,
        model_type=model_type,
        nlayers=2,
        nnodes=adj.shape[0],
        structure_info=structure,
        dropout=dropout,
        hoist_first=hoist,
    )
    return model, ops, x


@pytest.mark.parametrize("model_type", HOIST_MODELS)
@pytest.mark.parametrize("fmt", ["dense", "ell"])
def test_hoist_eval_forward_matches(small_graph, model_type, fmt):
    """Eval forward (precomputed aggregate, zero gathers) == projected."""
    base, ops0, x = _build(small_graph, model_type, fmt, hoist=False)
    hoisted, ops1, _ = _build(small_graph, model_type, fmt, hoist=True)
    params = base.init(jax.random.key(0), x, ops0)
    y0 = base.apply(params, x, ops0)
    y1 = hoisted.apply(params, x, ops1)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("model_type", ("acmgcn", "acmgcnpp"))
@pytest.mark.parametrize("dropout", (0.0, 0.4))
def test_hoist_train_grads_match(small_graph, model_type, dropout):
    """Train loss AND parameter gradients match the projected path.

    dropout=0: train branch consumes the precomputed aggregate.
    dropout>0: train branch hoists via the F-wide input gather (the
    fixture's F=24 <= HOIST_MAX_COLS) with identical dropout masks.
    """
    base, ops0, x = _build(
        small_graph, model_type, "ell", dropout=dropout, hoist=False
    )
    hoisted, ops1, _ = _build(
        small_graph, model_type, "ell", dropout=dropout, hoist=True
    )
    params = base.init(jax.random.key(0), x, ops0)

    def loss(model, ops):
        def f(p):
            logits = model.apply(
                p, x, ops, training=True, rngs={"dropout": jax.random.key(7)}
            )
            return jnp.sum(logits**2)

        return f

    l0, g0 = jax.value_and_grad(loss(base, ops0))(params)
    l1, g1 = jax.value_and_grad(loss(hoisted, ops1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat1[path]),
            rtol=5e-4,
            atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("model_type", ("acmgcn", "acmgcnpp"))
def test_hoist_paired_eval_matches(small_graph, model_type):
    """Joint paired forward: both branches match the unhoisted pair."""
    base, ops0, x = _build(
        small_graph, model_type, "ell", dropout=0.4, hoist=False
    )
    hoisted, ops1, _ = _build(
        small_graph, model_type, "ell", dropout=0.4, hoist=True
    )
    params = base.init(jax.random.key(0), x, ops0)
    kw = dict(
        training=True, paired_eval=True, rngs={"dropout": jax.random.key(3)}
    )
    t0, e0 = base.apply(params, x, ops0, **kw)
    t1, e1 = hoisted.apply(params, x, ops1, **kw)
    np.testing.assert_allclose(
        np.asarray(t0), np.asarray(t1), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(e0), np.asarray(e1), rtol=2e-5, atol=2e-5
    )


def test_hoist_wide_features_fall_back(small_graph):
    """F > HOIST_MAX_COLS with dropout and no valid aggregate: the train
    branch must take the projected path BIT-EXACTLY (no hoist applied)."""
    adj, features, _ = small_graph
    rng = np.random.default_rng(0)
    wide = rng.normal(size=(adj.shape[0], 200)).astype(np.float32)
    ops = precompute_operators(adj, fmt="ell")
    x = jnp.asarray(wide)

    def logits(hoist):
        o = ops.replace(x_agg=spmm(ops.adj_low, x)) if hoist else ops
        m = ACMGNN(nhid=8, nclass=4, dropout=0.4, hoist_first=hoist)
        p = m.init(jax.random.key(0), x, o)
        return m.apply(
            p, x, o, training=True, rngs={"dropout": jax.random.key(5)}
        )

    np.testing.assert_array_equal(
        np.asarray(logits(False)), np.asarray(logits(True))
    )


def test_hoist_end_to_end_accuracy(small_graph):
    """run_experiment with hoist_first reaches the same test accuracy."""
    adj, features, labels = small_graph
    from acmgnn_tpu.ops.graph import GraphData

    data = GraphData(
        name="synthetic", adj=adj, features=features, labels=labels
    )
    common = dict(
        model_type="acmgcn", hidden=8, epochs=40, early_stopping=0,
        num_splits=2, lr=0.05, dropout=0.3, seed=1,
    )
    r0 = run_experiment(data, TrainConfig(**common))
    r1 = run_experiment(data, TrainConfig(hoist_first=True, **common))
    # identical dropout masks + float-association-level deltas only
    assert abs(r0["test_mean"] - r1["test_mean"]) < 0.06


@pytest.mark.parametrize("model_type", ("gcn", "sgc", "snowball"))
def test_hoist_baseline_models_match(small_graph, model_type):
    """gcn/sgc/snowball layer-1 inputs are raw X -> the precomputed
    aggregate is valid even in training; outputs and grads must match."""
    base, ops0, x = _build(
        small_graph, model_type, "ell", dropout=0.4, hoist=False
    )
    hoisted, ops1, _ = _build(
        small_graph, model_type, "ell", dropout=0.4, hoist=True
    )
    params = base.init(jax.random.key(0), x, ops0)
    y0 = base.apply(params, x, ops0)
    y1 = hoisted.apply(params, x, ops1)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-5
    )

    def loss(model, ops):
        def f(p):
            logits = model.apply(
                p, x, ops, training=True, rngs={"dropout": jax.random.key(7)}
            )
            return jnp.sum(logits**2)

        return f

    l0, g0 = jax.value_and_grad(loss(base, ops0))(params)
    l1, g1 = jax.value_and_grad(loss(hoisted, ops1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat1[path]), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_hoist_wide_features_eval_branch(small_graph):
    """F > HOIST_MAX_COLS: the EVAL branch still hoists via the
    precomputed aggregate, now deriving the high channel as
    ``x W_H - (A x) W_H`` (no [N, F] temp — the wiki-2M memory fix).
    Both the plain eval forward and the paired eval branch must match the
    projected path."""
    adj, features, _ = small_graph
    rng = np.random.default_rng(0)
    wide = rng.normal(size=(adj.shape[0], 200)).astype(np.float32)
    ops = precompute_operators(adj, fmt="ell")
    x = jnp.asarray(wide)
    agg = spmm(ops.adj_low, x)

    def build(hoist, x_agg=None):
        o = ops.replace(x_agg=x_agg) if x_agg is not None else ops
        m = ACMGNN(nhid=8, nclass=4, dropout=0.4, hoist_first=hoist)
        return m, o

    base, o0 = build(False)
    params = base.init(jax.random.key(0), x, o0)
    y0 = base.apply(params, x, o0)
    hoisted, o1 = build(True, agg)
    y1 = hoisted.apply(params, x, o1)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=2e-5
    )

    # paired forward: train branch projected (dropout + wide F), eval
    # branch hoisted through the GEMM-difference form
    kw = dict(
        training=True, paired_eval=True, rngs={"dropout": jax.random.key(3)}
    )
    t0, e0 = base.apply(params, x, o0, **kw)
    t1, e1 = hoisted.apply(params, x, o1, **kw)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(
        np.asarray(e0), np.asarray(e1), rtol=2e-5, atol=2e-5
    )

    # bfloat16-stored aggregate (the wiki-2M HBM fix): same math at
    # bf16 rounding of the aggregate only
    hoisted_bf, o2 = build(True, agg.astype(jnp.bfloat16))
    y2 = hoisted_bf.apply(params, x, o2)
    assert y2.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y2), rtol=0.1, atol=0.05
    )


def test_hoist_agg_dtype_resolution():
    """'auto' casts only in the wide-F + bf16-gather + >1GiB regime."""
    import jax.numpy as jnp

    cfg = TrainConfig(hoist_first=True, spmm_dtype="bfloat16")
    # wiki regime: 1.93M x 600 f32 = 4.6 GB -> bf16
    assert cfg.resolve_hoist_agg_dtype(1_925_342, 600) == jnp.bfloat16
    # penn94 regime: 41.6k x 4814 f32 = 0.8 GB -> stays f32
    assert cfg.resolve_hoist_agg_dtype(41_554, 4814) is None
    # narrow features never cast (hoisted gathers are exact f32)
    assert cfg.resolve_hoist_agg_dtype(10_000_000, 64) is None
    # f32 gathers -> f32 aggregate regardless of size
    f32cfg = TrainConfig(hoist_first=True, spmm_dtype="float32")
    assert f32cfg.resolve_hoist_agg_dtype(1_925_342, 600) is None
    # explicit overrides win
    assert TrainConfig(hoist_agg_dtype="bfloat16").resolve_hoist_agg_dtype(
        10, 10
    ) == jnp.bfloat16
    assert TrainConfig(
        hoist_agg_dtype="float32", spmm_dtype="bfloat16"
    ).resolve_hoist_agg_dtype(1_925_342, 600) is None


def test_resolve_hoist_gating():
    """Hoist only fires for variant-0 propagating ACM first layers."""
    assert TrainConfig(hoist_first=True).resolve_hoist()
    assert not TrainConfig(hoist_first=True, variant=True).resolve_hoist()
    assert not TrainConfig(hoist_first=True, model_type="acmsgc").resolve_hoist()
    assert TrainConfig(hoist_first=True, model_type="gcn").resolve_hoist()
    assert not TrainConfig(hoist_first=True, model_type="mlp").resolve_hoist()
    assert not TrainConfig().resolve_hoist()
