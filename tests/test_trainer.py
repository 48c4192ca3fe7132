"""Training-harness tests: fused split runner, optimizer parity, metrics,
and the Texas end-to-end accuracy slice (BASELINE.json config 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.metrics import (
    masked_accuracy,
    masked_bce_with_logits,
    masked_nll,
    masked_rocauc,
)
from acmgnn_tpu.train.trainer import make_optimizer, run_experiment


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_masked_accuracy():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1, 1, 1])
    mask = jnp.asarray([True, True, True, False])
    acc = float(masked_accuracy(logits, labels, mask))
    assert acc == pytest.approx(2.0 / 3.0)


def test_masked_nll_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 6)
    mask = np.array([1, 1, 0, 1, 0, 1], bool)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=1)
    got = float(masked_nll(lp, jnp.asarray(labels), jnp.asarray(mask)))
    want = -np.mean(
        [np.asarray(lp)[i, labels[i]] for i in range(6) if mask[i]]
    )
    assert got == pytest.approx(want, rel=1e-6)


def test_masked_bce_matches_manual():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(5, 2)).astype(np.float32)
    onehot = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 5)]
    mask = np.array([1, 0, 1, 1, 0], bool)
    got = float(
        masked_bce_with_logits(jnp.asarray(logits), jnp.asarray(onehot), jnp.asarray(mask))
    )
    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    per = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p))
    want = per.mean(axis=1)[mask].mean()
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_rocauc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(2)
    n = 200
    labels = rng.integers(0, 2, n)
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    logits[labels == 1, 1] += 1.0  # informative scores
    # introduce ties
    logits = np.round(logits, 1)
    mask = rng.random(n) < 0.7
    got = float(
        masked_rocauc(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask))
    )
    scores = jax.nn.softmax(jnp.asarray(logits), axis=-1)[:, 1]
    want = sklearn.roc_auc_score(labels[mask], np.asarray(scores)[mask])
    assert got == pytest.approx(want, abs=1e-6)


def test_masked_rocauc_multi_shared_sort():
    """The shared-sort multi-mask AUC equals per-mask masked_rocauc /
    sklearn for masks with overlapping tie groups, binary + multilabel."""
    from acmgnn_tpu.train.metrics import masked_rocauc_multi

    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(5)
    n = 300
    labels = rng.integers(0, 2, n)
    logits = np.round(rng.normal(size=(n, 2)), 1).astype(np.float32)
    logits[labels == 1, 1] += 1.0
    masks = tuple((rng.random(n) < p) for p in (0.5, 0.25, 0.25))
    got = masked_rocauc_multi(
        jnp.asarray(logits), jnp.asarray(labels), tuple(map(jnp.asarray, masks))
    )
    scores = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)[:, 1])
    for g, m in zip(got, masks):
        want = sklearn.roc_auc_score(labels[m], scores[m])
        assert float(g) == pytest.approx(want, abs=1e-6)

    # multilabel: per-column AUC on raw logits, nan-averaged
    y_ml = rng.integers(0, 2, size=(n, 3))
    sc_ml = np.round(rng.normal(size=(n, 3)), 1).astype(np.float32)
    got_ml = masked_rocauc_multi(
        jnp.asarray(sc_ml), jnp.asarray(y_ml), tuple(map(jnp.asarray, masks))
    )
    for g, m in zip(got_ml, masks):
        per_col = [
            sklearn.roc_auc_score(y_ml[m, c], sc_ml[m, c]) for c in range(3)
        ]
        assert float(g) == pytest.approx(np.mean(per_col), abs=1e-6)


# ---------------------------------------------------------------------------
# optimizer parity: torch-Adam-style coupled L2
# ---------------------------------------------------------------------------


def test_adam_coupled_weight_decay():
    """"adam" must fold wd*p into the gradient before moments (torch Adam),
    which differs from adamw's decoupled decay."""
    cfg = TrainConfig(optimizer="adam", lr=0.1, weight_decay=0.5)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray([2.0])}
    grads = {"w": jnp.asarray([0.0])}  # pure decay case
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # effective grad = wd*p = 1.0; adam step_1 = -lr * 1.0/ (sqrt(1.0)+eps) ~ -lr
    assert float(updates["w"][0]) == pytest.approx(-0.1, rel=1e-4)

    cfg_w = TrainConfig(optimizer="adamw", lr=0.1, weight_decay=0.5)
    txw = make_optimizer(cfg_w)
    state_w = txw.init(params)
    updates_w, _ = txw.update(grads, state_w, params)
    # adamw with zero grad: moments stay 0 -> update is just -lr*wd*p = -0.1*1.0
    assert float(updates_w["w"][0]) == pytest.approx(-0.1, rel=1e-4)
    # but with a real gradient the two diverge
    grads2 = {"w": jnp.asarray([1.0])}
    u_adam, _ = tx.update(grads2, tx.init(params), params)
    u_adamw, _ = txw.update(grads2, txw.init(params), params)
    assert abs(float(u_adam["w"][0]) - float(u_adamw["w"][0])) > 1e-3


# ---------------------------------------------------------------------------
# end-to-end: Texas (BASELINE.json config 1)
# ---------------------------------------------------------------------------


def test_e2e_acmgcn_texas_fixed_splits():
    """ACM-GCN on Texas, 3 bundled fixed splits, must clear 75% test acc
    (reference paper: ~87-94% band depending on protocol)."""
    cfg = TrainConfig(
        model_type="acmgcn",
        hidden=64,
        lr=0.05,
        weight_decay=5e-4,
        dropout=0.5,
        epochs=400,
        early_stopping=200,
        num_splits=3,
        fixed_splits=True,
        selection="val_loss",
    )
    out = run_experiment("texas", cfg)
    assert out["test_mean"] > 0.75, out
    assert out["epochs_total"] > 0


def test_e2e_early_stopping_triggers():
    cfg = TrainConfig(
        model_type="acmgcn",
        epochs=400,
        early_stopping=30,
        num_splits=1,
        fixed_splits=True,
    )
    out = run_experiment("texas", cfg)
    # With a 30-epoch window the run should stop well before 400 epochs.
    assert out["epochs_total"] < 400


def test_e2e_acmgcnpp_runs():
    cfg = TrainConfig(
        model_type="acmgcnpp",
        structure_info=True,
        epochs=30,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
    )
    out = run_experiment("texas", cfg)
    assert 0.0 <= out["test_mean"] <= 1.0


def test_e2e_selection_val_metric():
    cfg = TrainConfig(
        model_type="acmgcn",
        epochs=50,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
        selection="val_metric",
    )
    out = run_experiment("texas", cfg)
    assert out["test_mean"] > 0.3


def test_e2e_bce_rocauc_protocol(small_graph):
    """genius-style training: BCE loss, ROC-AUC metric, best-val-metric
    selection (reference ACM-Geometric/train.py:87-92,123-134)."""
    import scipy.sparse as sp

    from acmgnn_tpu.ops.graph import GraphData
    from acmgnn_tpu.train.trainer import run_experiment

    adj, features, _ = small_graph
    rng = np.random.default_rng(5)
    # binary labels correlated with a feature column so AUC is learnable
    labels = (features[:, 0] + 0.3 * rng.normal(size=adj.shape[0]) > 0).astype(
        np.int32
    )
    data = GraphData(name="bce-test", adj=adj, features=features, labels=labels)
    cfg = TrainConfig(
        model_type="acmgcn",
        hidden=16,
        epochs=80,
        early_stopping=0,
        num_splits=2,
        loss="bce",
        metric="rocauc",
        selection="val_metric",
        dropout=0.1,
        optimizer="adamw",
        lr=0.01,
        # labels correlate with the RAW feature; don't row-normalize
        feature_normalize=False,
    )
    out = run_experiment(data, cfg)
    assert 0.0 <= out["test_mean"] <= 1.0
    assert out["test_mean"] > 0.6, out  # clearly better than chance


def test_joint_runner_matches_sequential():
    """The joint (paired train+eval) loop must reproduce the sequential
    loop exactly: same selection, same early stop, same metrics."""
    from acmgnn_tpu.train.trainer import (
        build_model,
        make_split_runner,
        prepare_data,
        resolve_split,
    )

    cfg = TrainConfig(
        model_type="acmgcn",
        hidden=16,
        epochs=100,
        early_stopping=40,
        num_splits=1,
        fixed_splits=True,
        dropout=0.4,
    )
    data, ops, x, y, y1h, nclass = prepare_data("texas", cfg)
    model = build_model(cfg, nclass, data.num_nodes)
    rng = np.random.default_rng(0)
    masks = tuple(
        jnp.asarray(m)
        for m in resolve_split(data, cfg, 0, rng, np.asarray(y), nclass)
    )
    key = jax.random.key(3)
    init_key, run_key = jax.random.split(key)
    variables = model.init(init_key, x, ops)
    seq = jax.jit(make_split_runner(model, cfg, joint=False))
    jnt = jax.jit(make_split_runner(model, cfg, joint=True))
    r1 = jax.device_get(seq(variables, run_key, ops, x, y, y1h, masks))
    r2 = jax.device_get(jnt(variables, run_key, ops, x, y, y1h, masks))
    assert float(r1.test_metric) == pytest.approx(float(r2.test_metric), abs=1e-5)
    assert float(r1.val_loss) == pytest.approx(float(r2.val_loss), abs=1e-5)
    assert abs(int(r1.epochs_run) - int(r2.epochs_run)) <= 1


@pytest.mark.parametrize("joint", (False, True))
def test_remat_matches_plain(joint):
    """cfg.remat (jax.checkpoint on the train forward) is pure
    recompute — results must match the non-remat runner exactly."""
    from acmgnn_tpu.train.trainer import (
        build_model,
        make_split_runner,
        prepare_data,
        resolve_split,
    )

    common = dict(
        model_type="acmgcn",
        hidden=16,
        epochs=60,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
        dropout=0.4,
        operator_format="ell",
        joint=joint,
    )
    cfg0 = TrainConfig(**common)
    cfg1 = TrainConfig(remat=True, **common)
    data, ops, x, y, y1h, nclass = prepare_data("texas", cfg0)
    model = build_model(cfg0, nclass, data.num_nodes)
    rng = np.random.default_rng(0)
    masks = tuple(
        jnp.asarray(m)
        for m in resolve_split(data, cfg0, 0, rng, np.asarray(y), nclass)
    )
    key = jax.random.key(3)
    init_key, run_key = jax.random.split(key)
    variables = model.init(init_key, x, ops)
    plain = jax.jit(make_split_runner(model, cfg0))
    remat = jax.jit(make_split_runner(model, cfg1))
    r0 = jax.device_get(plain(variables, run_key, ops, x, y, y1h, masks))
    r1 = jax.device_get(remat(variables, run_key, ops, x, y, y1h, masks))
    assert float(r0.test_metric) == pytest.approx(
        float(r1.test_metric), abs=1e-5
    )
    assert float(r0.val_loss) == pytest.approx(float(r1.val_loss), abs=1e-4)
    assert int(r0.epochs_run) == int(r1.epochs_run)


def test_feature_dtype_bf16_close_to_f32(small_graph):
    """feature_dtype=bfloat16 (input-matrix quantization only; weights
    and accumulation stay f32) must track the f32 run closely."""
    adj, features, labels = small_graph
    from acmgnn_tpu.ops.graph import GraphData

    data = GraphData(
        name="synthetic", adj=adj, features=features, labels=labels
    )
    common = dict(
        model_type="acmgcnp", hidden=8, epochs=40, early_stopping=0,
        num_splits=2, lr=0.05, dropout=0.3, seed=1,
        operator_format="ell", remat=True,
    )
    r0 = run_experiment(data, TrainConfig(**common))
    r1 = run_experiment(
        data, TrainConfig(feature_dtype="bfloat16", **common)
    )
    assert abs(r0["test_mean"] - r1["test_mean"]) < 0.08


def test_e2e_early_stop_window_longer_than_run():
    """epochs <= early_stopping window: the stop rule can never fire, and
    the window slice must not crash at trace time (regression)."""
    cfg = TrainConfig(
        model_type="acmgcn",
        epochs=50,
        early_stopping=200,
        num_splits=1,
        fixed_splits=True,
    )
    out = run_experiment("texas", cfg)
    assert out["epochs_total"] == 50
