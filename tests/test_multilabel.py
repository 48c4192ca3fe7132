"""Multilabel (ogbn-proteins protocol) end-to-end: BCE over a [N, C]
label matrix + per-column ROC-AUC, through prepare_data -> both trainers
(/root/reference/ACM-Geometric/train.py:122-131, dataset.py:186-202).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from acmgnn_tpu.ops.graph import GraphData
from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.metrics import masked_accuracy
from acmgnn_tpu.train.trainer import (
    prepare_data,
    run_experiment,
    run_experiment_stepwise,
)


@pytest.fixture(scope="module")
def multilabel_data():
    """Small planted multilabel graph: 8 label columns, each a noisy
    indicator of a random latent-class subset."""
    rng = np.random.default_rng(3)
    n, f, c_latent, c_labels = 400, 32, 4, 8
    latent = rng.integers(0, c_latent, size=n)
    e = n * 6
    src = rng.integers(0, n, size=e)
    same = rng.random(e) < 0.4
    by_class = [np.flatnonzero(latent == k) for k in range(c_latent)]
    dst = rng.integers(0, n, size=e)
    for k in range(c_latent):
        sel = same & (latent[src] == k)
        dst[sel] = rng.choice(by_class[k], size=int(sel.sum()))
    adj = sp.coo_matrix((np.ones(e), (src, dst)), shape=(n, n))
    adj = ((adj + adj.T) > 0).astype(np.float64).tocsr()
    adj.setdiag(0)
    adj.eliminate_zeros()

    block = f // c_latent
    p = np.full((n, f), 0.05)
    for k in range(c_latent):
        p[np.ix_(latent == k, np.arange(k * block, (k + 1) * block))] = 0.5
    features = (rng.random((n, f)) < p).astype(np.float32)

    col_sets = rng.random((c_labels, c_latent)) < 0.5
    col_sets[~col_sets.any(axis=1), 0] = True
    ml = col_sets[:, latent].T.astype(np.int64)
    flip = rng.random((n, c_labels)) < 0.1
    labels = np.where(flip, 1 - ml, ml).astype(np.int32)

    splits = []
    for i in range(3):
        perm = np.random.default_rng(100 + i).permutation(n)
        splits.append(
            {
                "train": perm[: n // 2],
                "valid": perm[n // 2 : 3 * n // 4],
                "test": perm[3 * n // 4 :],
            }
        )
    return GraphData(
        name="planted-multilabel", adj=adj, features=features,
        labels=labels, splits=splits,
    )


def _cfg(**kw):
    base = dict(
        model_type="acmgcnp",
        hidden=16,
        lr=0.05,
        weight_decay=1e-4,
        dropout=0.1,
        epochs=40,
        early_stopping=0,
        selection="val_metric",
        metric="rocauc",
        loss="bce",
        num_splits=2,
        fixed_splits=True,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_prepare_data_multilabel(multilabel_data):
    data, ops, x, labels, labels_onehot, nclass = prepare_data(
        multilabel_data, _cfg()
    )
    assert nclass == 8
    assert labels.shape == (400, 8) and labels.dtype == jnp.int32
    assert labels_onehot.shape == (400, 8)
    np.testing.assert_array_equal(
        np.asarray(labels_onehot), np.asarray(labels).astype(np.float32)
    )


def test_multilabel_stepwise_learns(multilabel_data):
    out = run_experiment_stepwise(multilabel_data, _cfg())
    assert out["test_mean"] > 0.75, out  # planted per-column AUC signal


def test_multilabel_fused_learns(multilabel_data):
    out = run_experiment(multilabel_data, _cfg())
    assert out["test_mean"] > 0.75, out


def test_masked_accuracy_rejects_multilabel():
    logits = jnp.zeros((5, 3))
    labels = jnp.zeros((5, 3), jnp.int32)
    mask = jnp.ones((5,), bool)
    with pytest.raises(ValueError, match="multilabel"):
        masked_accuracy(logits, labels, mask)


def test_multilabel_with_acc_metric_raises(multilabel_data):
    """metric=acc on a multilabel dataset must fail loudly, not return
    argmax garbage (round-2 verdict weak #7)."""
    with pytest.raises(ValueError, match="multilabel"):
        run_experiment(
            multilabel_data, _cfg(metric="acc", loss="bce", epochs=2)
        )
