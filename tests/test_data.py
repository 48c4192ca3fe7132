"""Dataset loader + split determinism tests (bundled data only)."""

import numpy as np
import pytest

from acmgnn_tpu.data.geomgcn import load_geomgcn
from acmgnn_tpu.data.planetoid import load_planetoid
from acmgnn_tpu.data.registry import load_dataset, row_normalize_features
from acmgnn_tpu.data.splits import (
    load_fixed_split_masks,
    rand_train_test_idx,
    random_disassortative_splits,
)


def test_texas_shapes():
    adj, features, labels = load_geomgcn("texas")
    assert adj.shape == (183, 183)
    assert features.shape == (183, 1703)
    assert labels.shape == (183,)
    assert labels.max() == 4
    # undirected
    assert abs(adj - adj.T).nnz == 0


def test_film_multihot():
    adj, features, labels = load_geomgcn("film")
    assert features.shape[1] == 932
    assert set(np.unique(features)) <= {0.0, 1.0}
    assert adj.shape[0] == features.shape[0] == labels.shape[0] == 7600


def test_cora_shapes():
    adj, features, labels = load_planetoid("cora")
    assert adj.shape == (2708, 2708)
    assert features.shape == (2708, 1433)
    assert labels.shape == (2708,)
    assert labels.max() == 6
    assert abs(adj - adj.T).nnz == 0


def test_citeseer_isolated_fix():
    adj, features, labels = load_planetoid("citeseer")
    assert adj.shape == (3327, 3327)
    assert features.shape == (3327, 3703)


def test_registry_dispatch():
    data = load_dataset("texas")
    assert data.name == "texas"
    assert data.num_nodes == 183
    assert data.num_classes == 5


def test_fixed_split_masks_texas():
    tr, va, te = load_fixed_split_masks("texas", 0)
    assert tr.shape == (183,)
    # Geom-GCN 48/32/20 despite the filename (SURVEY.md §2.14)
    assert (tr.sum(), va.sum(), te.sum()) == (87, 59, 37)
    assert not (tr & va).any() and not (tr & te).any() and not (va & te).any()


def test_random_disassortative_splits_props():
    labels = np.repeat(np.arange(5), 100)
    rng = np.random.default_rng(0)
    tr, va, te = random_disassortative_splits(labels, 5, rng=rng)
    assert tr.sum() == 5 * 60  # 60% per class
    assert va.sum() == 100     # 20%
    assert te.sum() == 500 - 300 - 100
    # class-balanced train
    for c in range(5):
        assert tr[labels == c].sum() == 60
    assert not (tr & va).any() and not (va & te).any()


def test_random_splits_deterministic_given_rng():
    labels = np.random.default_rng(3).integers(0, 4, 200)
    a = random_disassortative_splits(labels, 4, rng=np.random.default_rng(7))
    b = random_disassortative_splits(labels, 4, rng=np.random.default_rng(7))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_rand_train_test_idx_ignores_negative():
    label = np.array([0, 1, -1, 1, 0, -1, 1, 0])
    tr, va, te = rand_train_test_idx(
        label, train_prop=0.5, valid_prop=0.25, rng=np.random.default_rng(0)
    )
    all_idx = np.concatenate([tr, va, te])
    assert set(all_idx) == {0, 1, 3, 4, 6, 7}


def test_row_normalize_features():
    x = np.array([[2.0, 2.0], [0.0, 0.0], [1.0, 3.0]], dtype=np.float32)
    out = row_normalize_features(x)
    np.testing.assert_allclose(out, [[0.5, 0.5], [0.0, 0.0], [0.25, 0.75]])
