"""Synthetic generation + homophily metric tests."""

import numpy as np
import pytest

from acmgnn_tpu.data import homophily as H
from acmgnn_tpu.data.synthetic import (
    generate_graphs,
    generate_features,
    generate_output_label,
    generate_random_graph,
    generate_regular_graph,
    load_synthetic,
)


def test_regular_graph_degrees():
    rng = np.random.default_rng(0)
    adj = generate_regular_graph(
        0.5, num_class=3, node_per_class=50, degree_intra=2, rng=rng
    )
    # out-degree per node == degree_intra + degree_inter
    deg_inter = int(2 / 0.5 - 2)
    out_deg = adj.sum(axis=1)
    np.testing.assert_array_equal(out_deg, 2 + deg_inter)


def test_regular_graph_homophily_target():
    rng = np.random.default_rng(1)
    for h in (0.2, 0.5, 0.8):
        adj = generate_regular_graph(
            h, num_class=4, node_per_class=50, degree_intra=4, rng=rng
        )
        labels = np.repeat(np.arange(4), 50)
        got = H.edge_homophily(adj, labels)
        # directed construction: intra/(intra+inter) per node exactly
        d_int = int(4 / h - 4)
        expect = 4 / (4 + d_int)
        assert got == pytest.approx(expect, abs=0.02)


def test_random_graph_homophily_target():
    rng = np.random.default_rng(2)
    adj = generate_random_graph(
        0.3, num_class=5, node_per_class=80, degree_intra=4, rng=rng
    )
    labels = np.repeat(np.arange(5), 80)
    got = H.edge_homophily(adj, labels)
    assert got == pytest.approx(0.3, abs=0.05)
    # symmetric
    np.testing.assert_array_equal(adj, adj.T)


def test_generate_and_load_roundtrip(tmp_path):
    paths = generate_graphs(
        str(tmp_path),
        graph_type="random",
        edge_homos=[0.4],
        num_graph=1,
        num_class=3,
        node_per_class=40,
        degree_intra=2,
    )
    assert len(paths) == 1
    feats = generate_features(
        str(tmp_path / "features"),
        None,
        None,
        num_class=3,
        node_per_class=40,
        num_realizations=2,
        feature_dim=64,
    )
    data = load_synthetic(
        str(tmp_path), "random", 0.4, 0, features_path=str(feats[0])
    )
    assert data.num_nodes == 120
    assert data.features.shape == (120, 64)
    assert data.adj.diagonal().sum() == 0  # self-loops stripped
    assert data.num_classes == 3


def test_feature_generation_from_base(tmp_path):
    rng = np.random.default_rng(0)
    base_feats = rng.normal(size=(300, 16)).astype(np.float32)
    base_labels = rng.integers(0, 3, 300)
    paths = generate_features(
        str(tmp_path), base_feats, base_labels,
        num_class=3, node_per_class=20, num_realizations=1,
    )
    with np.load(paths[0]) as f:
        feats = f["features"]
    assert feats.shape == (60, 16)
    # every generated row comes from the base matrix
    assert all(
        any(np.allclose(row, b) for b in base_feats[:300]) for row in feats[:5]
    )


# ---------------------------------------------------------------------------
# homophily metrics
# ---------------------------------------------------------------------------


def _two_block_graph():
    """Two classes; class 0 fully intra-connected, class 1 connects across."""
    adj = np.zeros((6, 6))
    adj[0, 1] = adj[1, 0] = 1  # intra class 0
    adj[2, 0] = adj[0, 2] = 1  # intra class 0
    adj[3, 0] = adj[0, 3] = 1  # inter
    adj[4, 5] = adj[5, 4] = 1  # intra class 1
    labels = np.array([0, 0, 0, 1, 1, 1])
    return adj, labels


def test_edge_homophily_manual():
    adj, labels = _two_block_graph()
    # 8 directed edges, 6 intra
    assert H.edge_homophily(adj, labels) == pytest.approx(6 / 8)


def test_node_homophily_manual():
    adj, labels = _two_block_graph()
    # fractions: n0: 2/3, n1: 1, n2: 1, n3: 0, n4: 1, n5: 1
    assert H.node_homophily(adj, labels) == pytest.approx(
        (2 / 3 + 1 + 1 + 0 + 1 + 1) / 6
    )


def test_compat_matrix_rows_sum_to_one():
    adj, labels = _two_block_graph()
    h = H.compat_matrix(adj, labels)
    np.testing.assert_allclose(h.sum(axis=1), 1.0)


def test_class_homophily_bounds():
    adj, labels = _two_block_graph()
    v = H.class_homophily(adj, labels)
    assert 0.0 <= v <= 1.0


def test_aggregation_homophily_separable_case():
    """Perfectly separable two-cluster graph => aggregation homophily 1."""
    n = 20
    adj = np.zeros((n, n))
    adj[:10, :10] = 1.0
    adj[10:, 10:] = 1.0
    labels = np.array([0] * 10 + [1] * 10)
    feats = np.zeros((n, 2), dtype=np.float32)
    feats[:10, 0] = 1.0
    feats[10:, 1] = 1.0
    assert H.aggregation_homophily(feats, adj, labels) == pytest.approx(1.0)


def test_aggregation_homophily_matches_reference_torch():
    """Our class-mean reformulation (no N x N similarity materialized)
    must equal the reference's own torch implementation
    (/root/reference/synthetic-experiments/homophily.py:114-124) on
    random graphs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_homophily", "/root/reference/synthetic-experiments/homophily.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    import torch

    rng = np.random.default_rng(3)
    for seed in range(3):
        n, f, c = 60, 12, 4
        adj = (rng.random((n, n)) < 0.12).astype(np.float64)
        feats = rng.normal(size=(n, f)).astype(np.float64)
        labels = rng.integers(0, c, size=n)
        onehot = np.eye(c)[labels]
        theirs = float(
            ref.aggregation_homophily(
                torch.from_numpy(feats),
                torch.from_numpy(adj),
                torch.from_numpy(onehot),
            )
        )
        ours = H.aggregation_homophily(feats, adj, labels)
        # the reference accumulates in torch float32; same argmax
        # decisions, f32-rounded final fraction
        assert ours == pytest.approx(theirs, abs=1e-6), seed


def test_run_synthetic_experiment(tmp_path):
    """End-to-end synthetic pipeline: generate -> train -> aggregate.
    ACM-GCN on a high-homophily graph should beat chance easily."""
    from acmgnn_tpu.data.synthetic import generate_features, generate_graphs
    from acmgnn_tpu.train.config import TrainConfig
    from acmgnn_tpu.train.synthetic_exp import run_synthetic_experiment

    generate_graphs(
        str(tmp_path), graph_type="random", edge_homos=[0.9],
        num_graph=2, num_class=3, node_per_class=60, degree_intra=4,
    )
    rng = np.random.default_rng(0)
    base_feats = rng.normal(size=(300, 24)).astype(np.float32) + np.repeat(
        np.eye(3, dtype=np.float32), 100, axis=0
    ) @ (3.0 * rng.normal(size=(3, 24)).astype(np.float32))
    base_labels = np.repeat(np.arange(3), 100)
    generate_features(
        str(tmp_path / "feats"), base_feats, base_labels,
        num_class=3, node_per_class=60, num_realizations=2,
    )
    cfg = TrainConfig(
        model_type="acmgcn", hidden=16, epochs=120, early_stopping=0,
        num_splits=1, dropout=0.2,
    )
    out = run_synthetic_experiment(
        str(tmp_path), 0.9, num_graph=2,
        features_dir=str(tmp_path / "feats"), cfg=cfg,
    )
    assert out["test_mean"] > 0.5, out
    assert len(out["per_graph"]) == 2
