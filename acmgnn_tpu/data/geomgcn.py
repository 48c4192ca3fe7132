"""Geom-GCN txt dataset loader (texas / wisconsin / cornell / film /
squirrel / chameleon).

Reproduces /root/reference/ACM-Pytorch/utils.py:307-381: two TSV files per
dataset (``out1_graph_edges.txt`` edge list with header,
``out1_node_feature_label.txt`` with comma-separated features), undirected
binary adjacency over sorted node ids; ``film`` features are 932-dim
multi-hot index lists.  Pure numpy/scipy.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from acmgnn_tpu.data.paths import find_data_file

GEOMGCN_DATASETS = ("texas", "wisconsin", "cornell", "film", "squirrel", "chameleon")


def load_geomgcn(name: str):
    """Returns ``(adj, features, labels)`` as (csr, float32 [N,F], int32 [N])."""
    feat_path = find_data_file("new_data", name, "out1_node_feature_label.txt")
    edge_path = find_data_file("new_data", name, "out1_graph_edges.txt")

    features_dict: dict[int, np.ndarray] = {}
    labels_dict: dict[int, int] = {}
    with open(feat_path) as f:
        f.readline()  # header
        for line in f:
            nid_s, feat_s, label_s = line.rstrip().split("\t")
            nid = int(nid_s)
            assert nid not in features_dict, f"duplicate node {nid} in {name}"
            if name == "film":
                vec = np.zeros(932, dtype=np.float32)
                vec[np.array(feat_s.split(","), dtype=np.int64)] = 1.0
            else:
                vec = np.array(feat_s.split(","), dtype=np.float32)
            features_dict[nid] = vec
            labels_dict[nid] = int(label_s)

    node_ids = sorted(features_dict)
    remap = {nid: i for i, nid in enumerate(node_ids)}
    n = len(node_ids)

    rows, cols = [], []
    with open(edge_path) as f:
        f.readline()  # header
        for line in f:
            u_s, v_s = line.rstrip().split("\t")
            rows.append(remap[int(u_s)])
            cols.append(remap[int(v_s)])
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    a = sp.coo_matrix(
        (np.ones_like(rows, dtype=np.float64), (rows, cols)), shape=(n, n)
    )
    adj = ((a + a.T) > 0).astype(np.float64).tocsr()

    features = np.stack([features_dict[nid] for nid in node_ids])
    labels = np.array([labels_dict[nid] for nid in node_ids], dtype=np.int32)
    return adj, features, labels
