"""Unified dataset registry.

One name-based dispatcher replacing the reference's three separate loader
stacks (/root/reference/ACM-Pytorch/utils.py:294-386,
/root/reference/ACM-Geometric/dataset.py:71-110,
/root/reference/synthetic-experiments/utils.py:75-313).
"""

from __future__ import annotations

import numpy as np

from acmgnn_tpu.data.geomgcn import GEOMGCN_DATASETS, load_geomgcn
from acmgnn_tpu.data.planetoid import load_planetoid
from acmgnn_tpu.ops.graph import GraphData

PLANETOID_DATASETS = ("cora", "citeseer", "pubmed")
LINKX_DATASETS = (
    "Penn94",
    "arxiv-year",
    "genius",
    "twitch-gamer",
    "pokec",
    "snap-patents",
    "deezer-europe",
    "yelp-chi",
    "twitch-e",
    "fb100",
    "ogbn-arxiv",
    "ogbn-products",
    "ogbn-proteins",
    "wiki",
)
DATASETS = PLANETOID_DATASETS + GEOMGCN_DATASETS + LINKX_DATASETS


def row_normalize_features(features: np.ndarray) -> np.ndarray:
    """Row-normalize the feature matrix (zero rows stay zero), the
    reference's default preprocessing unless acmgcnp/pp + structure_info
    (/root/reference/ACM-Pytorch/utils.py:612-617)."""
    rowsum = features.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(rowsum != 0, 1.0 / rowsum, 0.0)
    return (features * inv).astype(np.float32)


def load_dataset(
    name: str, sub_dataset: str = "", directed: bool = False
) -> GraphData:
    """Load any supported dataset into a ``GraphData``.

    Small datasets load from the bundled reference files; LINKX large-scale
    sets load from local copies (this environment has no network egress —
    see ``acmgnn_tpu.data.linkx`` for the expected file layout).
    ``directed`` skips edge symmetrization for the temporally-directed
    LINKX graphs (reference ``--directed``).
    """
    if name in PLANETOID_DATASETS:
        adj, features, labels = load_planetoid(name)
    elif name in GEOMGCN_DATASETS:
        adj, features, labels = load_geomgcn(name)
    elif name in LINKX_DATASETS:
        from acmgnn_tpu.data import linkx

        return linkx.load_linkx_dataset(name, sub_dataset, directed)
    elif name.startswith("synthetic"):
        raise ValueError(
            "synthetic graphs are loaded via acmgnn_tpu.data.synthetic."
            "load_synthetic(base_dir, edge_homo, graph_idx, ...)"
        )
    else:
        raise ValueError(f"unknown dataset {name!r}; known: {DATASETS}")

    return GraphData(name=name, adj=adj, features=features, labels=labels)
