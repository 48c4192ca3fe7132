"""Paper-published tuned hyperparameters (appendix Tables 11-13).

Hand-transcribed from the bundled paper PDF's appendix tables (extracted
from its compressed text streams — the reference repo ships no
machine-readable copy):

- Table 11: optimal hyperparameters for baseline models, random
  60/20/20 splits.
- Table 12: optimal hyperparameters for ACM(II)-GNNs, random splits.
- Table 13: optimal hyperparameters for ACM(II)-GCN+/++, random splits
  (the ``withA`` column = the ``--structure_info`` flag).

Every entry: (lr, weight_decay, dropout, paper_mean, paper_std).
Hidden size is 64 for all models here; ``nlayers`` for GCN/snowball
families is carried by the model key (…2/…3).  Only the datasets
loadable from the bundled reference tree are included (chameleon and
pubmed raw files are missing from the bundle; deezer-europe's .mat is
gdown-fetched and not bundled).

These enable DIRECT paper-protocol parity runs for the entire model zoo
without re-running the paper's 270-config grid search per cell
(tools/tuned_run.py).
"""

from __future__ import annotations

# model key -> TrainConfig fields
MODEL_DEFS = {
    "sgc1": dict(model_type="sgc", hops=1),
    "sgc2": dict(model_type="sgc", hops=2),
    "gcn": dict(model_type="gcn", nlayers=2),
    "snowball2": dict(model_type="snowball", nlayers=2),
    "snowball3": dict(model_type="snowball", nlayers=3),
    "acmsgc1": dict(model_type="acmsgc", hops=1),
    "acmsgc2": dict(model_type="acmsgc", hops=2),
    "acmgcn": dict(model_type="acmgcn"),
    "acmgcn_v1": dict(model_type="acmgcn", variant=True),
    "acmsnowball2": dict(model_type="acmsnowball", nlayers=2),
    "acmsnowball3": dict(model_type="acmsnowball", nlayers=3),
    "acmsnowball2_v1": dict(model_type="acmsnowball", nlayers=2,
                            variant=True),
    "acmsnowball3_v1": dict(model_type="acmsnowball", nlayers=3,
                            variant=True),
    "gcnII": dict(model_type="gcnII"),
    "acmgcnp": dict(model_type="acmgcnp"),
    "acmgcnp_v1": dict(model_type="acmgcnp", variant=True),
    "acmgcnpp": dict(model_type="acmgcnpp"),
    "acmgcnpp_v1": dict(model_type="acmgcnpp", variant=True),
}

# RANDOM 60/20/20 splits (paper Tables 11/12/13).
# dataset -> (lr, wd, dropout, paper_mean, paper_std[, structure_info])
RANDOM = {
    # --- Table 11: baselines -------------------------------------------
    "sgc1": {
        "cornell": (0.05, 1e-2, 0.0, 70.98, 8.39),
        "wisconsin": (0.05, 5e-3, 0.0, 70.38, 2.85),
        "texas": (0.05, 1e-3, 0.0, 83.28, 5.43),
        "film": (0.01, 5e-6, 0.0, 25.26, 1.18),
        "squirrel": (0.05, 0.0, 0.0, 47.62, 1.27),
        "cora": (0.1, 5e-6, 0.0, 85.12, 1.64),
        "citeseer": (0.1, 5e-4, 0.0, 79.66, 0.75),
    },
    "sgc2": {
        "cornell": (0.05, 1e-3, 0.0, 72.62, 9.92),
        "wisconsin": (0.1, 1e-3, 0.0, 74.75, 2.89),
        "texas": (0.01, 1e-3, 0.0, 81.31, 3.30),
        "film": (0.01, 5e-6, 0.0, 28.81, 1.11),
        "squirrel": (0.1, 0.0, 0.9, 41.25, 1.43),
        "cora": (0.1, 1e-5, 0.0, 85.48, 1.48),
        "citeseer": (0.01, 5e-4, 0.9, 80.75, 1.15),
    },
    "gcn": {
        "cornell": (0.1, 5e-3, 0.5, 82.46, 3.11),
        "wisconsin": (0.1, 1e-3, 0.7, 75.50, 2.92),
        "texas": (0.05, 1e-2, 0.9, 83.11, 3.20),
        "film": (0.1, 5e-4, 0.0, 35.51, 0.99),
        "squirrel": (0.01, 5e-5, 0.7, 44.76, 1.39),
        "cora": (0.1, 5e-4, 0.2, 87.78, 0.96),
        "citeseer": (0.1, 1e-3, 0.9, 81.39, 1.23),
    },
    "snowball2": {
        "cornell": (0.01, 5e-3, 0.4, 82.62, 2.34),
        "wisconsin": (0.1, 1e-3, 0.5, 74.88, 3.42),
        "texas": (0.05, 1e-2, 0.9, 83.11, 3.20),
        "film": (0.1, 5e-4, 0.0, 35.97, 0.66),
        "squirrel": (0.1, 0.0, 0.9, 47.88, 1.23),
        "cora": (0.1, 5e-4, 0.1, 88.64, 1.15),
        "citeseer": (0.1, 1e-3, 0.8, 81.53, 1.71),
    },
    "snowball3": {
        "cornell": (0.01, 5e-3, 0.4, 82.95, 2.10),
        "wisconsin": (0.05, 5e-4, 0.8, 69.50, 5.01),
        "texas": (0.05, 1e-2, 0.9, 83.11, 3.20),
        "film": (0.1, 5e-4, 0.2, 36.00, 1.36),
        "squirrel": (0.1, 0.0, 0.8, 48.25, 0.94),
        "cora": (0.05, 1e-3, 0.6, 89.33, 1.30),
        "citeseer": (0.1, 1e-3, 0.9, 80.93, 1.32),
    },
    # GCNII (Table 11; dict entries carry per-dataset depth/lambda/alpha;
    # the paper's "lambda alpha_l" columns map to lamda/alpha here)
    "gcnII": {
        "cornell": dict(lr=0.01, weight_decay=1e-3, dropout=0.5,
                        nlayers=16, lamda=0.5, alpha=0.5,
                        paper=(89.18, 3.96)),
        "wisconsin": dict(lr=0.01, weight_decay=1e-3, dropout=0.5,
                          nlayers=8, lamda=0.5, alpha=0.5,
                          paper=(83.25, 2.69)),
        "texas": dict(lr=0.01, weight_decay=1e-4, dropout=0.5,
                      nlayers=4, lamda=1.5, alpha=0.5,
                      paper=(82.46, 4.58)),
        "film": dict(lr=0.01, weight_decay=1e-4, dropout=0.5,
                     nlayers=8, lamda=1.5, alpha=0.3,
                     paper=(40.82, 1.79)),
        "squirrel": dict(lr=0.01, weight_decay=1e-4, dropout=0.5,
                         nlayers=4, lamda=1.5, alpha=0.2,
                         paper=(38.81, 1.97)),
        "cora": dict(lr=0.01, weight_decay=1e-4, dropout=0.5,
                     nlayers=16, lamda=0.5, alpha=0.2,
                     paper=(88.98, 1.33)),
        "citeseer": dict(lr=0.01, weight_decay=1e-3, dropout=0.5,
                         nlayers=16, lamda=0.5, alpha=0.2,
                         paper=(81.58, 1.30)),
    },
    # --- Table 12: ACM(II)-GNNs ---------------------------------------
    "acmsgc1": {
        "cornell": (0.01, 5e-3, 0.6, 93.77, 1.91),
        "wisconsin": (0.05, 5e-3, 0.7, 93.25, 2.92),
        "texas": (0.01, 5e-3, 0.6, 93.61, 1.55),
        "film": (0.05, 5e-5, 0.7, 39.33, 1.25),
        "squirrel": (0.05, 0.0, 0.9, 46.40, 1.13),
        "cora": (0.01, 5e-6, 0.9, 86.63, 1.13),
        "citeseer": (0.01, 5e-4, 0.9, 80.96, 0.93),
    },
    "acmsgc2": {
        "cornell": (0.01, 5e-3, 0.6, 93.77, 2.17),
        "wisconsin": (0.1, 5e-3, 0.2, 94.00, 2.61),
        "texas": (0.05, 5e-3, 0.4, 93.44, 2.54),
        "film": (0.1, 5e-5, 0.7, 40.13, 1.21),
        "squirrel": (0.05, 0.0, 0.9, 40.91, 1.39),
        "cora": (0.1, 5e-5, 0.6, 87.64, 0.99),
        "citeseer": (0.05, 5e-4, 0.9, 80.93, 1.16),
    },
    "acmgcn": {
        "cornell": (0.05, 1e-2, 0.2, 94.75, 3.80),
        "wisconsin": (0.1, 5e-3, 0.0, 95.75, 2.03),
        "texas": (0.05, 1e-2, 0.6, 94.92, 2.88),
        "film": (0.1, 5e-4, 0.5, 41.62, 1.15),
        "squirrel": (0.05, 5e-6, 0.6, 58.02, 1.86),
        "cora": (0.1, 5e-3, 0.5, 88.62, 1.22),
        "citeseer": (0.05, 5e-3, 0.7, 81.68, 0.97),
    },
    "acmgcn_v1": {
        "cornell": (0.1, 1e-2, 0.5, 95.25, 2.79),
        "wisconsin": (0.1, 1e-2, 0.2, 96.62, 2.44),
        "texas": (0.1, 5e-3, 0.4, 95.08, 2.54),
        "film": (0.1, 5e-4, 0.5, 41.24, 1.16),
        "squirrel": (0.05, 0.0, 0.7, 53.76, 1.63),
        "cora": (0.1, 5e-3, 0.4, 89.00, 0.72),
        "citeseer": (0.05, 5e-5, 0.7, 81.58, 1.77),
    },
    "acmsnowball2": {
        "cornell": (0.05, 1e-2, 0.2, 95.08, 3.11),
        "wisconsin": (0.1, 5e-3, 0.1, 96.38, 2.59),
        "texas": (0.05, 1e-2, 0.1, 95.74, 2.22),
        "film": (0.1, 5e-3, 0.0, 41.40, 1.23),
        "squirrel": (0.05, 5e-6, 0.6, 55.97, 2.03),
        "cora": (0.05, 1e-3, 0.6, 88.83, 1.49),
        "citeseer": (0.05, 5e-3, 0.7, 81.58, 1.23),
    },
    "acmsnowball3": {
        "cornell": (0.1, 1e-2, 0.4, 94.26, 2.57),
        "wisconsin": (0.05, 1e-2, 0.3, 96.62, 1.86),
        "texas": (0.01, 5e-3, 0.6, 94.75, 2.41),
        "film": (0.05, 1e-2, 0.0, 41.27, 0.80),
        "squirrel": (0.01, 1e-4, 0.6, 55.73, 2.39),
        "cora": (0.1, 1e-2, 0.3, 89.59, 1.58),
        "citeseer": (0.01, 5e-3, 0.9, 81.32, 0.97),
    },
    "acmsnowball2_v1": {
        "cornell": (0.05, 1e-2, 0.6, 95.25, 1.55),
        "wisconsin": (0.1, 1e-2, 0.1, 96.63, 2.24),
        "texas": (0.1, 1e-2, 0.4, 95.25, 1.55),
        "film": (0.1, 5e-3, 0.0, 41.10, 0.75),
        "squirrel": (0.1, 5e-6, 0.6, 53.48, 0.60),
        "cora": (0.1, 5e-3, 0.5, 88.95, 1.04),
        "citeseer": (0.05, 5e-3, 0.7, 82.07, 1.04),
    },
    "acmsnowball3_v1": {
        "cornell": (0.05, 1e-2, 0.7, 93.61, 2.79),
        "wisconsin": (0.1, 5e-3, 0.1, 97.00, 2.63),
        "texas": (0.05, 1e-2, 0.6, 94.75, 3.09),
        "film": (0.05, 5e-3, 0.2, 40.31, 1.60),
        "squirrel": (0.05, 5e-5, 0.5, 52.31, 1.57),
        "cora": (0.1, 5e-3, 0.5, 89.36, 1.26),
        "citeseer": (0.05, 1e-4, 0.6, 81.56, 1.15),
    },
    # --- Table 13: ACM(II)-GCN+/++ (6th field = structure_info) --------
    "acmgcnp": {
        "cornell": (0.05, 1e-2, 0.1, 94.92, 2.79, 1),
        "wisconsin": (0.05, 1e-2, 0.3, 96.50, 2.08, 1),
        "texas": (0.05, 1e-3, 0.3, 94.92, 2.79, 0),
        "film": (0.01, 1e-3, 0.8, 41.79, 1.01, 0),
        "squirrel": (0.01, 1e-4, 0.6, 69.26, 1.11, 1),
        "cora": (0.1, 5e-3, 0.3, 89.75, 1.16, 1),
        "citeseer": (0.1, 1e-5, 0.5, 81.65, 1.48, 0),
    },
    "acmgcnp_v1": {
        "cornell": (0.05, 1e-2, 0.3, 93.93, 1.05, 1),
        "wisconsin": (0.01, 1e-2, 0.1, 97.50, 1.25, 0),
        "texas": (0.05, 1e-2, 0.1, 96.56, 2.00, 1),
        "film": (0.1, 5e-5, 0.7, 41.86, 1.48, 0),
        "squirrel": (0.01, 1e-4, 0.6, 68.56, 1.33, 1),
        "cora": (0.1, 5e-3, 0.5, 89.33, 0.81, 1),
        "citeseer": (0.002, 5e-3, 0.8, 81.83, 1.65, 0),
    },
    "acmgcnpp": {
        "cornell": (0.1, 5e-3, 0.4, 93.93, 3.03, 0),
        "wisconsin": (0.05, 1e-2, 0.1, 96.75, 1.79, 1),
        "texas": (0.05, 5e-4, 0.2, 95.41, 2.82, 0),
        "film": (0.002, 5e-3, 0.9, 41.50, 1.54, 0),
        "squirrel": (0.002, 1e-3, 0.7, 69.81, 1.11, 1),
        "cora": (0.05, 5e-3, 0.4, 89.18, 1.11, 1),
        "citeseer": (0.05, 5e-3, 0.3, 81.87, 1.38, 0),
    },
    "acmgcnpp_v1": {
        "cornell": (0.05, 1e-2, 0.6, 92.62, 2.57, 1),
        "wisconsin": (0.01, 1e-2, 0.1, 97.13, 1.68, 1),
        "texas": (0.05, 5e-4, 0.1, 94.75, 2.91, 0),
        "film": (0.002, 5e-3, 0.9, 41.66, 1.42, 0),
        "squirrel": (0.002, 1e-4, 0.7, 69.98, 1.53, 1),
        "cora": (0.1, 1e-2, 0.1, 89.47, 1.08, 1),
        "citeseer": (0.01, 5e-4, 0.9, 81.76, 1.25, 0),
    },
}

# FIXED 48/32/20 Geom-GCN splits (paper Tables 14/15) — the families not
# already covered by PARITY.md's reproduce-script runs.
FIXED = {
    # --- Table 15: ACM(II)-GCN+/++ (6th field = structure_info) --------
    "acmgcnp": {
        "cornell": (0.05, 1e-3, 0.1, 85.68, 4.84, 0),
        "wisconsin": (0.01, 1e-3, 0.1, 88.43, 2.39, 1),
        "texas": (0.01, 5e-4, 0.2, 88.38, 3.64, 1),
        "film": (0.05, 5e-3, 0.0, 36.13, 1.19, 0),
        "squirrel": (0.002, 1e-4, 0.6, 66.06, 2.16, 1),
        "cora": (0.002, 0.0, 0.6, 88.05, 0.99, 0),
        "citeseer": (0.01, 5e-5, 0.3, 77.67, 1.19, 0),
    },
    "acmgcnp_v1": {
        "cornell": (0.05, 5e-3, 0.0, 85.41, 5.30, 1),
        "wisconsin": (0.01, 5e-3, 0.3, 88.04, 3.66, 1),
        "texas": (0.05, 1e-2, 0.4, 88.11, 3.24, 1),
        "film": (0.05, 5e-3, 0.0, 35.95, 1.33, 0),
        "squirrel": (0.01, 5e-4, 0.8, 65.95, 1.74, 1),
        "cora": (0.002, 5e-5, 0.7, 88.19, 1.17, 1),
        "citeseer": (0.01, 5e-3, 0.2, 77.20, 1.61, 1),
    },
    "acmgcnpp": {
        "cornell": (0.01, 5e-4, 0.1, 85.68, 5.80, 0),
        "wisconsin": (0.05, 5e-3, 0.1, 88.24, 3.16, 1),
        "texas": (0.01, 5e-3, 0.3, 88.38, 3.43, 1),
        "film": (0.01, 5e-3, 0.0, 37.31, 1.09, 0),
        "squirrel": (0.01, 1e-4, 0.8, 66.45, 1.83, 1),
        "cora": (0.002, 5e-6, 0.7, 88.11, 0.96, 0),
        "citeseer": (0.002, 5e-6, 0.6, 77.46, 1.65, 0),
    },
    "acmgcnpp_v1": {
        "cornell": (0.01, 5e-3, 0.3, 86.49, 6.73, 0),
        "wisconsin": (0.01, 5e-3, 0.2, 88.43, 3.66, 1),
        "texas": (0.01, 5e-3, 0.6, 88.38, 3.43, 1),
        "film": (0.01, 5e-3, 0.0, 36.68, 1.35, 0),
        "squirrel": (0.002, 5e-4, 0.8, 66.75, 1.82, 1),
        "cora": (0.002, 5e-5, 0.7, 88.25, 0.96, 0),
        "citeseer": (0.01, 5e-5, 0.6, 77.12, 1.58, 0),
    },
    "acmsgc1": {
        "cornell": (0.01, 5e-6, 0.0, 82.43, 5.44),
        "wisconsin": (0.1, 5e-6, 0.0, 86.47, 3.77),
        "texas": (0.01, 1e-5, 0.0, 81.89, 4.53),
        "film": (0.05, 5e-4, 0.0, 35.49, 1.06),
        "squirrel": (0.05, 5e-6, 0.9, 45.00, 1.40),
        "cora": (0.05, 5e-5, 0.7, 86.90, 1.38),
        "citeseer": (0.05, 0.0, 0.7, 76.73, 1.59),
    },
    "acmsgc2": {
        "cornell": (0.01, 5e-6, 0.0, 82.43, 5.44),
        "wisconsin": (0.1, 5e-6, 0.0, 86.47, 3.77),
        "texas": (0.05, 1e-5, 0.0, 81.89, 4.53),
        "film": (0.05, 5e-4, 0.1, 36.04, 0.83),
        "squirrel": (0.05, 0.0, 0.9, 40.02, 0.96),
        "cora": (0.1, 0.0, 0.8, 87.69, 1.07),
        "citeseer": (0.1, 0.0, 0.8, 76.59, 1.69),
    },
    "acmsnowball2": {
        "cornell": (0.05, 5e-3, 0.3, 85.41, 5.43),
        "wisconsin": (0.01, 1e-3, 0.4, 87.06, 2.00),
        "texas": (0.01, 5e-3, 0.2, 87.57, 4.86),
        "film": (0.01, 1e-2, 0.0, 36.89, 1.18),
        "squirrel": (0.01, 1e-4, 0.7, 52.50, 1.49),
        "cora": (0.01, 1e-3, 0.5, 87.42, 1.09),
        "citeseer": (0.01, 5e-5, 0.0, 76.41, 1.38),
    },
    "acmsnowball3": {
        "cornell": (0.05, 5e-3, 0.2, 83.24, 5.38),
        "wisconsin": (0.01, 1e-2, 0.1, 86.67, 4.37),
        "texas": (0.01, 5e-3, 0.2, 87.84, 3.87),
        "film": (0.01, 1e-2, 0.2, 36.82, 0.94),
        "squirrel": (0.01, 5e-5, 0.7, 53.31, 1.88),
        "cora": (0.01, 5e-6, 0.9, 87.10, 0.93),
        "citeseer": (0.01, 5e-6, 0.9, 75.91, 1.57),
    },
}
