"""Accuracy check for bf16 gather + joint loop on real datasets.

The joint+bf16 SpMM path is the fast configuration at LINKX scale
(tools/joint_bf16_probe.py: 259 vs 310 ms/epoch at twitch-gamers scale).
Before adopting it for the headline benchmark, verify the FULL reference
protocol (10 fixed splits, 1000 epochs, early stopping, reference-tuned
hyperparameters) still lands within the paper band when every channel
aggregation is a bf16 gather with f32 accumulation.

Run SOLO on the TPU:  python -u tools/bf16_parity_probe.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import run_experiment

# (dataset, lr, wd, dropout, structure_info) — reference reproduce rows
CONFIGS = [
    ("squirrel", 0.002, 1e-4, 0.6, 1),
    ("cora", 0.01, 5e-4, 0.5, 1),
    ("citeseer", 0.01, 5e-4, 0.3, 1),
]
# the remaining loadable Table-3 datasets (VERDICT r1 item #7), tuned
# rows from acmgcnp_reproduce_fixed_splits.sh (variant 0)
EXTENDED_CONFIGS = [
    ("cornell", 0.05, 1e-3, 0.1, 0),
    ("wisconsin", 0.01, 1e-3, 0.1, 1),
    ("texas", 0.01, 5e-4, 0.2, 1),
    ("film", 0.05, 5e-3, 0.0, 0),
]
PAPER = {"squirrel": (66.98, 1.71), "cora": (88.05, 0.99),
         "citeseer": (77.67, 1.19), "cornell": (85.68, 4.84),
         "wisconsin": (88.43, 2.39), "texas": (88.38, 3.64),
         "film": (36.26, 1.34)}
OURS_F32 = {"squirrel": (66.00, 1.40), "cora": (87.81, 1.49),
            "citeseer": (77.07, 1.33), "cornell": (84.59, 8.02),
            "wisconsin": (87.25, 2.67), "texas": (86.22, 3.72),
            "film": (36.03, 1.31)}


def run_bce_rocauc(hoist=False, gemm=False):
    """The headline config on a BCE + ROC-AUC task: the planted binary
    LINKX-shaped graph from tools/geometric_oracle.py (f32 oracle: ours
    93.80 +- 0.21, reference's own code 93.76 +- 0.59 — PARITY.md)."""
    import numpy as np

    from acmgnn_tpu.ops.graph import GraphData
    from tools.geometric_oracle import load_or_make

    adj, features, labels, splits = load_or_make(100_000, "rocauc", 42)
    data = GraphData(
        name="planted-rocauc", adj=adj, features=features,
        labels=labels.astype(np.int32), splits=splits,
    )
    cfg = TrainConfig(
        model_type="acmgcnp",
        hidden=64,
        lr=0.01,
        weight_decay=1e-3,
        dropout=0.5,
        epochs=150,
        early_stopping=0,
        num_splits=3,
        fixed_splits=True,   # attached planted splits
        selection="val_metric",
        metric="rocauc",
        loss="bce",
        operator_format="ell",
        spmm_dtype="bfloat16",
        gemm_dtype="bfloat16" if gemm else "float32",
        joint=True,
        hoist_first=hoist,
    )
    t0 = time.time()
    out = run_experiment(data, cfg)
    print(json.dumps({
        "dataset": "planted-rocauc-100k",
        "bf16_joint_mean": round(100 * out["test_mean"], 2),
        "bf16_joint_std": round(100 * out["test_std"], 2),
        "ours_f32": (93.80, 0.21),
        "reference_own_code": (93.76, 0.59),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--extended", action="store_true",
                    help="run the remaining Table-3 datasets + BCE task")
    ap.add_argument("--hoist", action="store_true",
                    help="also enable the first-layer input hoist (the "
                         "round-2 headline config)")
    ap.add_argument("--gemm", action="store_true",
                    help="also run the channel-projection GEMMs with "
                         "bf16 operands / f32 accumulation (gemm_dtype="
                         "bfloat16 — the Penn94-regime MXU lever)")
    args = ap.parse_args()
    configs = EXTENDED_CONFIGS if args.extended else CONFIGS
    for ds, lr, wd, dropout, sinfo in configs:
        cfg = TrainConfig(
            model_type="acmgcnp",
            hidden=64,
            lr=lr,
            weight_decay=wd,
            dropout=dropout,
            structure_info=bool(sinfo),
            epochs=1000,
            early_stopping=200,
            num_splits=10,
            fixed_splits=True,
            selection="val_loss",
            operator_format="ell",     # force the gather path everywhere
            spmm_dtype="bfloat16",
            gemm_dtype="bfloat16" if args.gemm else "float32",
            joint=True,
            hoist_first=args.hoist,
        )
        t0 = time.time()
        out = run_experiment(ds, cfg)
        print(json.dumps({
            "dataset": ds,
            "gemm_dtype": "bfloat16" if args.gemm else "float32",
            "bf16_joint_mean": round(100 * out["test_mean"], 2),
            "bf16_joint_std": round(100 * out["test_std"], 2),
            "ours_f32": OURS_F32[ds],
            "paper": PAPER[ds],
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
    if args.extended:
        run_bce_rocauc(hoist=args.hoist, gemm=args.gemm)


if __name__ == "__main__":
    main()
