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
PAPER = {"squirrel": (66.98, 1.71), "cora": (88.05, 0.99),
         "citeseer": (77.67, 1.19)}
OURS_F32 = {"squirrel": (66.00, 1.40), "cora": (87.81, 1.49),
            "citeseer": (77.07, 1.33)}


def main():
    for ds, lr, wd, dropout, sinfo in CONFIGS:
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
            joint=True,
        )
        t0 = time.time()
        out = run_experiment(ds, cfg)
        print(json.dumps({
            "dataset": ds,
            "bf16_joint_mean": round(100 * out["test_mean"], 2),
            "bf16_joint_std": round(100 * out["test_std"], 2),
            "ours_f32": OURS_F32[ds],
            "paper": PAPER[ds],
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
