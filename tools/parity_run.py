"""Accuracy-parity run: reproduce paper Table 3 (fixed Geom-GCN splits)
with the reference's tuned hyperparameters
(/root/reference/ACM-Pytorch/experiment/acmgcnp_reproduce_fixed_splits.sh)
and write PARITY.md comparing against the paper numbers (BASELINE.md).

Usage: python tools/parity_run.py [--quick] [--out PARITY.md]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import run_experiment

# (dataset, variant) -> (lr, wd, dropout, structure_info); reference
# reproduce script rows (variant 0 and 1).
TUNED = {
    ("cornell", 0): (0.05, 1e-3, 0.1, 0),
    ("wisconsin", 0): (0.01, 1e-3, 0.1, 1),
    ("texas", 0): (0.01, 5e-4, 0.2, 1),
    ("film", 0): (0.05, 5e-3, 0.0, 0),
    ("chameleon", 0): (0.05, 1e-4, 0.7, 1),
    ("squirrel", 0): (0.002, 1e-4, 0.6, 1),
    ("cora", 0): (0.002, 0.0, 0.6, 0),
    ("citeseer", 0): (0.01, 5e-5, 0.3, 0),
    ("pubmed", 0): (0.05, 5e-5, 0.3, 0),
    ("cornell", 1): (0.05, 5e-3, 0.0, 1),
    ("wisconsin", 1): (0.01, 5e-3, 0.3, 1),
    ("texas", 1): (0.05, 1e-2, 0.4, 1),
    ("film", 1): (0.05, 5e-3, 0.0, 0),
    ("chameleon", 1): (0.05, 1e-4, 0.7, 1),
    ("squirrel", 1): (0.01, 5e-4, 0.8, 1),
    ("cora", 1): (0.002, 5e-5, 0.7, 1),
    ("citeseer", 1): (0.01, 5e-3, 0.2, 1),
    ("pubmed", 1): (0.01, 1e-4, 0.3, 0),
}

# paper Table 3 (BASELINE.md) rows per model, variant 0.  The reproduce
# script pins tuned hyperparameters for acmgcnp only; runs for the other
# model families reuse them (documented caveat in PARITY.md).
PAPER_TABLE3 = {
    "acmgcnp": {
        "cornell": (85.68, 4.84),
        "wisconsin": (88.43, 2.39),
        "texas": (88.38, 3.64),
        "film": (36.26, 1.34),
        "chameleon": (74.47, 1.84),
        "squirrel": (66.98, 1.71),
        "cora": (88.05, 0.99),
        "citeseer": (77.67, 1.19),
        "pubmed": (89.82, 0.41),
    },
    "acmgcn": {
        "cornell": (85.14, 6.07),
        "wisconsin": (88.43, 3.22),
        "texas": (87.84, 4.40),
        "film": (36.63, 0.84),
        "chameleon": (69.14, 1.91),
        "squirrel": (55.19, 1.49),
        "cora": (87.91, 0.95),
        "citeseer": (77.32, 1.70),
        "pubmed": (90.00, 0.52),
    },
    "acmgcnpp": {
        "cornell": (85.68, 5.80),
        "wisconsin": (88.24, 3.16),
        "texas": (88.38, 3.43),
        "film": (37.31, 1.09),
        "chameleon": (74.41, 1.49),
        "squirrel": (67.06, 1.66),
        "cora": (88.11, 0.96),
        "citeseer": (77.46, 1.65),
        "pubmed": (89.65, 0.58),
    },
}
PAPER_ACMGCNP = PAPER_TABLE3["acmgcnp"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="3 splits, 400 epochs (CI-speed)")
    p.add_argument("--variant", type=int, default=0)
    p.add_argument("--model", default="acmgcnp",
                   choices=["acmgcnp", "acmgcn", "acmgcnpp"])
    p.add_argument("--out", default="PARITY.md")
    p.add_argument("--datasets", nargs="*", default=None)
    args = p.parse_args()

    datasets = args.datasets or [
        "cornell", "wisconsin", "texas", "film", "chameleon", "squirrel",
        "cora", "citeseer", "pubmed",
    ]
    rows = []
    for ds in datasets:
        lr, wd, dropout, sinfo = TUNED[(ds, args.variant)]
        if args.model == "acmgcn":
            sinfo = 0  # 3-channel model, no structure channel
        cfg = TrainConfig(
            model_type=args.model,
            hidden=64,
            lr=lr,
            weight_decay=wd,
            dropout=dropout,
            variant=bool(args.variant),
            structure_info=bool(sinfo),
            epochs=400 if args.quick else 1000,
            early_stopping=200,
            num_splits=3 if args.quick else 10,
            fixed_splits=True,
            selection="val_loss",
        )
        t0 = time.time()
        out = run_experiment(ds, cfg)
        # paper comparison only for variant 0; the ACMII Table-3 rows
        # are not all in the BASELINE.md extraction
        paper_mean, paper_std = (
            PAPER_TABLE3[args.model].get(ds, (None, None))
            if args.variant == 0
            else (None, None)
        )
        row = {
            "dataset": ds,
            "ours_mean": round(100 * out["test_mean"], 2),
            "ours_std": round(100 * out["test_std"], 2),
            "paper_mean": paper_mean,
            "paper_std": paper_std,
            "epoch_ms": round(out["epoch_ms_avg"], 2),
            "wall_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    lines = [
        f"# PARITY — {args.model} on fixed Geom-GCN splits",
        "",
        f"Our framework (variant={args.variant}, reference-tuned "
        "hyperparameters, "
        f"{'3 splits/400 epochs (quick)' if args.quick else '10 splits/1000 epochs'}) "
        "vs paper Table 3 (V100). Within ~1 std = parity (init/RNG differ).",
        "",
        "| Dataset | Ours (%) | Paper (%) | Δ | ms/epoch |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        delta = (
            round(r["ours_mean"] - r["paper_mean"], 2)
            if r["paper_mean"] is not None
            else "n/a"
        )
        lines.append(
            f"| {r['dataset']} | {r['ours_mean']}±{r['ours_std']} | "
            f"{r['paper_mean']}±{r['paper_std']} | {delta} | {r['epoch_ms']} |"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
