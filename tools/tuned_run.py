"""Direct paper-protocol parity runs with the paper's tuned hyperparameters.

Uses the appendix-published optimal configs (tools/paper_tuned.py,
Tables 11-15 of the bundled paper) to run the FULL reference protocol
(10 splits, 1000 epochs, 200-epoch early stopping, best-val-loss test
snapshot) for every supported (model, dataset) cell — no grid search
needed.  Writes one JSON per cell to experiments/tuned/ and prints a
summary table with paper deltas.

Usage:
  # everything loadable on random splits (long; run TPU cells solo)
  python -u tools/tuned_run.py --protocol random
  # one family / dataset subset
  python -u tools/tuned_run.py --protocol random --models acmsgc1,acmsgc2 \
      --datasets cornell,texas
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.paper_tuned import FIXED, MODEL_DEFS, RANDOM  # noqa: E402

from acmgnn_tpu.train.config import TrainConfig  # noqa: E402
from acmgnn_tpu.train.trainer import run_experiment  # noqa: E402


def split_entry(entry):
    """-> (hyper_kwargs, paper_mean, paper_std) for tuple or dict entries."""
    if isinstance(entry, dict):
        hyper = {k: v for k, v in entry.items() if k != "paper"}
        return hyper, entry["paper"][0], entry["paper"][1]
    lr, wd, dropout, mean, std = entry[:5]
    hyper = dict(lr=lr, weight_decay=wd, dropout=dropout)
    if len(entry) > 5:
        hyper["structure_info"] = bool(entry[5])
    return hyper, mean, std


def cell_config(model_key: str, entry, fixed: bool) -> TrainConfig:
    hyper, _, _ = split_entry(entry)
    return TrainConfig(
        hidden=64,
        epochs=1000,
        early_stopping=200,
        num_splits=10,
        fixed_splits=fixed,
        selection="val_loss",
        **{**MODEL_DEFS[model_key], **hyper},
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--protocol", choices=["random", "fixed"],
                   default="random")
    p.add_argument("--models", default=None,
                   help="comma list; default: all in the table")
    p.add_argument("--datasets", default=None)
    p.add_argument("--out_dir", default="experiments/tuned")
    p.add_argument("--skip_done", action="store_true", default=True)
    p.add_argument("--rerun", dest="skip_done", action="store_false")
    args = p.parse_args()

    table = RANDOM if args.protocol == "random" else FIXED
    models = (args.models.split(",") if args.models else list(table))
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for mk in models:
        cells = table[mk]
        datasets = (args.datasets.split(",") if args.datasets
                    else list(cells))
        for ds in datasets:
            if ds not in cells:
                continue
            path = out_dir / f"{args.protocol}_{mk}_{ds}.json"
            if args.skip_done and path.exists():
                r = json.loads(path.read_text())
                rows.append(r)
                print(f"[skip] {mk}/{ds}: done "
                      f"({r['test_mean']}±{r['test_std']})", flush=True)
                continue
            entry = cells[ds]
            _, paper_mean, paper_std = split_entry(entry)
            cfg = cell_config(mk, entry, fixed=args.protocol == "fixed")
            t0 = time.time()
            out = run_experiment(ds, cfg)
            r = {
                "protocol": args.protocol,
                "model": mk,
                "dataset": ds,
                "config": {k: v for k, v in dataclasses.asdict(cfg).items()
                           if k in ("model_type", "variant", "hops",
                                    "nlayers", "lr", "weight_decay",
                                    "dropout", "structure_info",
                                    "alpha", "lamda")},
                "test_mean": round(100 * out["test_mean"], 2),
                "test_std": round(100 * out["test_std"], 2),
                "paper_mean": paper_mean,
                "paper_std": paper_std,
                "wall_s": round(time.time() - t0, 1),
            }
            path.write_text(json.dumps(r, indent=1))
            delta = r["test_mean"] - r["paper_mean"]
            print(f"[done] {mk}/{ds}: {r['test_mean']}±{r['test_std']} "
                  f"(paper {r['paper_mean']}±{r['paper_std']}, "
                  f"Δ{delta:+.2f}, {r['wall_s']}s)", flush=True)
            rows.append(r)

    print("\n== summary ==")
    for r in rows:
        dsig = ((r["test_mean"] - r["paper_mean"]) / r["paper_std"]
                if r["paper_std"] else 0.0)
        print(f"{r['protocol']:6s} {r['model']:16s} {r['dataset']:10s} "
              f"{r['test_mean']:6.2f}±{r['test_std']:<5.2f} "
              f"paper {r['paper_mean']:6.2f}±{r['paper_std']:<5.2f} "
              f"Δσ {dsig:+.2f}")


if __name__ == "__main__":
    main()
