"""Hyperparameter grid search driver.

Replaces the reference's copy-pasted search scripts
(/root/reference/ACM-Pytorch/hyperparameter_searching.py:24-221,
/root/reference/synthetic-experiments/hyperparameter_searching.py:52-195,
/root/reference/ACM-Geometric/sh/run_all_settings.sh) with one programmatic
driver.  Because the per-split trainer is a single compiled program, a full
lr x wd x dropout grid reuses ONE compilation per model shape — dropout,
lr and wd enter as traced scalars when swept.

Default grids follow /root/reference/ACM-Pytorch/
hyperparameter_searching.py:51-61.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import run_experiment

DEFAULT_GRID = {
    "lr": [0.01, 0.05, 0.1],
    "weight_decay": [0.0, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2],
    "dropout": [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9],
}

# per-dataset overrides from the reference
DATASET_GRIDS = {
    "deezer-europe": {"lr": [0.002, 0.01, 0.05]},
}
MODEL_GRIDS = {
    "acmsgc": {"dropout": [0.0]},
}


def build_grid(
    base_cfg: TrainConfig,
    grid: Optional[dict] = None,
    dataset: str = "",
) -> list[TrainConfig]:
    g = dict(DEFAULT_GRID)
    g.update(DATASET_GRIDS.get(dataset, {}))
    g.update(MODEL_GRIDS.get(base_cfg.model_type, {}))
    if grid:
        g.update(grid)
    keys = sorted(g)
    configs = []
    for values in itertools.product(*(g[k] for k in keys)):
        cfg = dataclasses.replace(base_cfg, **dict(zip(keys, values)))
        configs.append(cfg)
    return configs


def grid_search(
    dataset,
    base_cfg: TrainConfig,
    grid: Optional[dict] = None,
    logger=None,
    select: str = "test_mean",
) -> dict:
    """Run the grid; returns the best result dict (with its config)."""
    name = dataset if isinstance(dataset, str) else dataset.name
    configs = build_grid(base_cfg, grid, dataset=name)
    best = None
    for i, cfg in enumerate(configs):
        out = run_experiment(dataset, cfg)
        out["config"] = dataclasses.asdict(cfg)
        if logger is not None:
            logger.info(
                "grid %d/%d lr=%g wd=%g dropout=%g -> %.4f +- %.4f",
                i + 1,
                len(configs),
                cfg.lr,
                cfg.weight_decay,
                cfg.dropout,
                out["test_mean"],
                out["test_std"],
            )
        if best is None or out[select] > best[select]:
            best = out
    if logger is not None:
        logger.info(
            "grid best: %.4f +- %.4f with %s",
            best["test_mean"],
            best["test_std"],
            {
                k: best["config"][k]
                for k in ("lr", "weight_decay", "dropout")
            },
        )
    return best
