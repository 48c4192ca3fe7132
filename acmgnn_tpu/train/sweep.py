"""Hyperparameter grid search driver.

Replaces the reference's copy-pasted search scripts
(/root/reference/ACM-Pytorch/hyperparameter_searching.py:24-221,
/root/reference/synthetic-experiments/hyperparameter_searching.py:52-195,
/root/reference/ACM-Geometric/sh/run_all_settings.sh) with one programmatic
driver.

Compilation economics: the per-split trainer is a single fused program.
``lr`` and ``weight_decay`` enter it as TRACED scalars
(``make_split_runner(...)``'s ``hparams`` argument), so the whole
lr x wd plane reuses ONE compilation; ``dropout`` is a flax module
attribute (static), so the grid compiles once per dropout value —
10 compilations for the reference's full 270-point grid instead of 270.
Data preprocessing (operators, normalization) runs once for the whole
search.

Default grids follow /root/reference/ACM-Pytorch/
hyperparameter_searching.py:51-61 exactly (9 weight decays; deezer
shrinks BOTH lr and wd lists).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from pathlib import Path
from typing import Optional

import jax

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import (
    build_model,
    make_split_runner,
    prepare_data,
    run_experiment,
)

DEFAULT_GRID = {
    "lr": [0.01, 0.05, 0.1],
    "weight_decay": [0.0, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2],
    "dropout": [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9],
}

# per-dataset overrides from the reference (hyperparameter_searching.py:51-58)
DATASET_GRIDS = {
    "deezer-europe": {
        "lr": [0.002, 0.01, 0.05],
        "weight_decay": [0.0, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3],
    },
}
MODEL_GRIDS = {
    "acmsgc": {"dropout": [0.0]},
}


def resolve_grid(
    base_cfg: TrainConfig, grid: Optional[dict] = None, dataset: str = ""
) -> dict:
    g = dict(DEFAULT_GRID)
    g.update(DATASET_GRIDS.get(dataset, {}))
    g.update(MODEL_GRIDS.get(base_cfg.model_type, {}))
    if grid:
        g.update(grid)
    return g


def build_grid(
    base_cfg: TrainConfig,
    grid: Optional[dict] = None,
    dataset: str = "",
) -> list[TrainConfig]:
    g = resolve_grid(base_cfg, grid, dataset)
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
    out_path: str | Path | None = None,
) -> dict:
    """Run the grid; returns the best result dict (with its config).

    Grids that only vary (lr, weight_decay, dropout) take the swept fast
    path: one data-prep for the search, one compile per dropout, traced
    (lr, wd).  Any other swept key falls back to per-config
    ``run_experiment``.  ``out_path`` persists every config's result as
    JSON (table2_search-style).
    """
    import jax.numpy as jnp

    name = dataset if isinstance(dataset, str) else dataset.name
    g = resolve_grid(base_cfg, grid, dataset=name)
    swept_keys = set(g) - {"lr", "weight_decay", "dropout"}
    all_results = []

    def note(i, total, cfg, out):
        if logger is not None:
            logger.info(
                "grid %d/%d lr=%g wd=%g dropout=%g -> %.4f +- %.4f",
                i + 1, total, cfg.lr, cfg.weight_decay, cfg.dropout,
                out["test_mean"], out["test_std"],
            )

    if swept_keys:
        # exotic grid: per-config full runs
        configs = build_grid(base_cfg, grid, dataset=name)
        for i, cfg in enumerate(configs):
            out = run_experiment(dataset, cfg)
            out["config"] = dataclasses.asdict(cfg)
            note(i, len(configs), cfg, out)
            all_results.append(out)
    else:
        prepared = prepare_data(dataset, base_cfg)
        nclass, n = prepared[5], prepared[0].num_nodes
        total = len(g["dropout"]) * len(g["lr"]) * len(g["weight_decay"])
        i = 0
        for dropout in g["dropout"]:
            cfg_d = dataclasses.replace(base_cfg, dropout=dropout)
            model = build_model(cfg_d, nclass, n)
            runner = jax.jit(make_split_runner(model, cfg_d))
            for lr, wd in itertools.product(g["lr"], g["weight_decay"]):
                cfg = dataclasses.replace(cfg_d, lr=lr, weight_decay=wd)
                out = run_experiment(
                    dataset, cfg,
                    prepared=prepared,
                    runner=runner,
                    hparams=(
                        jnp.asarray(lr, jnp.float32),
                        jnp.asarray(wd, jnp.float32),
                    ),
                )
                out["config"] = dataclasses.asdict(cfg)
                note(i, total, cfg, out)
                all_results.append(out)
                i += 1

    best = max(all_results, key=lambda r: r[select])
    if logger is not None:
        logger.info(
            "grid best: %.4f +- %.4f with %s",
            best["test_mean"],
            best["test_std"],
            {k: best["config"][k] for k in ("lr", "weight_decay", "dropout")},
        )
    if out_path is not None:
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(
            json.dumps(
                {
                    "dataset": name,
                    "model": base_cfg.model_type,
                    "variant": base_cfg.variant,
                    "structure_info": base_cfg.structure_info,
                    "fixed_splits": base_cfg.fixed_splits,
                    "select": select,
                    "best": best,
                    "grid": all_results,
                },
                indent=1,
            )
        )
    return best
