"""Stepwise (observable) trainer tests."""

import numpy as np

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.trainer import run_experiment_stepwise


def test_stepwise_texas_runs_and_learns():
    cfg = TrainConfig(
        model_type="acmgcn",
        epochs=60,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
        dropout=0.3,
    )
    out = run_experiment_stepwise("texas", cfg)
    assert out["test_mean"] > 0.4
    assert out["valid_mean"] > 0.4


def test_stepwise_checkpointing(tmp_path):
    from acmgnn_tpu.utils.checkpoint import restore_checkpoint

    cfg = TrainConfig(
        model_type="acmgcn",
        epochs=10,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
    )
    out = run_experiment_stepwise(
        "texas", cfg, checkpoint_dir=str(tmp_path)
    )
    restored = restore_checkpoint(str(tmp_path / "split0_best"))
    assert "variables" in restored and "extra" in restored
    assert 0 <= float(restored["extra"]["val_metric"]) <= 1
