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


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """3 epochs + resume-to-6 == one 6-epoch run (weights, opt state, and
    metric history all restored; per-epoch RNG is position-derived)."""
    import dataclasses

    cfg6 = TrainConfig(
        model_type="acmgcn",
        hidden=16,
        epochs=6,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
        dropout=0.4,
    )
    full = run_experiment_stepwise("texas", cfg6)

    cfg3 = dataclasses.replace(cfg6, epochs=3)
    ckpt = str(tmp_path / "ck")
    run_experiment_stepwise(
        "texas", cfg3, checkpoint_dir=ckpt, checkpoint_every=1
    )
    resumed = run_experiment_stepwise(
        "texas", cfg6, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
    )
    assert np.isclose(resumed["test_mean"], full["test_mean"], atol=1e-6)
    assert np.isclose(resumed["valid_mean"], full["valid_mean"], atol=1e-6)


def test_resume_skips_completed_split(tmp_path):
    """Resuming at epochs == target re-runs nothing but reproduces the
    summary from the restored history."""
    cfg = TrainConfig(
        model_type="acmgcn",
        hidden=16,
        epochs=4,
        early_stopping=0,
        num_splits=1,
        fixed_splits=True,
    )
    ckpt = str(tmp_path / "ck")
    first = run_experiment_stepwise(
        "texas", cfg, checkpoint_dir=ckpt, checkpoint_every=2
    )
    again = run_experiment_stepwise(
        "texas", cfg, checkpoint_dir=ckpt, checkpoint_every=2, resume=True
    )
    assert np.isclose(again["test_mean"], first["test_mean"], atol=1e-6)
    assert again["runtime_s"] < first["runtime_s"]


def test_stepwise_reports_steady_epoch_time():
    """Honest-timing convention (CLAUDE.md): the stepwise path reports a
    compile-free epoch_ms_steady like run_experiment does."""
    cfg = TrainConfig(
        model_type="acmgcn", hidden=16, epochs=8, early_stopping=0,
        num_splits=1, fixed_splits=True, dropout=0.0,
    )
    out = run_experiment_stepwise("texas", cfg)
    assert out["epoch_ms_steady"] is not None
    # the steady rate excludes the first epoch's compiles, so it must be
    # well under the naive average that includes them
    assert out["epoch_ms_steady"] < out["epoch_ms_avg"]


def test_stepwise_retries_injected_transient(monkeypatch):
    """A transient runtime failure mid-run is retried, not fatal
    (round-2 verdict weak #3): inject one UNAVAILABLE error into the
    jitted train epoch; the run completes and matches the clean run."""
    import acmgnn_tpu.train.trainer as trainer_mod

    cfg = TrainConfig(
        model_type="acmgcn", hidden=16, epochs=6, early_stopping=0,
        num_splits=1, fixed_splits=True, dropout=0.0,
    )
    clean = run_experiment_stepwise("texas", cfg)

    orig = trainer_mod.make_epoch_fns
    fail = {"armed": True}

    def make_failing(*args, **kwargs):
        train_epoch, eval_epoch = orig(*args, **kwargs)

        def flaky_train(*a, **k):
            if fail["armed"]:
                fail["armed"] = False
                raise RuntimeError("UNAVAILABLE: injected transient")
            return train_epoch(*a, **k)

        return flaky_train, eval_epoch

    monkeypatch.setattr(trainer_mod, "make_epoch_fns", make_failing)
    monkeypatch.setattr(
        "acmgnn_tpu.utils.resilience.time.sleep", lambda s: None
    )
    out = run_experiment_stepwise("texas", cfg)
    assert not fail["armed"]  # the injection really fired
    assert np.isclose(out["test_mean"], clean["test_mean"], atol=1e-6)
