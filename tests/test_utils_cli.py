"""Logger, run stats, checkpoint, sweep grid, and CLI plumbing tests."""

import json

import numpy as np
import pytest

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.sweep import build_grid
from acmgnn_tpu.utils.logging import ExperimentLogger, RunStats


def test_run_stats_ogb_semantics():
    """final test = test at argmax-valid epoch, per run
    (/root/reference/ACM-Geometric/logger.py:17-49)."""
    stats = RunStats(2)
    # run 0: valid peaks at epoch 1
    stats.add_result(0, (0.9, 0.5, 0.40))
    stats.add_result(0, (0.95, 0.8, 0.70))
    stats.add_result(0, (0.99, 0.6, 0.90))
    # run 1: valid peaks at epoch 0
    stats.add_result(1, (0.9, 0.7, 0.60))
    stats.add_result(1, (0.95, 0.6, 0.80))
    s = stats.summary()
    assert s["per_run"][0]["final_test"] == pytest.approx(0.70)
    assert s["per_run"][1]["final_test"] == pytest.approx(0.60)
    assert s["test_mean"] == pytest.approx(0.65)


def test_logger_file_and_csv(tmp_path):
    logger = ExperimentLogger(name="t", log_dir=str(tmp_path))
    logger.info("hello %d", 42)
    assert logger.log_path.exists()
    assert "hello 42" in logger.log_path.read_text()

    csv_path = tmp_path / "results.csv"
    logger.append_csv(str(csv_path), {"a": 1, "b": "x"})
    logger.append_csv(str(csv_path), {"a": 2, "b": "y"})
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "a,b" and len(lines) == 3


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from acmgnn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    variables = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}}
    path = save_checkpoint(str(tmp_path / "ckpt"), variables, step=7)
    restored = restore_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(restored["variables"]["params"]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3),
    )
    assert int(restored["step"]) == 7


def test_build_grid_reference_defaults():
    cfg = TrainConfig(model_type="acmgcn")
    grid = build_grid(cfg, dataset="texas")
    # 9 weight decays incl. 5e-6 (reference hyperparameter_searching.py:57)
    assert len(grid) == 3 * 9 * 10  # lr x wd x dropout
    assert any(c.weight_decay == 5e-6 for c in grid)
    # acmsgc pins dropout=0 (reference hyperparameter_searching.py:58-61)
    grid_sgc = build_grid(TrainConfig(model_type="acmsgc"), dataset="texas")
    assert len(grid_sgc) == 3 * 9 * 1
    assert all(c.dropout == 0.0 for c in grid_sgc)
    # deezer shrinks BOTH lists (reference hyperparameter_searching.py:51-53)
    grid_dz = build_grid(cfg, dataset="deezer-europe")
    assert len(grid_dz) == 3 * 7 * 10
    assert {c.lr for c in grid_dz} == {0.002, 0.01, 0.05}
    assert max(c.weight_decay for c in grid_dz) == 1e-3


def test_swept_grid_matches_per_config_runs(tmp_path):
    """The traced-scalar (lr, wd) sweep must produce the same results as
    independent per-config run_experiment calls, while compiling the
    split runner once per dropout value."""
    import jax
    import jax.numpy as jnp

    from acmgnn_tpu.train.sweep import grid_search
    from acmgnn_tpu.train.trainer import (
        build_model,
        make_split_runner,
        prepare_data,
        run_experiment,
    )

    base = TrainConfig(
        model_type="acmgcn",
        hidden=16,
        epochs=12,
        early_stopping=0,
        num_splits=2,
        fixed_splits=True,
    )
    small_grid = {
        "lr": [0.01, 0.05],
        "weight_decay": [0.0, 5e-4],
        "dropout": [0.3],
    }
    out_path = tmp_path / "sweep.json"
    best = grid_search(
        "texas", base, grid=small_grid, out_path=out_path
    )
    import json as _json

    saved = _json.loads(out_path.read_text())
    assert len(saved["grid"]) == 4
    assert saved["best"]["test_mean"] == best["test_mean"]
    assert saved["fixed_splits"] is True

    # per-config equivalence for every grid point
    import dataclasses as _dc

    for rec in saved["grid"]:
        cfg = TrainConfig(**{
            k: v for k, v in rec["config"].items()
            if k in TrainConfig.__dataclass_fields__
        })
        solo = run_experiment("texas", cfg)
        assert solo["test_mean"] == pytest.approx(
            rec["test_mean"], abs=1e-6
        ), rec["config"]

    # the runner really does reuse one compilation across (lr, wd)
    prepared = prepare_data("texas", base)
    cfg_d = _dc.replace(base, dropout=0.3)
    model = build_model(cfg_d, prepared[5], prepared[0].num_nodes)
    runner = jax.jit(make_split_runner(model, cfg_d))
    for lr, wd in ((0.01, 0.0), (0.05, 5e-4)):
        run_experiment(
            "texas", _dc.replace(cfg_d, lr=lr, weight_decay=wd),
            prepared=prepared, runner=runner,
            hparams=(jnp.asarray(lr, jnp.float32),
                     jnp.asarray(wd, jnp.float32)),
        )
    assert runner._cache_size() == 1
    # deezer lr grid override
    grid_dz = build_grid(cfg, dataset="deezer-europe")
    assert sorted({c.lr for c in grid_dz}) == [0.002, 0.01, 0.05]


def test_cli_config_mapping():
    from acmgnn_tpu.cli import config_from_args, main

    import argparse

    from acmgnn_tpu.cli import _add_train_args

    p = argparse.ArgumentParser()
    _add_train_args(p)
    args = p.parse_args(
        ["--dataset", "genius", "--model", "acmgcnp", "--variant", "1"]
    )
    cfg = config_from_args(args)
    assert cfg.loss == "bce" and cfg.metric == "rocauc"
    assert cfg.selection == "val_metric"
    assert cfg.variant is True

    args2 = p.parse_args(["--dataset_name", "texas", "--method", "acmgcn"])
    cfg2 = config_from_args(args2)
    assert cfg2.loss == "nll" and cfg2.selection == "val_loss"
    assert cfg2.model_type == "acmgcn"


def test_cli_homophily_command(capsys):
    from acmgnn_tpu.cli import main

    main(["homophily", "--dataset", "texas"])
    out = json.loads(capsys.readouterr().out.strip())
    assert 0 <= out["edge_homophily"] <= 1
    # texas is strongly heterophilic
    assert out["edge_homophily"] < 0.25


def test_cli_gen_graphs_command(tmp_path, capsys):
    from acmgnn_tpu.cli import main

    main([
        "gen-graphs",
        "--base_dir", str(tmp_path),
        "--edge_homos", "0.5",
        "--num_graph", "1",
        "--num_node_total", "150",
        "--num_class", "3",
    ])
    assert "wrote 1 graphs" in capsys.readouterr().out


def test_cli_predict_roundtrip(tmp_path, capsys):
    """train --checkpoint_dir, then predict from the saved best weights:
    the inference surface the reference lacks entirely."""
    import numpy as np

    from acmgnn_tpu.cli import main

    common = [
        "--dataset", "texas", "--model", "acmgcn", "--fixed_splits", "1",
    ]
    main([
        "train", *common, "--epochs", "40", "--early_stopping", "0",
        "--num_splits", "1", "--checkpoint_dir", str(tmp_path),
        "--log_dir", str(tmp_path / "logs"),
    ])
    capsys.readouterr()
    out_npz = tmp_path / "pred.npz"
    main([
        "predict", *common,
        "--checkpoint", str(tmp_path / "split0_best"),
        "--output", str(out_npz),
    ])
    summary = json.loads(capsys.readouterr().out.strip())
    z = np.load(out_npz)
    assert z["preds"].shape == (183,)
    assert z["logits"].shape == z["probs"].shape == (183, 5)
    np.testing.assert_allclose(z["probs"].sum(axis=1), 1.0, rtol=1e-5)
    assert (np.argmax(z["logits"], axis=1) == z["preds"]).all()
    # trained weights must beat chance by far on the full graph
    assert summary["label_agreement"] > 0.6
    assert summary["step"] >= 0


def test_cli_profile_dir_writes_trace(tmp_path, capsys):
    """train --profile_dir captures a jax.profiler trace (SURVEY §5:
    the reference's only observability is wall-clock brackets)."""
    from acmgnn_tpu.cli import main

    prof = tmp_path / "trace"
    main([
        "train", "--dataset", "texas", "--model", "acmgcn",
        "--fixed_splits", "1", "--epochs", "5", "--early_stopping", "0",
        "--num_splits", "1", "--profile_dir", str(prof),
        "--log_dir", str(tmp_path / "logs"),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_total"] == 5
    # the profiler writes <dir>/plugins/profile/<ts>/*.xplane.pb
    assert list(prof.rglob("*.xplane.pb")), "no xplane trace written"


def test_retry_transient():
    from acmgnn_tpu.utils.resilience import retry_transient

    calls = {"n": 0}

    @retry_transient(max_attempts=3, base_delay=0.01)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("INTERNAL: remote_compile: HTTP 500")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3

    @retry_transient(max_attempts=3, base_delay=0.01)
    def fatal():
        calls["n"] += 1
        raise ValueError("a real bug")

    calls["n"] = 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fatal()
    assert calls["n"] == 1  # no retry on non-transient


def test_deezer_protocol_auto_switch():
    """deezer-europe is forced to AdamW + 500 epochs + attached fixed
    splits + val-metric selection, overriding the flags — the
    reference's unconditional switch
    (/root/reference/ACM-Pytorch/train.py:63-82)."""
    import argparse

    from acmgnn_tpu.cli import _add_train_args, config_from_args
    from acmgnn_tpu.train.config import TrainConfig

    p = argparse.ArgumentParser()
    _add_train_args(p)
    # even explicit contrary flags are overridden, as in the reference
    args = p.parse_args(
        ["--dataset", "deezer-europe", "--model", "acmgcnp",
         "--optimizer", "adam", "--epochs", "2000", "--fixed_splits", "0"]
    )
    cfg = config_from_args(args)
    assert cfg.optimizer == "adamw"
    assert cfg.epochs == 500
    assert cfg.fixed_splits is True
    assert cfg.selection == "val_metric"

    # library-level rule: same function, other datasets untouched
    base = TrainConfig(optimizer="adam", epochs=123)
    assert base.resolve_for_dataset("texas") == base
    dz = base.resolve_for_dataset("deezer-europe")
    assert (dz.optimizer, dz.epochs, dz.fixed_splits) == ("adamw", 500, True)
