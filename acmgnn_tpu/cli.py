"""Unified CLI.

One entry point replacing the reference's three diverging argparse scripts.
Accepts both spelling families (``--dataset``/``--dataset_name``,
``--model``/``--method``, ``--hidden``/``--hidden_channels``) so reference
invocations port over directly.

Subcommands:
  train       — multi-split training run (ACM-Pytorch/Geometric protocols)
  sweep       — lr x wd x dropout grid search
  gen-graphs  — synthetic graph generation over an edge-homophily sweep
  gen-feats   — synthetic feature realizations from a base dataset
  homophily   — print homophily metrics for a dataset

Benchmarks live in ``bench.py`` at the repo root (driver contract).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from acmgnn_tpu.train.config import TrainConfig


def _add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", "--dataset_name", dest="dataset", default="texas")
    p.add_argument("--sub_dataset", default="")
    p.add_argument(
        "--model", "--method", "--model_type", dest="model", default="acmgcn"
    )
    p.add_argument("--hidden", "--hidden_channels", dest="hidden", type=int,
                   default=64)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--early_stopping", type=int, default=200)
    p.add_argument("--num_splits", "--runs", dest="num_splits", type=int,
                   default=10)
    p.add_argument("--fixed_splits", type=int, default=0)
    p.add_argument("--variant", type=int, default=0)
    p.add_argument("--structure_info", type=int, default=0)
    p.add_argument("--layers", "--nlayers", dest="layers", type=int, default=1)
    p.add_argument("--hops", type=int, default=1)
    p.add_argument("--link_init_layers_X", type=int, default=1)
    p.add_argument("--alpha", type=float, default=0.1,
                   help="gcnII initial-residual strength")
    p.add_argument("--lamda", type=float, default=0.5,
                   help="gcnII identity-map decay")
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--rocauc", action="store_true")
    p.add_argument("--directed", action="store_true")
    p.add_argument("--selection", choices=["val_loss", "val_metric"],
                   default=None)
    p.add_argument("--operator_format",
                   choices=["auto", "dense", "coo", "ell"], default="auto")
    p.add_argument("--reorder", choices=["none", "rcm", "degree"],
                   default="none")
    p.add_argument("--spmm_dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--gemm_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="channel-projection GEMM operand dtype (bf16 = "
                        "MXU-native operands, f32 accumulation; lever "
                        "for wide-feature GEMM-bound graphs)")
    p.add_argument("--ell_hub_threshold", type=int, default=0,
                   help="ELL dense-row hybrid degree cutoff (0 = off)")
    p.add_argument("--ell_block", type=int, default=0,
                   help="ELL block-column size: one gather slot covers "
                        "this many adjacent columns (0 unset [env "
                        "ACMGNN_ELL_BLOCK, default off — measured "
                        "faster], 1 off, -1 occupancy-auto)")
    p.add_argument("--joint", type=int, default=0,
                   help="paired train+eval loop (one 4-wide fused gather)")
    p.add_argument("--hoist_first", type=int, default=0,
                   help="first-layer input-side aggregation hoist "
                        "(A(XW)=(AX)W): eval rides a precomputed A_hat X, "
                        "the train input gather needs no backward")
    p.add_argument("--feature_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="on-device feature-matrix storage (bfloat16 "
                        "halves the largest argument at wiki-2M scale; "
                        "weights/accumulations stay f32)")
    p.add_argument("--remat", type=int, default=0,
                   help="rematerialize the train forward in the backward "
                        "(jax.checkpoint): trades recompute for HBM at "
                        "full-graph scale (exact same math)")
    p.add_argument("--hoist_agg_dtype",
                   choices=["auto", "float32", "bfloat16"], default="auto",
                   help="storage dtype of the precomputed hoist aggregate "
                        "(auto: bf16 only in the wide-feature bf16-gather "
                        "regime where the f32 [N, F] aggregate is >1 GiB)")
    p.add_argument("--normalization", choices=["row", "sym"], default="row")
    p.add_argument("--stepwise", action="store_true",
                   help="per-epoch observable loop (OGB-style stats, "
                        "display, checkpointing) instead of the fused "
                        "while-loop runner")
    p.add_argument("--checkpoint_dir", default="",
                   help="save best-val weights per split; with "
                        "--checkpoint_every also full resumable state "
                        "(implies --stepwise)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="snapshot full training state every N epochs")
    p.add_argument("--resume", action="store_true",
                   help="resume each split from its last snapshot in "
                        "--checkpoint_dir")
    p.add_argument("--sharded", type=int, default=0, metavar="N",
                   help="train over an N-device mesh (0 = single device; "
                        "-1 = all available devices)")
    p.add_argument("--exchange", choices=["allgather", "halo", "auto"],
                   default="auto",
                   help="sharded SpMM communication: full feature "
                        "all-gather, dedup'd boundary halo all_to_all "
                        "(pair with --reorder rcm), or auto by volume")
    p.add_argument("--per_host_loading", type=int, default=0,
                   help="sharded runs: place node arrays via per-host "
                        "slab loading (each process materializes only "
                        "the row slabs its devices own — the multi-host "
                        "path; auto-on under a multi-process runtime)")
    p.add_argument("--partition", choices=["contiguous", "fennel", "balanced"],
                   default="contiguous",
                   help="multi-chip row partition: nnz-balanced "
                        "contiguous blocks, or streaming Fennel min-cut "
                        "(shrinks halo volume on community graphs)")
    p.add_argument("--log_dir", default="./logs")
    p.add_argument("--results_csv", default="")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of the whole run "
                        "to this directory (view with XProf/TensorBoard)")


# datasets the reference trains with BCE + ROC-AUC
ROCAUC_DATASETS = ("yelp-chi", "twitch-e", "ogbn-proteins", "genius")
# datasets selected on best-val-metric instead of best-val-loss
VAL_METRIC_DATASETS = ("deezer-europe",) + ROCAUC_DATASETS


def config_from_args(args) -> TrainConfig:
    use_rocauc = args.rocauc or args.dataset in ROCAUC_DATASETS
    selection = args.selection
    if selection is None:
        selection = (
            "val_metric" if args.dataset in VAL_METRIC_DATASETS else "val_loss"
        )
    cfg = _build_config(args, use_rocauc, selection)
    # dataset-conditional protocol forcing (deezer-europe -> AdamW +
    # epochs=500 + attached splits), mirroring the reference's
    # unconditional switch (/root/reference/ACM-Pytorch/train.py:63-82)
    return cfg.resolve_for_dataset(args.dataset)


def _build_config(args, use_rocauc, selection) -> TrainConfig:
    return TrainConfig(
        model_type=args.model,
        hidden=args.hidden,
        nlayers=args.layers,
        variant=bool(args.variant),
        structure_info=bool(args.structure_info),
        init_layers_X=args.link_init_layers_X,
        hops=args.hops,
        alpha=args.alpha,
        lamda=args.lamda,
        lr=args.lr,
        weight_decay=args.weight_decay,
        dropout=args.dropout,
        epochs=args.epochs,
        early_stopping=args.early_stopping,
        optimizer=args.optimizer,
        selection=selection,
        metric="rocauc" if use_rocauc else "acc",
        loss="bce" if use_rocauc else "nll",
        num_splits=args.num_splits,
        fixed_splits=bool(args.fixed_splits),
        directed=bool(args.directed),
        sub_dataset=args.sub_dataset,
        seed=args.seed,
        normalization=args.normalization,
        operator_format=args.operator_format,
        reorder=args.reorder,
        partition=args.partition,
        spmm_dtype=args.spmm_dtype,
        gemm_dtype=args.gemm_dtype,
        joint=bool(args.joint),
        hoist_first=bool(args.hoist_first),
        hoist_agg_dtype=args.hoist_agg_dtype,
        remat=bool(args.remat),
        feature_dtype=args.feature_dtype,
        ell_hub_threshold=args.ell_hub_threshold,
        ell_block=args.ell_block,
    )


def cmd_train(args):
    import contextlib

    from acmgnn_tpu.utils.logging import ExperimentLogger
    from acmgnn_tpu.utils.profiling import profile_trace

    cfg = config_from_args(args)
    logger = ExperimentLogger(
        name=f"{args.dataset}_{args.model}", log_dir=args.log_dir
    )
    logger.info("config: %s", dataclasses.asdict(cfg))
    trace = (
        profile_trace(args.profile_dir)
        if args.profile_dir
        else contextlib.nullcontext()
    )
    with trace:
        out = _run_train(args, cfg, logger)
    if args.profile_dir:
        logger.info("profiler trace written to %s (view with XProf)",
                    args.profile_dir)
    if args.results_csv:
        logger.append_csv(
            args.results_csv,
            {
                "dataset": out["dataset"],
                "model": out["model"],
                "test_mean": round(out["test_mean"], 4),
                "test_std": round(out["test_std"], 4),
                "epoch_ms": round(out["epoch_ms_avg"], 2),
                "config": json.dumps(dataclasses.asdict(cfg)),
            },
        )
    print(json.dumps({k: v for k, v in out.items() if k != "per_split"}))


def _run_train(args, cfg, logger):
    if getattr(args, "sharded", 0):
        import jax

        from acmgnn_tpu.parallel.sharded import make_graph_mesh
        from acmgnn_tpu.train.trainer import run_experiment_sharded

        devices = jax.devices()
        if args.sharded > 0:
            devices = devices[: args.sharded]
        mesh = make_graph_mesh(devices)
        out = run_experiment_sharded(
            args.dataset, cfg, mesh, logger=logger, exchange=args.exchange,
            checkpoint_dir=args.checkpoint_dir or None,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
            per_host_loading=bool(args.per_host_loading)
            or jax.process_count() > 1,
        )
    elif args.stepwise or args.checkpoint_dir:
        from acmgnn_tpu.train.trainer import run_experiment_stepwise

        out = run_experiment_stepwise(
            args.dataset,
            cfg,
            logger=logger,
            checkpoint_dir=args.checkpoint_dir or None,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume,
        )
    else:
        from acmgnn_tpu.train.trainer import run_experiment

        out = run_experiment(args.dataset, cfg, logger=logger)
    return out


def cmd_sweep(args):
    from acmgnn_tpu.train.sweep import grid_search
    from acmgnn_tpu.utils.logging import ExperimentLogger

    cfg = config_from_args(args)
    logger = ExperimentLogger(
        name=f"sweep_{args.dataset}_{args.model}", log_dir=args.log_dir
    )
    best = grid_search(args.dataset, cfg, logger=logger)
    print(json.dumps({k: v for k, v in best.items() if k != "per_split"}))


def cmd_gen_graphs(args):
    from acmgnn_tpu.data.synthetic import generate_graphs

    paths = generate_graphs(
        args.base_dir,
        graph_type=args.graph_type,
        edge_homos=args.edge_homos,
        num_graph=args.num_graph,
        num_class=args.num_class,
        node_per_class=args.num_node_total // args.num_class,
        degree_intra=args.degree_intra,
        seed=args.seed,
    )
    print(f"wrote {len(paths)} graphs under {args.base_dir}")


def cmd_gen_feats(args):
    import numpy as np

    from acmgnn_tpu.data.registry import load_dataset
    from acmgnn_tpu.data.synthetic import generate_features

    if args.base_dataset == "random":
        feats = labels = None
    else:
        data = load_dataset(args.base_dataset)
        feats, labels = data.features, np.asarray(data.labels)
    paths = generate_features(
        args.out_dir,
        feats,
        labels,
        num_class=args.num_class,
        node_per_class=args.node_per_class,
        num_realizations=args.num_realizations,
        seed=args.seed,
    )
    print(f"wrote {len(paths)} feature realizations under {args.out_dir}")


def cmd_synthetic_train(args):
    from acmgnn_tpu.train.synthetic_exp import run_synthetic_experiment
    from acmgnn_tpu.utils.logging import ExperimentLogger

    cfg = config_from_args(args)
    logger = ExperimentLogger(
        name=f"synthetic_{args.model}_{args.edge_homo}", log_dir=args.log_dir
    )
    out = run_synthetic_experiment(
        args.base_dir,
        args.edge_homo,
        graph_type=args.graph_type,
        num_graph=args.num_graph,
        features_dir=args.features_dir or None,
        cfg=cfg,
        logger=logger,
    )
    print(json.dumps(out))


def cmd_predict(args):
    """Inference surface: restore a trained checkpoint (written by
    ``train --checkpoint_dir``) and emit per-node predictions.

    The reference has no inference path at all — model selection there
    only snapshots the test *number* (SURVEY.md §5); here trained
    weights round-trip to deployable predictions.
    """
    import jax
    import numpy as np

    from acmgnn_tpu.train.trainer import build_model, prepare_data
    from acmgnn_tpu.utils.checkpoint import restore_checkpoint

    cfg = config_from_args(args)
    data, ops, x, labels, labels_onehot, nclass = prepare_data(
        args.dataset, cfg
    )
    model = build_model(cfg, nclass, data.num_nodes)
    snap = restore_checkpoint(args.checkpoint)
    variables = jax.tree_util.tree_map(jnp_asarray, snap["variables"])

    logits = jax.device_get(
        jax.jit(lambda v, xx, o: model.apply(v, xx, o, training=False))(
            variables, x, ops
        )
    )
    preds = np.argmax(logits, axis=1)
    probs = np.asarray(jax.nn.softmax(logits, axis=1))
    if data.perm is not None:
        # arrays are in reorder-permuted space; write in original node ids
        inv = np.empty_like(data.perm)
        inv[data.perm] = np.arange(len(data.perm))
        logits, preds, probs = logits[inv], preds[inv], probs[inv]
    out_path = args.output or f"{args.dataset}_predictions.npz"
    np.savez(out_path, logits=logits, preds=preds, probs=probs)

    summary = {
        "dataset": args.dataset,
        "model": cfg.model_type,
        "checkpoint": args.checkpoint,
        "step": int(snap.get("step", 0)),
        "nodes": int(preds.shape[0]),
        "classes": int(nclass),
        "output": out_path,
    }
    lab = np.asarray(jax.device_get(labels))
    if lab.ndim == 1:  # single-label: report full-graph agreement
        if data.perm is not None:
            lab = lab[inv]
        summary["label_agreement"] = round(float((preds == lab).mean()), 4)
    print(json.dumps(summary))


def jnp_asarray(a):
    import jax.numpy as jnp

    return jnp.asarray(a)


def cmd_homophily(args):
    from acmgnn_tpu.data import homophily as H
    from acmgnn_tpu.data.registry import load_dataset

    data = load_dataset(args.dataset)
    out = {
        "dataset": args.dataset,
        "edge_homophily": H.edge_homophily(data.adj, data.labels),
        "node_homophily": H.node_homophily(data.adj, data.labels),
        "class_homophily": H.class_homophily(data.adj, data.labels),
        "aggregation_homophily": H.aggregation_homophily(
            data.features, data.adj, data.labels
        ),
    }
    print(json.dumps(out))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="acmgnn_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train")
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_sweep = sub.add_parser("sweep")
    _add_train_args(p_sweep)
    p_sweep.set_defaults(fn=cmd_sweep)

    p_gg = sub.add_parser("gen-graphs")
    p_gg.add_argument("--base_dir", default="./synthetic_graphs")
    p_gg.add_argument("--graph_type", choices=["regular", "random"],
                      default="random")
    p_gg.add_argument("--edge_homos", type=float, nargs="+",
                      default=[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
    p_gg.add_argument("--num_graph", type=int, default=10)
    p_gg.add_argument("--num_class", type=int, default=5)
    p_gg.add_argument("--num_node_total", type=int, default=2000)
    p_gg.add_argument("--degree_intra", type=int, default=2)
    p_gg.add_argument("--seed", type=int, default=0)
    p_gg.set_defaults(fn=cmd_gen_graphs)

    p_gf = sub.add_parser("gen-feats")
    p_gf.add_argument("--base_dataset", default="cora")
    p_gf.add_argument("--out_dir", default="./synthetic_graphs/features")
    p_gf.add_argument("--num_class", type=int, default=5)
    p_gf.add_argument("--node_per_class", type=int, default=400)
    p_gf.add_argument("--num_realizations", type=int, default=10)
    p_gf.add_argument("--seed", type=int, default=0)
    p_gf.set_defaults(fn=cmd_gen_feats)

    p_st = sub.add_parser("synthetic-train")
    _add_train_args(p_st)
    p_st.add_argument("--base_dir", default="./synthetic_graphs")
    p_st.add_argument("--graph_type", choices=["regular", "random"],
                      default="random")
    p_st.add_argument("--edge_homo", type=float, default=0.5)
    p_st.add_argument("--num_graph", type=int, default=10)
    p_st.add_argument("--features_dir", default="")
    p_st.set_defaults(fn=cmd_synthetic_train)

    p_h = sub.add_parser("homophily")
    p_h.add_argument("--dataset", default="texas")
    p_h.set_defaults(fn=cmd_homophily)

    p_pred = sub.add_parser(
        "predict", help="restore a checkpoint and emit per-node predictions"
    )
    _add_train_args(p_pred)
    p_pred.add_argument("--checkpoint", required=True,
                        help="checkpoint path (e.g. <dir>/split0_best)")
    p_pred.add_argument("--output", default="",
                        help="output .npz (logits/preds/probs); default "
                             "<dataset>_predictions.npz")
    p_pred.set_defaults(fn=cmd_predict)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
