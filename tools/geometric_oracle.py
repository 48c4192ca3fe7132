"""Large-scale (ACM-Geometric) protocol oracle: planted-signal parity.

The real LINKX raw files are absent (zero-egress environment), so nothing
in PARITY.md previously validated that the stepwise BCE/ROC-AUC /
argmax-valid pipeline reaches reference accuracy at LINKX scale.  This
driver closes that gap: it generates a planted-signal LINKX-shaped graph
(SBM-ish structure + class-informative sparse binary features), then
trains

- the REFERENCE's own ACM-Geometric pipeline (torch CPU; layers/models
  loaded in-process, train loop mirrored from
  /root/reference/ACM-Geometric/train.py:95-171 — Adam, per-epoch eval,
  test @ argmax-valid, no early stopping), and
- OUR ``run_experiment_stepwise``

on identical data and 50/25/25 splits, for both protocols:
``acc`` (NLL + accuracy) and ``rocauc`` (genius-style binary labels,
one-hot BCE + ROC-AUC).

Usage (CPU; run each side separately, both write results.jsonl):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -u \
      tools/geometric_oracle.py --task acc --side both \
      --n 100000 --epochs 150 --num_splits 2
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import types
from pathlib import Path

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path(__file__).resolve().parent.parent / "experiments" / "geometric_oracle"


# ---------------------------------------------------------------------------
# Planted-signal graph (shared npz so both sides see identical data)
# ---------------------------------------------------------------------------


def make_planted(n, task, seed=42, avg_deg=10, f=64, homophily=0.3,
                 n_labels=16):
    """Heterophilous SBM-flavored graph + class-informative binary features.

    ``acc``: 5 balanced classes.  ``rocauc``: binary 75/25 labels (ROC-AUC
    only makes sense off-balance).  ``multilabel``: the ogbn-proteins
    protocol (/root/reference/ACM-Geometric/train.py:122-131,
    dataset.py:186-202) — a [N, n_labels] binary matrix, each column a
    noisy indicator of a random latent-class subset, trained with BCE
    over all columns and scored by per-column ROC-AUC.  homophily=0.3
    puts useful signal in BOTH the low-pass and high-pass channels — the
    ACM regime.
    """
    rng = np.random.default_rng(seed)
    c = 5 if task in ("acc", "multilabel") else 2
    if task in ("acc", "multilabel"):
        labels = rng.integers(0, c, size=n)
    else:
        labels = (rng.random(n) < 0.25).astype(np.int64)

    # edges: src uniform; dst same-class w.p. homophily else other-class
    e = n * avg_deg // 2
    src = rng.integers(0, n, size=e)
    same = rng.random(e) < homophily
    by_class = [np.flatnonzero(labels == k) for k in range(c)]
    dst = np.empty(e, dtype=np.int64)
    lab_src = labels[src]
    for k in range(c):
        in_k = lab_src == k
        n_k = int(in_k.sum())
        pick_same = same & in_k
        pick_other = (~same) & in_k
        dst[pick_same] = rng.choice(by_class[k], size=int(pick_same.sum()))
        others = np.flatnonzero(labels != k)
        dst[pick_other] = others[
            rng.integers(0, others.shape[0], size=int(pick_other.sum()))
        ]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    adj = sp.coo_matrix(
        (np.ones(src.shape[0]), (src, dst)), shape=(n, n)
    )
    adj = ((adj + adj.T) > 0).astype(np.float64).tocsr()

    # sparse binary features: class k elevates its own feature block.
    # The binary (rocauc) task gets a much weaker elevation — at 0.35 it
    # saturates AUC ~1.0 and validates nothing.
    block = f // c
    p = np.full((n, f), 0.05)
    elevation = 0.09 if task == "rocauc" else 0.35
    for k in range(c):
        rows = labels == k
        p[np.ix_(rows, np.arange(k * block, (k + 1) * block))] = elevation
    features = (rng.random((n, f)) < p).astype(np.float32)

    if task == "multilabel":
        # each label column indicates membership in a random ~2-class
        # subset of the latent classes, flipped with 15% noise — AUC per
        # column is learnable but not saturated
        col_sets = rng.random((n_labels, c)) < 0.4
        col_sets[~col_sets.any(axis=1), 0] = True  # no empty subsets
        ml = col_sets[:, labels].T.astype(np.int64)  # [n, n_labels]
        flip = rng.random((n, n_labels)) < 0.15
        labels = np.where(flip, 1 - ml, ml)

    # 50/25/25 random splits (LINKX protocol,
    # /root/reference/ACM-Geometric/data_utils.py:14-32)
    splits = []
    for i in range(10):
        srng = np.random.default_rng(seed + 1000 + i)
        perm = srng.permutation(n)
        n_tr, n_va = int(0.5 * n), int(0.25 * n)
        splits.append(
            {
                "train": perm[:n_tr],
                "valid": perm[n_tr : n_tr + n_va],
                "test": perm[n_tr + n_va :],
            }
        )
    return adj, features, labels.astype(np.int64), splits


def load_or_make(n, task, seed):
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    cache = OUT_DIR / f"planted_{task}_n{n}_s{seed}.npz"
    if cache.exists():
        with np.load(cache) as z:
            adj = sp.csr_matrix(
                (z["adj_data"], z["adj_indices"], z["adj_indptr"]),
                shape=(n, n),
            )
            splits = [
                {k: z[f"split{i}_{k}"] for k in ("train", "valid", "test")}
                for i in range(10)
            ]
            return adj, z["features"], z["labels"], splits
    adj, features, labels, splits = make_planted(n, task, seed)
    payload = {
        "adj_data": adj.data,
        "adj_indices": adj.indices,
        "adj_indptr": adj.indptr,
        "features": features,
        "labels": labels,
    }
    for i, s in enumerate(splits):
        for k, v in s.items():
            payload[f"split{i}_{k}"] = v
    np.savez_compressed(cache, **payload)
    return adj, features, labels, splits


# ---------------------------------------------------------------------------
# Reference side (torch CPU, in-process)
# ---------------------------------------------------------------------------


def _load_geometric_modules():
    """Import the reference ACM-Geometric layers+models with shims for the
    absent dgl/torch_sparse wheels (PUBLIC UNTRUSTED reference code, used
    strictly as a computational oracle)."""
    for name in ("dgl", "dgl.function", "dgl.utils", "dgl.nn", "dgl.nn.pytorch"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["dgl"].function = sys.modules["dgl.function"]
    sys.modules["dgl"].utils = sys.modules["dgl.utils"]
    sys.modules["dgl"].nn = sys.modules["dgl.nn"]
    sys.modules["dgl.nn"].pytorch = sys.modules["dgl.nn.pytorch"]
    if "torch_sparse" not in sys.modules:
        ts = types.ModuleType("torch_sparse")
        ts.SparseTensor, ts.matmul = None, None
        sys.modules["torch_sparse"] = ts

    def load(alias, path):
        spec = importlib.util.spec_from_file_location(alias, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[alias] = mod
        spec.loader.exec_module(mod)
        return mod

    layers = load("layers", "/root/reference/ACM-Geometric/layers.py")
    models = load("ref_geo_models", "/root/reference/ACM-Geometric/models.py")
    return layers, models


def run_reference(adj, features, labels, splits, args):
    import torch
    import torch.nn.functional as F
    from sklearn.metrics import roc_auc_score

    from acmgnn_tpu.ops.graph import high_pass, row_normalize, row_normalized_adjacency

    _, models_mod = _load_geometric_modules()
    torch.set_num_threads(8)

    n, d = features.shape
    multilabel = labels.ndim > 1
    c = labels.shape[1] if multilabel else int(labels.max()) + 1
    rocauc = args.task in ("rocauc", "multilabel")

    # feature row-normalize (train.py:69-73; acmgcnp w/o structure_info)
    feats = row_normalize(sp.csr_matrix(features)).toarray().astype(np.float32)
    x = torch.from_numpy(feats)

    def to_torch(m):
        coo = sp.coo_matrix(m)
        idx = torch.tensor(np.vstack([coo.row, coo.col]), dtype=torch.long)
        return torch.sparse_coo_tensor(
            idx, torch.tensor(coo.data.astype(np.float32)), coo.shape
        ).coalesce()

    adj_low_sp = row_normalized_adjacency(adj)
    adj_low = to_torch(adj_low_sp)
    adj_high = to_torch(high_pass(adj_low_sp))
    label_t = torch.from_numpy(labels).long()

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    def eval_metric(out, idx):
        if multilabel:
            # reference eval_rocauc multilabel branch
            # (/root/reference/ACM-Geometric/data_utils.py:128-151):
            # per-column AUC on raw logits, averaged over columns where
            # both classes appear
            y = labels[idx]
            scores = out[idx].numpy()
            aucs = [
                roc_auc_score(y[:, i], scores[:, i])
                for i in range(y.shape[1])
                if 0 < y[:, i].sum() < y.shape[0]
            ]
            return float(np.mean(aucs))
        if rocauc:
            prob = F.softmax(out[idx], dim=-1)[:, 1].numpy()
            return roc_auc_score(labels[idx], prob)
        pred = out[idx].argmax(dim=-1).numpy()
        return float((pred == labels[idx]).mean())

    test_at_best = []
    for run in range(args.num_splits):
        s = splits[run]
        tr = torch.from_numpy(s["train"]).long()
        model = models_mod.GCN(
            nfeat=d, nhid=args.hidden, nclass=c, nlayers=1, nnodes=n,
            dropout=args.dropout, model_type=args.method,
            structure_info=0, variant=bool(args.variant),
        )
        opt = torch.optim.Adam(
            model.parameters(), lr=args.lr, weight_decay=args.weight_decay
        )
        best_val, best_test = -np.inf, 0.0
        t0 = time.time()
        for epoch in range(args.epochs):
            model.train()
            opt.zero_grad()
            out = model(x, adj_low, adj_high, None)
            if multilabel:
                # BCE over the full [N, C] label matrix
                # (/root/reference/ACM-Geometric/train.py:122-131)
                loss = torch.nn.BCEWithLogitsLoss()(
                    out[tr], label_t[tr].float()
                )
            elif rocauc:
                true = F.one_hot(label_t, c).float()
                loss = torch.nn.BCEWithLogitsLoss()(out[tr], true[tr])
            else:
                loss = torch.nn.NLLLoss()(
                    F.log_softmax(out, dim=1)[tr], label_t[tr]
                )
            loss.backward()
            opt.step()
            model.eval()
            with torch.no_grad():
                out = model(x, adj_low, adj_high, None)
                val = eval_metric(out, s["valid"])
                if val > best_val:
                    best_val = val
                    best_test = eval_metric(out, s["test"])
            if epoch % 25 == 0:
                print(
                    f"[ref] run {run} epoch {epoch}: loss {loss:.4f} "
                    f"val {val:.4f} test@best {best_test:.4f} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        test_at_best.append(best_test)
        print(f"[ref] run {run}: test@argmax-valid {best_test:.4f}", flush=True)
    return {
        "side": "reference",
        "test_mean": float(np.mean(test_at_best)),
        "test_std": float(np.std(test_at_best)),
    }


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------


def run_ours(adj, features, labels, splits, args):
    from acmgnn_tpu.ops.graph import GraphData
    from acmgnn_tpu.train.config import TrainConfig
    from acmgnn_tpu.train.trainer import (
        run_experiment,
        run_experiment_stepwise,
    )

    rocauc = args.task in ("rocauc", "multilabel")
    data = GraphData(
        name=f"planted-{args.task}",
        adj=adj,
        features=features,
        labels=labels.astype(np.int32),
        splits=splits,
    )
    cfg = TrainConfig(
        model_type=args.method,
        hidden=args.hidden,
        variant=bool(args.variant),
        lr=args.lr,
        weight_decay=args.weight_decay,
        dropout=args.dropout,
        epochs=args.epochs,
        early_stopping=0,
        optimizer="adam",
        selection="val_metric",
        metric="rocauc" if rocauc else "acc",
        loss="bce" if rocauc else "nll",
        num_splits=args.num_splits,
        fixed_splits=True,  # use the attached planted splits
        seed=args.seed,
    )
    if args.runner == "fused":
        out = run_experiment(data, cfg)
    else:
        out = run_experiment_stepwise(data, cfg, display_step=25)
    return {
        "side": f"ours-{args.runner}",
        "test_mean": float(out["test_mean"]),
        "test_std": float(out["test_std"]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--task", choices=["acc", "rocauc", "multilabel"], required=True
    )
    p.add_argument("--side", choices=["ref", "ours", "both"], default="both")
    p.add_argument("--runner", choices=["stepwise", "fused"],
                   default="stepwise")
    p.add_argument("--method", default="acmgcnp")
    p.add_argument("--variant", type=int, default=0)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--num_splits", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    adj, features, labels, splits = load_or_make(args.n, args.task, args.seed)
    c_desc = (
        f"{labels.shape[1]} label columns" if labels.ndim > 1
        else f"c={int(labels.max()) + 1}"
    )
    print(
        f"planted {args.task}: n={adj.shape[0]} nnz={adj.nnz} "
        f"f={features.shape[1]} {c_desc}",
        flush=True,
    )

    results = []
    if args.side in ("ours", "both"):
        results.append(run_ours(adj, features, labels, splits, args))
    if args.side in ("ref", "both"):
        results.append(run_reference(adj, features, labels, splits, args))

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    with open(OUT_DIR / "results.jsonl", "a") as f:
        for r in results:
            rec = {
                "task": args.task,
                "method": args.method,
                "variant": args.variant,
                "n": args.n,
                "epochs": args.epochs,
                "num_splits": args.num_splits,
                **r,
            }
            f.write(json.dumps(rec) + "\n")
            print("RESULT " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
