"""Run the REFERENCE implementation in-process as a parity oracle.

For cells where our tuned-config runs disagree with the paper's
published number, the decisive question is: does the reference's own
code reproduce the paper row under this environment?  This driver
imports /root/reference/ACM-Pytorch (read-only; the gdown dependency is
shimmed out) and mirrors its train.py protocol exactly
(train.py:48-147, utils.py:577-656): seed 42, 10 random disassortative
splits, Adam, NLL on log_softmax, best-val-loss test snapshot,
200-epoch mean-val-loss early stopping.

Torch runs CPU-only here, so keep this to the small datasets.

Usage:
  env -u PALLAS_AXON_POOL_IPS python -u tools/reference_oracle.py \
      --dataset cornell --model acmsnowball --variant 1 --layers 2 \
      --lr 0.05 --weight_decay 1e-2 --dropout 0.6
"""

from __future__ import annotations

import argparse
import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F


def _install_shims():
    # utils.py imports google_drive_downloader at module level for its
    # (unused here) Google-Drive fetch path — zero-egress environment.
    mod = types.ModuleType("google_drive_downloader")

    class GoogleDriveDownloader:
        @staticmethod
        def download_file_from_google_drive(*a, **k):
            raise RuntimeError("no network egress in this environment")

    mod.GoogleDriveDownloader = GoogleDriveDownloader
    sys.modules.setdefault("google_drive_downloader", mod)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--model", default="acmsnowball")
    p.add_argument("--variant", type=int, default=0)
    p.add_argument("--structure_info", type=int, default=0)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--hops", type=int, default=1)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, required=True)
    p.add_argument("--weight_decay", type=float, required=True)
    p.add_argument("--dropout", type=float, required=True)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--early_stopping", type=int, default=200)
    p.add_argument("--num_splits", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    _install_shims()
    import os

    os.chdir("/root/reference/ACM-Pytorch")  # loaders use ../new_data etc.
    sys.path.insert(0, "/root/reference/ACM-Pytorch")
    import utils as rutils  # noqa: E402  (reference module)
    from models.models import GCN  # noqa: E402

    np.random.seed(args.seed)
    torch.manual_seed(args.seed)

    adj_low_unnormalized, features, labels = rutils.load_full_data(
        args.dataset
    )
    if not (args.model in ("acmgcnp", "acmgcnpp") and args.structure_info):
        features = rutils.normalize_tensor(features)
    nnodes = labels.shape[0]
    adj_low = rutils.normalize_tensor(
        torch.eye(nnodes) + adj_low_unnormalized.to_dense()
    )
    adj_high = (torch.eye(nnodes) - adj_low).to_sparse()
    adj_unnorm = adj_low_unnormalized if args.structure_info else None
    if args.model == "acmsgc" and args.hops > 1:
        a = adj_low
        for _ in range(args.hops - 1):
            a = torch.mm(a, adj_low)
        adj_low = a
    adj_low = adj_low.to_sparse()

    criterion = torch.nn.NLLLoss()
    results = []
    t0 = time.time()
    for idx in range(args.num_splits):
        model = GCN(
            nfeat=features.shape[1],
            nhid=args.hidden,
            nclass=labels.max().item() + 1,
            nlayers=args.layers,
            nnodes=nnodes,
            dropout=args.dropout,
            model_type=args.model,
            structure_info=args.structure_info,
            variant=bool(args.variant),
        )
        idx_train, idx_val, idx_test = rutils.random_disassortative_splits(
            labels, labels.max() + 1
        )
        optimizer = torch.optim.Adam(
            model.parameters(), lr=args.lr, weight_decay=args.weight_decay
        )
        curr_res = 0.0
        best_val_loss = float("inf")
        val_loss_history = torch.zeros(args.epochs)
        for epoch in range(args.epochs):
            model.train()
            optimizer.zero_grad()
            output = F.log_softmax(
                model(features, adj_low, adj_high, adj_unnorm), dim=1
            )
            loss = criterion(output[idx_train], labels[idx_train])
            loss.backward()
            optimizer.step()

            model.eval()
            with torch.no_grad():
                output = F.log_softmax(
                    model(features, adj_low, adj_high, adj_unnorm), dim=1
                )
                val_loss = criterion(output[idx_val], labels[idx_val])
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    curr_res = rutils.accuracy(
                        labels[idx_test], output[idx_test]
                    ).item()
                val_loss_history[epoch] = val_loss
                if args.early_stopping > 0 and epoch > args.early_stopping:
                    tmp = torch.mean(
                        val_loss_history[epoch - args.early_stopping : epoch]
                    )
                    if val_loss > tmp:
                        break
        results.append(100 * curr_res)
        print(f"split {idx}: test {results[-1]:.2f} (epochs {epoch})",
              flush=True)
    mean, std = float(np.mean(results)), float(np.std(results))
    print(f"REFERENCE {args.model} v{args.variant} {args.dataset}: "
          f"{mean:.2f}±{std:.2f} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
