"""Dedicated acmsnowball2_v1/squirrel search (VERDICT r2 item #6).

Table-2's worst residual cell (-3.48 sigma; paper 53.48 +- 0.60).  The
r2 coarse screen found 51.39 +- 1.50 and the paper's own Table-12 tuned
config reproduces only 46.75 +- 5.76 under the exact protocol
(experiments/tuned/random_acmsnowball2_v1_squirrel.json), so this
attempt runs a FINE full-protocol grid bracketing both the screen's
winner (0.05, 5e-5, 0.5) and the paper config (0.1, 5e-6, 0.6) —
10 splits x 1000 epochs x ES 200 per point, swept-engine fast path.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from acmgnn_tpu.train.config import TrainConfig
from acmgnn_tpu.train.sweep import grid_search


def main():
    base = TrainConfig(
        model_type="acmsnowball", nlayers=2, variant=True, hidden=64,
        epochs=1000, early_stopping=200, num_splits=10,
        fixed_splits=False, selection="val_loss",
    )
    grid = {
        "lr": [0.03, 0.05, 0.08, 0.1],
        "weight_decay": [5e-6, 1e-5, 5e-5, 1e-4],
        "dropout": [0.4, 0.5, 0.6, 0.7],
    }
    out = grid_search(
        "squirrel", base, grid,
        out_path="experiments/table2/acmsnowball2_v1_squirrel_dedicated.json",
    )
    print("BEST", json.dumps(
        {k: out[k] for k in ("test_mean", "test_std")}
        | {k: out["config"][k] for k in ("lr", "weight_decay", "dropout")}
    ))


if __name__ == "__main__":
    main()
