"""Probe: joint train+eval loop x gather dtype at twitch-gamers scale.

PERF.md records the joint fused-gather loop as a wash at f32 (322 vs
310 ms/epoch): the 4-wide (4x64 f32 = 1KB) gather rows cross from the
descriptor-rate wall (~368M rows/s) into the random-access bandwidth
wall, cancelling the 2x descriptor halving.  Hypothesis: with bf16
gather rows the joint gather stays at 512B/row — descriptor-bound —
so the halving should materialize (~25% epoch-time cut).

Run SOLO on the TPU (CLAUDE.md: never two TPU processes).
  python -u tools/joint_bf16_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from acmgnn_tpu.ops.graph import GraphData
    from acmgnn_tpu.train.config import TrainConfig
    from acmgnn_tpu.train.trainer import (
        build_model,
        make_split_runner,
        prepare_data,
    )
    import jax.numpy as jnp

    from bench import _twitch_gamers_scale_graph

    adj, features, labels = _twitch_gamers_scale_graph()
    epochs = 30

    scenarios = [
        ("seq_f32", False, "float32"),
        ("joint_f32", True, "float32"),
        ("seq_bf16", False, "bfloat16"),
        ("joint_bf16", True, "bfloat16"),
    ]

    results = {}
    prepared = {}
    for name, joint, dtype in scenarios:
        cfg = TrainConfig(
            model_type="acmgcnp",
            hidden=64,
            dropout=0.5,
            lr=0.01,
            weight_decay=1e-3,
            epochs=epochs,
            early_stopping=0,
            selection="val_metric",
            operator_format="ell",
            spmm_dtype=dtype,
        )
        if dtype not in prepared:
            data = GraphData(
                name="twitch-gamers-scale", adj=adj, features=features,
                labels=labels,
            )
            prepared[dtype] = prepare_data(data, cfg)
        data, ops, x, y, y1h, nclass = prepared[dtype]
        n = data.num_nodes
        rng = np.random.default_rng(0)
        perm = rng.permutation(n)
        masks_np = np.zeros((3, n), bool)
        masks_np[0, perm[: n // 2]] = True
        masks_np[1, perm[n // 2 : 3 * n // 4]] = True
        masks_np[2, perm[3 * n // 4 :]] = True
        masks = tuple(jnp.asarray(m) for m in masks_np)

        model = build_model(cfg, nclass, n)
        runner = jax.jit(make_split_runner(model, cfg, joint=joint))
        variables = model.init(jax.random.key(0), x, ops)

        # compile + warmup (discard), then timed run with a distinct key
        jax.device_get(
            runner(variables, jax.random.key(1), ops, x, y, y1h, masks)
        )
        t0 = time.perf_counter()
        res = runner(variables, jax.random.key(2), ops, x, y, y1h, masks)
        jax.device_get(res)
        dt = time.perf_counter() - t0
        epoch_ms = 1000.0 * dt / epochs
        results[name] = round(epoch_ms, 1)
        print(json.dumps({"scenario": name, "epoch_ms": round(epoch_ms, 2),
                          "test_metric": float(res.test_metric)}), flush=True)

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
