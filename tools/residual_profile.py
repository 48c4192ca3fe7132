"""Attribute a bench scenario's epoch time above the gather floor.

VERDICT r3 items #3 (headline ~45 ms residual) and #5 (genius 58 ms of
non-gather time) ask for a trace-backed breakdown, not prose.  This tool

1. rebuilds a bench scenario exactly as bench.py does (same builders,
   same headline config),
2. captures a ``jax.profiler`` trace of a short fused run (few epochs),
3. parses the xplane protobuf directly (the tensorboard-plugin
   converter is broken against this TF build; the XSpace proto itself
   is importable) and aggregates device-plane op durations into labeled
   groups (gather / reduce / dot / sort / convert / other),
4. writes ``experiments/residual_profile_<scenario>.json`` with the
   per-op table, group totals, and the scenario's measured epoch time
   for the PERF.md attribution.

Run SOLO on the TPU (shared chip — see CLAUDE.md):
    python -u tools/residual_profile.py --scenario epoch
    python -u tools/residual_profile.py --scenario epoch_genius
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# the xplane proto only imports under the pure-python protobuf impl
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np  # noqa: E402


def build_scenario(scenario):
    """Same graph/config/runner as the bench scenario, short epoch count."""
    import jax
    import jax.numpy as jnp

    import bench
    from acmgnn_tpu.ops.graph import GraphData
    from acmgnn_tpu.ops.native import build_sym_adjacency
    from acmgnn_tpu.train.config import TrainConfig
    from acmgnn_tpu.train.trainer import (
        build_model,
        make_split_runner,
        prepare_data,
    )

    epochs = int(os.environ.get("ACMGNN_PROFILE_EPOCHS", "10"))
    wiki = scenario == "epoch_wiki"
    if scenario == "epoch":
        adj, features, labels = bench._twitch_gamers_scale_graph()
        spec = dict(model="acmgcnp", rocauc=False, structure_info=False)
        f = features.shape[1]
    elif wiki:
        # mirror bench.bench_epoch_wiki's graph + config exactly
        # (sequential loop + remat + bf16 feature storage — the measured
        # single-chip memory ladder; PERF.md wiki section)
        adj, features, labels = bench._wiki_scale_graph()
        spec = dict(model="acmgcnp", rocauc=False, structure_info=False,
                    c=5)
        f = features.shape[1]
    else:
        name = scenario.removeprefix("epoch_")
        spec = bench.LINKX_SCALE[name]
        rng = np.random.default_rng(0)
        n, e = spec["n"], spec["e"]
        src, dst = bench._chung_lu_edges(n, e, spec.get("max_deg", 0), 0)
        # drop_self_loops matches bench.py (ADVICE r4: a self-loop'd
        # build makes D^-1(A+I) rows non-uniform, so the profile would
        # exercise valued planes while the bench runs value-free)
        adj = build_sym_adjacency(src, dst, n, drop_self_loops=True)
        features = rng.normal(size=(n, spec["f"])).astype(np.float32)
        labels = rng.integers(0, spec["c"], size=n).astype(np.int32)
        f = spec["f"]
    data = GraphData(
        name=f"{scenario}-profile", adj=adj, features=features,
        labels=labels,
    )
    cfg = TrainConfig(
        model_type=spec["model"],
        hidden=64,
        dropout=0.5,
        lr=0.01,
        weight_decay=1e-3,
        epochs=epochs,
        early_stopping=0,
        structure_info=spec.get("structure_info", False),
        selection="val_metric",
        metric="rocauc" if spec.get("rocauc") else "acc",
        loss="bce" if spec.get("rocauc") else "nll",
        operator_format="ell",
        spmm_dtype=os.environ.get("ACMGNN_BENCH_DTYPE", "bfloat16"),
        # default to the SCENARIO's gemm dtype (penn94/penn94_pp bench
        # with bf16 GEMMs — profiling them at f32 attributed a config
        # the bench doesn't ship)
        gemm_dtype=os.environ.get(
            "ACMGNN_BENCH_GEMM", spec.get("gemm", "float32")
        ),
        joint=(os.environ.get("ACMGNN_BENCH_JOINT", "0" if wiki else "1")
               == "1"),
        hoist_first=(
            os.environ.get(
                "ACMGNN_BENCH_HOIST_WIKI" if wiki else "ACMGNN_BENCH_HOIST",
                "0" if wiki else "1",
            ) == "1"
        ),
        remat=wiki and os.environ.get("ACMGNN_BENCH_REMAT", "1") == "1",
        feature_dtype=(
            os.environ.get("ACMGNN_BENCH_FDTYPE", "bfloat16")
            if wiki else "float32"
        ),
    )
    data, ops, x, y, y1h, nclass = prepare_data(data, cfg)
    n = data.num_nodes
    rng = np.random.default_rng(1)
    perm = rng.permutation(n)
    masks_np = np.zeros((3, n), bool)
    masks_np[0, perm[: n // 2]] = True
    masks_np[1, perm[n // 2: 3 * n // 4]] = True
    masks_np[2, perm[3 * n // 4:]] = True
    masks = tuple(jnp.asarray(m) for m in masks_np)
    model = build_model(cfg, nclass, n)
    runner = jax.jit(make_split_runner(model, cfg))
    variables = model.init(jax.random.key(0), x, ops)
    args = (variables, ops, x, y, y1h, masks)
    return runner, args, cfg, epochs, f


def parse_xspace(trace_dir, line_filter=("XLA Ops",)):
    """Aggregate device-plane event durations by op name.

    Device planes nest (Steps ⊃ Modules ⊃ Ops, plus an overlapped Async
    line), so summing every line double-counts; the "XLA Ops" line holds
    the non-overlapping leaf executions and is what attribution should
    use.  Returns (plane_name -> {op_name: total_ms}) restricted to
    ``line_filter`` lines on device planes (host planes keep all
    lines)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    out = {}
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(p.read_bytes())
        for plane in xs.planes:
            is_dev = "TPU" in plane.name or "GPU" in plane.name
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            agg = {}
            for line in plane.lines:
                if is_dev and line_filter and line.name not in line_filter:
                    continue
                # SELF time: control ops (while/fusion wrappers) span
                # their children on the same line, so inclusive sums
                # double-count — subtract directly-nested durations via
                # an interval stack over the (sorted) events
                evs = sorted(
                    line.events, key=lambda e: (e.offset_ps, -e.duration_ps)
                )
                stack = []  # (end_ps, index into selfs)
                selfs = []
                for ev in evs:
                    start, dur = ev.offset_ps, ev.duration_ps
                    while stack and stack[-1][0] <= start:
                        stack.pop()
                    if stack:
                        selfs[stack[-1][1]] -= dur
                    selfs.append(dur)
                    stack.append((start + dur, len(selfs) - 1))
                for ev, sf in zip(evs, selfs):
                    nm = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[nm] = agg.get(nm, 0.0) + max(sf, 0) / 1e9
            if agg:
                prev = out.setdefault(plane.name, {})
                for k, v in agg.items():
                    prev[k] = prev.get(k, 0.0) + v
    return out


def _classify(name):
    """Bucket one XLA op by its RESULT-NAME prefix (XLA names fusions
    after their root op), not by substring over the whole line — the
    textual operand list contains 'calls=%fused_computation...', which a
    naive substring match mis-bucketed as control flow."""
    low = name.lower()
    lhs = low.lstrip("%").split(" ", 1)[0]      # e.g. fusion.932
    lhs = lhs.rsplit(".", 1)[0]                  # strip the id
    if "while" in lhs or "conditional" in lhs:
        return "loop-overhead"
    if lhs.startswith(("copy", "bitcast", "transpose", "convert",
                       "reshape", "broadcast", "dynamic-update-slice")):
        return "copy/layout"
    if "sort" in lhs:
        return "sort"
    if "gather" in lhs:
        return "gather"
    if "reduce" in lhs:
        return "reduce"
    if "dot" in lhs or "conv" in lhs:
        return "dot/MXU"
    if "scatter" in lhs:
        return "scatter"
    if lhs.startswith("fusion") or lhs.startswith("pad_clamp"):
        # anonymous kCustom fusions taking an s32 index operand are the
        # ELL row gathers (pad_clamp_fusion feeds the clamped indices)
        if "pad_clamp_fusion" in low or "s32[" in low.split("fusion(")[-1]:
            return "gather"
        return "fusion/elementwise"
    return "other"


def group_ops(agg):
    groups = {}
    for name, ms in agg.items():
        g = _classify(name)
        groups[g] = groups.get(g, 0.0) + ms
    return dict(sorted(groups.items(), key=lambda kv: -kv[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="epoch")
    ap.add_argument("--trace_dir", default=None,
                    help="default /tmp/acmgnn_residual_trace_<scenario>")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.trace_dir is None:
        args.trace_dir = f"/tmp/acmgnn_residual_trace_{args.scenario}"

    import jax

    runner, rargs, cfg, epochs, f = build_scenario(args.scenario)
    variables, ops, x, y, y1h, masks = rargs
    # warm (compile) + one clean timed run for the reference epoch_ms
    jax.device_get(runner(variables, jax.random.key(1), *rargs[1:]))
    t0 = time.perf_counter()
    jax.device_get(runner(variables, jax.random.key(2), *rargs[1:]))
    epoch_ms = 1000.0 * (time.perf_counter() - t0) / epochs

    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        jax.device_get(runner(variables, jax.random.key(3), *rargs[1:]))

    planes = parse_xspace(args.trace_dir)
    print(f"planes found: {list(planes)}", file=sys.stderr)
    # pick the device plane(s): anything that isn't the python/host one
    dev_planes = {
        k: v for k, v in planes.items()
        if "python" not in k.lower() and "host" not in k.lower()
    }
    result = {
        "scenario": args.scenario,
        "epochs": epochs,
        "epoch_ms": round(epoch_ms, 3),
        "config": {
            "spmm_dtype": cfg.spmm_dtype,
            "gemm_dtype": cfg.gemm_dtype,
            "joint": cfg.joint,
            "hoist_first": cfg.hoist_first,
            "features": f,
        },
        "planes": {},
    }
    for pname, agg in (dev_planes or planes).items():
        top = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
        total = sum(agg.values())
        result["planes"][pname] = {
            "total_ms": round(total, 3),
            "total_ms_per_epoch": round(total / epochs, 3),
            "groups_ms_per_epoch": {
                k: round(v / epochs, 3)
                for k, v in group_ops(agg).items()
            },
            "top_ops_ms_per_epoch": [
                [nm, round(ms / epochs, 3)] for nm, ms in top
            ],
        }
    out_path = Path(__file__).resolve().parent.parent / "experiments" / (
        f"residual_profile_{args.scenario}.json"
    )
    out_path.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "planes"}))
    for pname, info in result["planes"].items():
        print(f"== {pname}: {info['total_ms_per_epoch']} ms/epoch ==")
        print(json.dumps(info["groups_ms_per_epoch"], indent=1))
        for nm, ms in info["top_ops_ms_per_epoch"][:15]:
            print(f"  {ms:9.3f} ms  {nm}")


if __name__ == "__main__":
    main()
