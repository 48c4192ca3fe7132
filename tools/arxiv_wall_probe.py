"""Probe: one more measured attack on the arXiv-year 1.04x wall.

PERF.md's Table-16 suite has arxiv-year-scale at ~70 ms/epoch vs the
73 ms V100 baseline (1.04x) with a descriptor-wall explanation.  VERDICT
r1 (weak #3) asks for one more measured attempt before the wall is
declared.  This sweeps the remaining per-graph knobs on the exact bench
scenario: RCM reorder, hub threshold at this degree profile (Poisson
~14 — no real hubs, so auto-2048 never fires; try forcing low/off),
scan-chunk width kc, int32 packing of the joint 4x64 bf16 gather
(exactly the <=256-column case the round-2 gate allows), and the
sequential (non-joint) loop.

Run SOLO on the TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python -u tools/arxiv_wall_probe.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from bench import bench_epoch_linkx_scale

    sweeps = [
        ("baseline", {}, {}),
        ("rcm", dict(reorder="rcm"), {}),
        ("hub_off", dict(hub_threshold=-1), {}),
        ("hub_512", dict(hub_threshold=512), {}),
        ("kc_16", dict(kc=16), {}),
        ("kc_4", dict(kc=4), {}),
        ("pack", {}, {"ACMGNN_ELL_PACK": "1"}),
        ("seq_loop", {}, {"ACMGNN_BENCH_JOINT": "0"}),
    ]
    results = {}
    for name, kwargs, env in sweeps:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            out = bench_epoch_linkx_scale("arxiv_year", **kwargs)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            os.environ.pop("ACMGNN_ELL_KC", None)
        results[name] = {
            "epoch_ms": out["value"],
            "vs_baseline": out["vs_baseline"],
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)

    out_path = Path(__file__).resolve().parent.parent / "experiments" / "arxiv_wall_probe.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
