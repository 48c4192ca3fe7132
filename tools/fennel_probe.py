"""Probe: Fennel vs contiguous partitioning — halo volume + sharded SpMM.

VERDICT r1 item #5: quantify what the streaming min-cut partitioner
(parallel/partition.py fennel_partition) buys over nnz-balanced
contiguous blocks.  For each bench graph this records, at 8 parts:

- directed edge cut (the raw cross-part nnz),
- dedup'd halo rows (what exchange="halo" actually sends, fwd operator),
- halo_pad (the padded all_to_all slab width — the real wire cost), and
- optionally (--time) the sharded ELL SpMM wall time on the 8-device
  virtual CPU mesh (collective volume shows up as memcpy time there).

Graphs: the uniform twitch-gamers stand-in, the power-law and banded
bench graphs (bench.py), and a community-structured SBM at the same
scale — the case METIS-style partitioning exists for.  The uniform /
power-law stand-ins have NO community structure by construction, so
fennel is expected to tie there; honesty requires showing that, not
hiding it.

CPU-only host-side by default:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -u \
      tools/fennel_probe.py [--time]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def community_scale_graph(seed=0, n_comm=64, size=2627, avg_deg=40,
                          p_intra=0.9):
    """~168k-node SBM: 90% of edges intra-community, ids shuffled."""
    rng = np.random.default_rng(seed)
    n = n_comm * size
    e = n * avg_deg // 2
    comm_of = np.repeat(np.arange(n_comm), size)
    src = rng.integers(0, n, size=e, dtype=np.int64)
    intra = rng.random(e) < p_intra
    # intra edges stay within src's community block
    dst = np.where(
        intra,
        (src // size) * size + rng.integers(0, size, size=e),
        rng.integers(0, n, size=e, dtype=np.int64),
    )
    perm = rng.permutation(n)
    from acmgnn_tpu.ops.native import build_sym_adjacency

    return build_sym_adjacency(perm[src], perm[dst], n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--time", action="store_true",
                   help="also time sharded ELL SpMM on the 8-dev CPU mesh")
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--graphs", default="twitch,powerlaw,banded,community")
    args = p.parse_args()

    from bench import (
        _banded_scale_graph,
        _powerlaw_scale_graph,
        _twitch_gamers_scale_graph,
    )
    from acmgnn_tpu.ops.graph import permute_graph, row_normalized_adjacency
    from acmgnn_tpu.parallel.partition import (
        build_halo_schedule,
        build_sharded_coo,
        edge_cut,
        fennel_partition,
        partition_rows,
        partition_to_perm,
    )

    makers = {
        "twitch": lambda: _twitch_gamers_scale_graph()[0],
        "powerlaw": lambda: _powerlaw_scale_graph()[0],
        "banded": lambda: _banded_scale_graph()[0],
        "community": community_scale_graph,
    }
    results = {}
    for name in args.graphs.split(","):
        adj = makers[name]()
        n_parts = args.parts
        row = {"nodes": adj.shape[0], "nnz": int(adj.nnz)}
        for scheme in ("contiguous", "fennel"):
            t0 = time.time()
            if scheme == "fennel":
                part = fennel_partition(adj, n_parts)
                perm, boundaries = partition_to_perm(part, n_parts)
                adj_s = permute_graph(adj, perm)
            else:
                boundaries = partition_rows(adj, n_parts)
                part = np.zeros(adj.shape[0], np.int32)
                for i in range(n_parts):
                    part[boundaries[i]:boundaries[i + 1]] = i
                adj_s = adj
            t_part = time.time() - t0
            a_hat = row_normalized_adjacency(adj_s)
            blocks = build_sharded_coo(
                a_hat, n_parts, boundaries=boundaries
            )
            halo = build_halo_schedule(blocks)
            rec = {
                "edge_cut": edge_cut(adj, part),  # part is in original ids
                "halo_rows": int(halo["halo_rows"]),
                "halo_pad": int(halo["halo_pad"]),
                "allgather_rows_equiv": int(
                    (n_parts - 1) * blocks["rows_per_part"] * n_parts
                ),
                "partition_s": round(t_part, 2),
            }
            if args.time:
                import jax

                from acmgnn_tpu.parallel.sharded import (
                    make_graph_mesh,
                    make_sharded_ell_op,
                    shard_node_array,
                    sharded_ell_spmm,
                )

                mesh = make_graph_mesh(jax.devices()[:n_parts])
                op, b2 = make_sharded_ell_op(
                    a_hat, mesh, boundaries=boundaries, exchange="halo"
                )
                x = shard_node_array(
                    np.random.default_rng(0).normal(
                        size=(adj.shape[0], 64)
                    ).astype(np.float32),
                    b2, op.rows_per_part, mesh,
                )
                f = jax.jit(lambda x_: sharded_ell_spmm(op, x_, mesh))
                jax.block_until_ready(f(x))
                reps = 5
                t0 = time.perf_counter()
                out = x
                for _ in range(reps):
                    out = f(out)
                jax.block_until_ready(out)
                rec["spmm_ms"] = round(
                    (time.perf_counter() - t0) / reps * 1000, 1
                )
            row[scheme] = rec
            print(f"{name}/{scheme}: {json.dumps(rec)}", flush=True)
        row["halo_reduction"] = round(
            row["contiguous"]["halo_rows"]
            / max(row["fennel"]["halo_rows"], 1),
            2,
        )
        results[name] = row

    out = Path(__file__).resolve().parent.parent / "experiments" / "fennel_probe.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
