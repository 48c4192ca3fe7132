"""Probe slot-sum formulations for the bucketed-ELL SpMM.

The headline xplane trace (tools/residual_profile.py, round 4) breaks
the 135.6 ms epoch into gathers 87.7 ms (at the raw-gather floor),
copy/layout 35.2 ms and reduce 15.0 ms: XLA materializes each chunk's
gather output ``[kc*rows, d]{1,0}`` and then COPIES it to ``{0,1}``
before a transposed dynamic-slice reduce — ~4.4 ms of pure relayout per
big-bucket pass plus carry-update traffic.  This probe times the real
``ell_spmm`` against slot-sum variants that keep every intermediate in
the gather's native ``{1,0}`` layout:

- ``current``   — ``jnp.take(x, c[kc,rows]) * v`` then ``sum(axis=0)``
- ``unroll``    — same gather, reduce over kc by an unrolled add tree
                  over leading-axis slices (no reduce op, no relayout)
- ``per_slot``  — kc separate ``[rows]``-indexed takes accumulated
                  ``[rows, d] += take(x, c[k]) * v[k]`` (same total
                  descriptors, zero [kc, ...] tensors)

Run SOLO on the TPU:  python -u tools/slotsum_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from acmgnn_tpu.ops.ell import EllBucket, make_ell_op
    from acmgnn_tpu.ops.graph import row_normalized_adjacency

    adj, _, _ = bench._twitch_gamers_scale_graph()
    a_hat = row_normalized_adjacency(adj)
    op = make_ell_op(a_hat, gather_dtype=jnp.bfloat16)
    half = op.fwd
    n = op.num_nodes
    rng = np.random.default_rng(0)
    results = {}

    def timeit(f, x, reps=5, chain=4):
        """Chained dependent calls, best-of-N (unique inputs per call)."""
        def chained(x_):
            for _ in range(chain):
                # f32 SpMM output fed back as the next bf16 operand
                # (data dependence defeats dedup/DCE; dtype regime kept)
                x_ = (f(x_) + x_.astype(jnp.float32) * 1e-12).astype(
                    jnp.bfloat16
                )
            return x_

        g = jax.jit(chained)
        jax.device_get(g(x))
        best = float("inf")
        for i in range(reps):
            xi = x + jnp.asarray(i * 1e-6, x.dtype)
            t0 = time.perf_counter()
            jax.device_get(g(xi))
            best = min(best, time.perf_counter() - t0)
        return 1000.0 * best / chain

    def spmm_with(bucket_fn, x):
        parts = []
        if half.hub_mat is not None:
            parts.append(
                jnp.dot(half.hub_mat.astype(x.dtype), x,
                        preferred_element_type=jnp.float32)
            )
        parts += [bucket_fn(b, x) for b in half.buckets]
        if half.num_zero_rows:
            parts.append(jnp.zeros((half.num_zero_rows, x.shape[1]),
                                   jnp.float32))
        return jnp.take(jnp.concatenate(parts, axis=0), half.inv_perm,
                        axis=0)

    def bucket_current(b, x):
        from acmgnn_tpu.ops.ell import _bucket_spmm

        return _bucket_spmm(b, x)

    def bucket_unroll(b, x):
        def chunk_sum(c, v):
            g = jnp.take(x, c, axis=0) * v[..., None]
            out = g[0].astype(jnp.float32)
            for k in range(1, c.shape[0]):
                out = out + g[k]
            return out

        nchunks = b.cols.shape[0]
        if nchunks == 1:
            return chunk_sum(b.cols[0], b.vals[0])
        out, _ = jax.lax.scan(
            lambda acc, cv: (acc + chunk_sum(*cv), None),
            chunk_sum(b.cols[0], b.vals[0]),
            (b.cols[1:], b.vals[1:]),
        )
        return out

    def bucket_per_slot(b, x):
        def chunk_sum(c, v):
            out = (jnp.take(x, c[0], axis=0) * v[0][:, None]).astype(
                jnp.float32
            )
            for k in range(1, c.shape[0]):
                out = out + jnp.take(x, c[k], axis=0) * v[k][:, None]
            return out

        nchunks = b.cols.shape[0]
        if nchunks == 1:
            return chunk_sum(b.cols[0], b.vals[0])
        out, _ = jax.lax.scan(
            lambda acc, cv: (acc + chunk_sum(*cv), None),
            chunk_sum(b.cols[0], b.vals[0]),
            (b.cols[1:], b.vals[1:]),
        )
        return out

    variants = {
        "current": bucket_current,
        "unroll": bucket_unroll,
        "per_slot": bucket_per_slot,
    }
    # the three headline pass widths (hoisted joint epoch: F=7 input
    # gather, 8-wide L2 fused, 4-wide L2 transpose)
    for d in (8, 7, 4):
        x0 = jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16
        )
        ref = None
        for name, fn in variants.items():
            out = jax.jit(lambda x_: spmm_with(fn, x_))(x0)
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                np.testing.assert_allclose(
                    np.asarray(out, np.float32), ref, rtol=2e-2,
                    atol=2e-2,
                )
            ms = timeit(lambda x_: spmm_with(fn, x_), x0)
            results[f"{name}_d{d}"] = round(ms, 3)
            print(f"d={d} {name}: {ms:.3f} ms/pass", flush=True)

    out_path = Path(__file__).resolve().parent.parent / "experiments" / (
        "slotsum_probe.json"
    )
    out_path.write_text(json.dumps(
        {"results": results, "device": str(jax.devices()[0])}, indent=1
    ))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
