"""Per-pass ELL SpMM cost vs the raw-gather floor at bench scale.

Times (a) a raw jnp.take of all 13.6M operator rows and (b) the full
bucketed-ELL pass (gather + slot sums + concat + inv-perm), at the three
row widths the headline epoch uses: d=64 f32 (plain), d=128 bf16
(backward pair), d=256 bf16 (joint forward 4-wide).  The gap (b)-(a) is
the ELL machinery overhead this probe exists to track.

Run solo on the TPU: `python -u tools/ell_pass_probe.py`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acmgnn_tpu.ops.ell import make_ell_op, _half_spmm
    from acmgnn_tpu.ops.graph import row_normalized_adjacency
    from acmgnn_tpu.ops.native import build_sym_adjacency

    rng = np.random.default_rng(0)
    n, e = 168_114, 6_797_557
    src = rng.integers(0, n, size=e, dtype=np.int64)
    dst = rng.integers(0, n, size=e, dtype=np.int64)
    adj = build_sym_adjacency(src, dst, n)
    a_hat = row_normalized_adjacency(adj)
    op = make_ell_op(a_hat)
    nnz = op.nnz
    # flat column list for the raw-gather floor (same fetch count/order
    # class as the ELL pass, no slot machinery)
    cols_flat = jnp.asarray(a_hat.tocsr().indices.astype(np.int32))

    def timeit_chain(f, x, repeats=8):
        """Shape-preserving f: chain calls so each is unique work."""
        jax.device_get(jnp.sum(f(x).astype(jnp.float32)))  # compile+warm
        t0 = time.perf_counter()
        acc = x
        for _ in range(repeats):
            acc = f(acc).astype(x.dtype)[: x.shape[0]]
        jax.device_get(jnp.sum(acc.astype(jnp.float32)))
        return 1000.0 * (time.perf_counter() - t0) / repeats

    def timeit_unique(f, x, repeats=8):
        """Reducing f: feed scaled copies so the remote backend cannot
        dedup; the device stream serializes them, sync once at the end."""
        xs = [x * (1.0 + 1e-6 * (i + 1)) for i in range(repeats)]
        jax.device_get(f(x))  # compile+warm
        t0 = time.perf_counter()
        outs = [f(xi) for xi in xs]
        jax.device_get(outs[-1])
        jax.block_until_ready(outs)
        return 1000.0 * (time.perf_counter() - t0) / repeats

    for d, dtype, tag in (
        (64, jnp.float32, "d=64 f32 (256B rows)"),
        (128, jnp.bfloat16, "d=128 bf16 (256B rows, bwd pair)"),
        (256, jnp.bfloat16, "d=256 bf16 (512B rows, joint fwd)"),
    ):
        x = jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32)
        ).astype(dtype)

        # gather fused into a reduction: the [nnz, d] intermediate never
        # hits HBM, so this times fetch traffic alone (the floor)
        raw = jax.jit(
            lambda x_: jnp.sum(
                jnp.take(x_, cols_flat, axis=0), axis=0,
                dtype=jnp.float32,
            )
        )
        ms_raw = timeit_unique(raw, x)

        ell = jax.jit(lambda x_: _half_spmm(op.fwd, x_))
        ms_ell = timeit_chain(ell, x)
        rate_raw = nnz / ms_raw * 1000 / 1e6
        rate_ell = nnz / ms_ell * 1000 / 1e6
        print(
            f"{tag}: raw gather {ms_raw:.1f} ms ({rate_raw:.0f}M rows/s), "
            f"ELL pass {ms_ell:.1f} ms ({rate_ell:.0f}M rows/s), "
            f"overhead {ms_ell - ms_raw:.1f} ms"
        )


if __name__ == "__main__":
    main()
