"""Probe: real ell_spmm rate vs operand width / dtype on the bench graph.

The flat-gather probe (tools/gather_width_probe.py) found a cliff at
>128 gather COLUMNS (one lane-tile): d<=128 runs ~220-260M rows/s, wider
collapses to ~30-65M rows/s.  The headline joint config gathers a 4-wide
concat (d=256 bf16) — this measures whether the real ELL SpMM (2D slot
indices + weighted slot-sum consumer) hits the same cliff, and whether
splitting wide operands into <=128-column gathers would pay.

Run SOLO on the TPU: python -u tools/ell_width_probe.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=10, warmup=2):
    outs = [fn(*args, jnp.float32(i)) for i in range(warmup)]
    jax.block_until_ready(jax.device_get(outs[-1][0, 0]))
    t0 = time.perf_counter()
    outs = [fn(*args, jnp.float32(100 + i)) for i in range(iters)]
    jax.device_get([o[0, 0] for o in outs])
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def main():
    from acmgnn_tpu.ops.ell import make_ell_op, _half_spmm
    from acmgnn_tpu.ops.graph import row_normalized_adjacency
    from acmgnn_tpu.ops.native import build_sym_adjacency

    rng = np.random.default_rng(0)
    n = 168_114
    e = 6_797_557
    src = rng.integers(0, n, size=e, dtype=np.int64)
    dst = rng.integers(0, n, size=e, dtype=np.int64)
    adj = build_sym_adjacency(src, dst, n)
    a_hat = row_normalized_adjacency(adj)

    for gdt in (jnp.float32, jnp.bfloat16):
        op = make_ell_op(a_hat, gather_dtype=gdt, block=1)
        nnz = op.nnz
        for d in (64, 128, 256):
            x = jnp.asarray(
                rng.standard_normal((n, d)).astype(np.float32)
            ).astype(gdt)

            @jax.jit
            def one(x, salt):
                return _half_spmm(op.fwd, x + salt.astype(gdt))

            ms = timeit(one, x)
            rate = nnz / ms * 1e3 / 1e6
            name = "bf16" if gdt == jnp.bfloat16 else "f32 "
            print(f"{name} d={d:4d}: {ms:7.2f} ms  {rate:7.1f} M edge-rows/s",
                  flush=True)

        # split-wide variant: one d=256 operand as two d=128 gathers
        x = jnp.asarray(
            rng.standard_normal((n, 256)).astype(np.float32)
        ).astype(gdt)

        @jax.jit
        def split(x, salt):
            xs = x + salt.astype(gdt)
            a = _half_spmm(op.fwd, xs[:, :128])
            b = _half_spmm(op.fwd, xs[:, 128:])
            return jnp.concatenate([a, b], axis=1)

        ms = timeit(split, x)
        name = "bf16" if gdt == jnp.bfloat16 else "f32 "
        print(f"{name} d=256 as 2x128: {ms:7.2f} ms  "
              f"{nnz / ms * 1e3 / 1e6:7.1f} M edge-rows/s (per pass)",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
