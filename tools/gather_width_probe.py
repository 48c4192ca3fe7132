"""Probe: XLA HBM gather rate vs row width (descriptor granularity).

Block-column ELL measured SLOWER (282 vs 205 ms/epoch on the banded
scenario) despite 4.8x descriptor "savings" — hypothesis: the TPU
gather engine splits wide rows into ~512B granules internally, so a
4KB block row is already 8 descriptors and blocking saves nothing.
This measures take() rows/s as a function of row bytes.

Run SOLO on the TPU: python -u tools/gather_width_probe.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 168_114
M = 1 << 20


def timeit(fn, *args, iters=20, warmup=3):
    outs = [fn(*args, jnp.float32(i)) for i in range(warmup)]
    jax.block_until_ready(jax.device_get(outs[-1][0, 0]))
    t0 = time.perf_counter()
    outs = [fn(*args, jnp.float32(100 + i)) for i in range(iters)]
    jax.device_get([o[0, 0] for o in outs])
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32))

    @jax.jit
    def take(x, idx, salt):
        return jnp.take(x + salt, idx, axis=0).sum(axis=0, keepdims=True)

    for dtype, dbytes in ((np.float32, 4), (np.dtype("bfloat16"), 2)):
        for d in (32, 64, 128, 256, 512, 1024):
            row_b = d * dbytes
            if row_b > 4096:
                continue
            x = jnp.asarray(
                rng.standard_normal((N, d)).astype(np.float32)
            ).astype(jnp.bfloat16 if dbytes == 2 else jnp.float32)
            ms = timeit(take, x, idx)
            rate = M / ms * 1e3 / 1e6
            bw = M * row_b / (ms / 1e3) / 1e9
            print(f"{'bf16' if dbytes == 2 else 'f32 '} d={d:5d} "
                  f"row={row_b:5d}B: {ms:7.2f} ms  {rate:7.1f} M rows/s  "
                  f"{bw:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
