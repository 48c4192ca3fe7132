"""Probe: Mosaic `tpu.dynamic_gather` (take_along_axis form) from VMEM.

Mosaic's only vectorized-gather lowering (jax 0.9.0,
pallas/mosaic/lowering.py:2464-2523) is take_along_axis-shaped:
input (A, B), indices (A, B), output (A, B), gathering along dim 0
(per-lane over sublanes) or dim 1 (per-sublane over lanes).  So a
VMEM-panel SpMM would gather P rows per op from a P-row panel, with the
row index broadcast across lanes.  This probe measures whether that
compiles at useful panel sizes and the achieved rows/s vs the XLA HBM
gather (~206-266 M rows/s measured, descriptor-bound).

Run SOLO on the TPU (see CLAUDE.md):
  python -u tools/pallas_gather_probe.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128           # feature width
M = 1 << 20       # gathered rows per call


def timeit(fn, *args, iters=20, warmup=3):
    outs = []
    for i in range(warmup):
        outs.append(fn(*args, jnp.float32(i)))
    jax.block_until_ready(jax.device_get(outs[-1][0, 0]))
    t0 = time.perf_counter()
    outs = [fn(*args, jnp.float32(100 + i)) for i in range(iters)]
    sync = jax.device_get([o[0, 0] for o in outs])
    del sync
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def report(name, fn, *args, m=M):
    try:
        ms = timeit(fn, *args)
        print(f"{name:40s} {ms:7.2f} ms  {m / ms * 1e3 / 1e6:8.1f} M rows/s",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name:40s} FAILED: {type(e).__name__}: {msg}", flush=True)


def make_vmem_gather(p: int, dtype):
    """Gather M rows (in blocks of P) from a P-row VMEM panel."""
    nstep = M // p

    def kernel(idx_ref, x_ref, o_ref):
        idx = idx_ref[:]                      # (P, 128) int32, lane-bcast
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)

    @jax.jit
    def fn(x, idx2d, salt):
        out = pl.pallas_call(
            kernel,
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((p, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), dtype),
        )(idx2d, x + salt.astype(dtype))
        return out.sum(axis=0, keepdims=True).astype(jnp.float32)

    return fn


def make_vmem_gather_bcast(p: int, dtype):
    """Same but index HBM traffic is (M, 128) -> (M, 1): broadcast the
    row index across lanes inside the kernel (realistic index cost)."""
    nstep = M // p

    def kernel(idx_ref, x_ref, o_ref):
        idx = jnp.broadcast_to(idx_ref[:], (p, D))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)

    @jax.jit
    def fn(x, idx_narrow, salt):
        out = pl.pallas_call(
            kernel,
            grid=(nstep,),
            in_specs=[
                pl.BlockSpec((p, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), dtype),
        )(idx_narrow, x + salt.astype(dtype))
        return out.sum(axis=0, keepdims=True).astype(jnp.float32)

    return fn


def main():
    rng = np.random.default_rng(0)

    # XLA HBM baseline at headline table size
    PB = 168114
    xb = jnp.asarray(rng.standard_normal((PB, D), dtype=np.float32))
    idxb = jnp.asarray(rng.integers(0, PB, size=(M,), dtype=np.int32))

    @jax.jit
    def xla_take(x, idx, salt):
        return jnp.take(x + salt, idx, axis=0).sum(axis=0, keepdims=True)

    report(f"XLA take (HBM, P={PB})", xla_take, xb, idxb)

    for p in (8, 512, 4096):
        x = jnp.asarray(rng.standard_normal((p, D), dtype=np.float32))
        idx = rng.integers(0, p, size=(M,), dtype=np.int32)
        idx2d = jnp.asarray(
            np.broadcast_to(idx[:, None], (M, D)).reshape(M // p, p, D)
        ).reshape(M, D)
        report(f"Pallas VMEM gather f32 P={p}",
               make_vmem_gather(p, jnp.float32), x, idx2d)

    # realistic variant: narrow index stream, in-kernel lane broadcast
    for p in (512, 4096):
        x = jnp.asarray(rng.standard_normal((p, D), dtype=np.float32))
        idx = rng.integers(0, p, size=(M, 1), dtype=np.int32)
        report(f"Pallas VMEM gather f32 bcast P={p}",
               make_vmem_gather_bcast(p, jnp.float32), x, jnp.asarray(idx))

    p = 4096
    xh = jnp.asarray(rng.standard_normal((p, D)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    idx = rng.integers(0, p, size=(M, 1), dtype=np.int32)
    report(f"Pallas VMEM gather bf16 bcast P={p}",
           make_vmem_gather_bcast(p, jnp.bfloat16), xh, jnp.asarray(idx))


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
