"""Probe: Pallas fused dual dense kernel vs the concat-matmul spmm_dual.

VERDICT r1 weak-item #1: ``fused_dual_spmm`` (ops/pallas_kernels.py) is
tested but not wired into any production path — ``spmm_dual`` uses the
concat trick (one ``A @ [z_low ‖ z_high]`` matmul) instead, which ALSO
reads the [N, N] operator once.  The Pallas kernel's remaining edge is
only (a) no [N, 2D] concat materialization and (b) the high-pass
subtraction finalized in VMEM — both O(N·D) effects against an O(N²)
operator read, so the expected gain is small.  Measure both (plus two
separate matmuls as the naive floor) at dense-regime sizes, fwd and
fwd+bwd, and keep the winner.

Run SOLO on the TPU (CLAUDE.md: never two TPU processes).
  python -u tools/fused_dual_probe.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


CHAIN = 50


def chain(fn):
    """Apply fn CHAIN times with a data dependency inside ONE jit — the
    tunnel dispatch latency (~30 ms/call) would otherwise swamp these
    sub-ms kernels."""
    import jax

    def run(zl, zh):
        def body(carry, _):
            ol, oh = fn(*carry)
            return (ol, oh), None

        out, _ = jax.lax.scan(body, (zl, zh), None, length=CHAIN)
        return out

    return jax.jit(run)


def bench(fn, make_args, iters=8, warmup=2):
    import jax

    # unique inputs per call: the remote backend dedups identical
    # executions (CLAUDE.md), so reusing one operand would measure a cache
    args_list = [make_args(i) for i in range(iters + warmup)]
    for a in args_list[:warmup]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[warmup:]]
    for o in outs:
        jax.device_get(jax.tree_util.tree_leaves(o)[0][:1])
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters / CHAIN * 1000


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from acmgnn_tpu.ops.graph import make_dense_op, row_normalized_adjacency
    from acmgnn_tpu.ops.spmm import spmm_dual

    try:
        # the kernel was retired after this probe's measurements
        # (PERF.md "Ruled out: Pallas fused dual dense kernel"); re-runs
        # without it still measure concat vs two-matmuls
        from acmgnn_tpu.ops.pallas_kernels import fused_dual_spmm
    except ImportError:
        fused_dual_spmm = None

    rng = np.random.default_rng(0)
    results = {}
    for n in (2708, 4096, 5201):
        d = 64
        a_sp = sp.random(n, n, density=10.0 / n, random_state=1, format="csr")
        op = make_dense_op(row_normalized_adjacency(a_sp))
        a = op.mat

        zl0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        zh0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

        def uniq(i):
            # cheap per-call perturbation keeps inputs unique
            return (zl0 + i * 1e-6, zh0 - i * 1e-6)

        concat_fn = lambda zl, zh: spmm_dual(op, zl, zh)
        pallas_fn = (
            (lambda zl, zh: fused_dual_spmm(a, zl, zh))
            if fused_dual_spmm is not None else None
        )
        twomm_fn = lambda zl, zh: (
            jnp.dot(a, zl, preferred_element_type=jnp.float32),
            zh - jnp.dot(a, zh, preferred_element_type=jnp.float32),
        )

        def loss_wrap(f):
            return jax.grad(
                lambda zl, zh: sum(jnp.sum(o**2) for o in f(zl, zh)),
                argnums=(0, 1),
            )

        # realistic dataflow: the channel operands are produced by GEMMs
        # inside the step (as in ACMConv), not carried verbatim — rules
        # out scan-carry layout artifacts in the concat measurement
        wl = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
        wh = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)

        def realistic(fn):
            def step(zl, zh):
                ol, oh = fn(zl @ wl, zh @ wh)
                return jnp.tanh(ol), jnp.tanh(oh)

            return step

        row = {}
        variants = [("concat", concat_fn), ("two_matmuls", twomm_fn)]
        if fused_dual_spmm is not None:
            variants.insert(1, ("pallas", pallas_fn))
        for name, fn in variants:
            row[f"{name}_fwd_ms"] = round(bench(chain(fn), uniq), 4)
            row[f"{name}_fwdbwd_ms"] = round(
                bench(chain(loss_wrap(fn)), uniq), 4
            )
            row[f"{name}_real_ms"] = round(
                bench(chain(realistic(fn)), uniq), 4
            )
        # numerical agreement
        cl, ch = jax.jit(concat_fn)(zl0, zh0)
        ol, oh = jax.jit(
            pallas_fn if fused_dual_spmm is not None else twomm_fn
        )(zl0, zh0)
        row["max_abs_diff"] = float(
            max(jnp.abs(cl - ol).max(), jnp.abs(ch - oh).max())
        )
        results[n] = row
        print(f"N={n}: {json.dumps(row)}", flush=True)

    out = Path(__file__).resolve().parent.parent / "experiments" / "fused_dual_probe.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
