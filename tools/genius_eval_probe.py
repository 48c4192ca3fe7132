"""Break down the genius-scale eval cost (ROC-AUC protocol).

The genius bench scenario reads ~29% of the gather floor after the
scan-AUC fix (PERF.md) — i.e. most of its epoch is NOT adjacency
gathers.  This probe times the metric pipeline's pieces at genius shape
(N=421,961 rows) on the real device so the remaining cost is attributed
with data, not guesses:

  - full masked_rocauc_multi (2 masks, shared sort)
  - the argsort alone
  - the rank scans + gathers alone (given a precomputed sort)
  - log_softmax + BCE loss at [N, 2]

Usage (TPU, solo):  python -u tools/genius_eval_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10, warm=2):
    for i in range(warm):
        jax.device_get(fn(*args, jnp.asarray(float(i + 1))))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args, jnp.asarray(float(i + 2))))
        best = min(best, time.perf_counter() - t0)
    return 1000.0 * best


def main():
    from acmgnn_tpu.train.metrics import (
        _auc_from_sorted,
        _sort_scores,
        masked_bce_with_logits,
        masked_rocauc_multi,
    )

    n = 421_961
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, size=n).astype(np.int32))
    onehot = jax.nn.one_hot(labels, 2)
    masks = tuple(
        jnp.asarray(rng.random(n) < p) for p in (0.25, 0.25)
    )

    # s scales the input so every rep is a unique execution (the remote
    # backend dedups identical dispatches; CLAUDE.md)
    @jax.jit
    def full(logits_, s):
        v, t = masked_rocauc_multi(logits_ * s, labels, masks)
        return v + t

    @jax.jit
    def sort_only(logits_, s):
        scores = jax.nn.softmax(logits_ * s, axis=-1)[:, 1]
        order, s_sorted, group_id = _sort_scores(scores)
        return order[0] + group_id[-1]

    @jax.jit
    def ranks_only(order, group_id, s):
        outs = [
            _auc_from_sorted(order, group_id, labels, m, jnp.float32)
            for m in masks
        ]
        return sum(outs) * s

    @jax.jit
    def loss_only(logits_, s):
        return masked_bce_with_logits(logits_ * s, onehot, masks[0])

    scores = jax.nn.softmax(logits, axis=-1)[:, 1]
    order, _, group_id = _sort_scores(scores)
    order, group_id = jax.device_get((order, group_id))
    order = jnp.asarray(order)
    group_id = jnp.asarray(group_id)

    print(f"device: {jax.devices()[0]}")
    print(f"full masked_rocauc_multi (2 masks): {timeit(full, logits):8.3f} ms")
    print(f"softmax + argsort + tie groups:     {timeit(sort_only, logits):8.3f} ms")
    print(f"rank scans + AUC (x2 masks):        {timeit(ranks_only, order, group_id):8.3f} ms")
    print(f"BCE loss [N,2]:                     {timeit(loss_only, logits):8.3f} ms")


if __name__ == "__main__":
    main()
