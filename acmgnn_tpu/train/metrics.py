"""Evaluation metrics as jit-safe masked reductions.

The reference computes accuracy / ROC-AUC on host with numpy+sklearn
(/root/reference/ACM-Pytorch/utils.py:66-70,98-143,
/root/reference/ACM-Geometric/data_utils.py:115-151).  Here both run on
device over boolean masks so the whole training loop stays compiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """Fraction of masked nodes whose argmax matches the label.

    Single-label only: a ``[N, C]`` multilabel matrix (ogbn-proteins
    protocol) has no argmax target — comparing argmax against it would
    silently return garbage, so it raises instead (use
    ``metric="rocauc"``, as the reference does for every multilabel
    dataset: /root/reference/ACM-Geometric/train.py:87-92)."""
    if labels.ndim > 1 and labels.shape[-1] > 1:
        raise ValueError(
            "masked_accuracy got a [N, C] multilabel matrix; accuracy is "
            "undefined for multilabel targets — use metric='rocauc'"
        )
    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == labels) & mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


def masked_nll(log_probs: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """Mean negative log-likelihood over masked nodes (torch NLLLoss)."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1)


def masked_bce_with_logits(
    logits: jnp.ndarray, targets_onehot: jnp.ndarray, mask: jnp.ndarray
):
    """torch BCEWithLogitsLoss (mean over masked rows, all columns)."""
    # log(1+exp(-|x|)) formulation for stability
    x = logits
    t = targets_onehot
    per_elt = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    row_mean = per_elt.mean(axis=-1)
    return jnp.sum(row_mean * mask) / jnp.maximum(jnp.sum(mask), 1)


def _sort_scores(scores: jnp.ndarray):
    """Mask-independent ascending sort of the score vector.

    The expensive O(N log N) step of the rank AUC; shared across every
    mask evaluated on the same scores (``masked_rocauc_multi``) — the
    full-graph protocol evaluates val+test (and sometimes train) AUC on
    ONE forward's logits every epoch."""
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    # tie groups over the sorted scores (mask-independent too)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]]
    )
    group_id = jnp.cumsum(new_group) - 1
    return order, s_sorted, group_id


def _auc_from_sorted(order, group_id, y, mask, dtype):
    """Mann-Whitney AUC with average-rank tie handling over masked nodes,
    from a precomputed mask-independent sort.

    Exactly sklearn.roc_auc_score on the masked subset; returns NaN when a
    class is absent.  Unmasked rows may share tie groups with masked
    ones; they carry zero rank weight and are excluded from the group
    min/max, so the masked average-rank is unaffected.
    """
    n = order.shape[0]
    m_sorted = mask[order].astype(dtype)
    y_sorted = jnp.where(mask[order], y[order], -1)  # -1 = ignore

    # rank among masked elements (1-based, ascending)
    ranks = jnp.cumsum(m_sorted)
    masked_rank_lo = jnp.where(m_sorted > 0, ranks, jnp.inf)
    masked_rank_hi = jnp.where(m_sorted > 0, ranks, -jnp.inf)
    group_min = jax.ops.segment_min(masked_rank_lo, group_id, num_segments=n)
    group_max = jax.ops.segment_max(masked_rank_hi, group_id, num_segments=n)
    avg_rank = (group_min[group_id] + group_max[group_id]) / 2.0

    pos = (y_sorted == 1).astype(dtype)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(m_sorted) - n_pos
    rank_sum = jnp.sum(jnp.where(pos > 0, avg_rank, 0.0))
    auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def _binary_auc_masked(scores: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray):
    order, _, group_id = _sort_scores(scores)
    return _auc_from_sorted(order, group_id, y, mask, scores.dtype)


def masked_rocauc(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """ROC-AUC following the reference's eval_rocauc semantics:

    - binary (C==2) single-label: score = softmax(logits)[:, 1]
      (/root/reference/ACM-Pytorch/utils.py:124-126);
    - multilabel: per-column AUC on raw logits, averaged over columns
      where both classes appear.
    """
    return masked_rocauc_multi(logits, labels, (mask,))[0]


def masked_rocauc_multi(logits: jnp.ndarray, labels: jnp.ndarray, masks):
    """ROC-AUC for SEVERAL masks over one set of logits, sharing the
    O(N log N) score sort (the dominant eval cost at genius scale —
    421k-row argsort per mask otherwise).  Returns one AUC per mask,
    each exactly ``masked_rocauc(logits, labels, mask)``."""
    if labels.ndim == 1 or labels.shape[-1] == 1:
        lab = labels.reshape(-1)
        scores = jax.nn.softmax(logits, axis=-1)[:, 1]
        order, _, group_id = _sort_scores(scores)
        return tuple(
            _auc_from_sorted(order, group_id, lab, m, scores.dtype)
            for m in masks
        )
    orders, group_ids = jax.vmap(
        lambda s: (lambda o, _, g: (o, g))(*_sort_scores(s)), in_axes=1
    )(logits)
    outs = []
    for m in masks:
        aucs = jax.vmap(
            lambda o, g, y: _auc_from_sorted(o, g, y, m, logits.dtype),
            in_axes=(0, 0, 1),
        )(orders, group_ids, labels)
        outs.append(jnp.nanmean(aucs))
    return tuple(outs)
