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
    """Fraction of masked nodes whose argmax matches the label."""
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


def _binary_auc_masked(scores: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray):
    """Mann-Whitney AUC with average-rank tie handling over masked nodes.

    Exactly sklearn.roc_auc_score on the masked subset; returns NaN when a
    class is absent.
    """
    n = scores.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    key = jnp.where(mask, scores, neg_inf)
    order = jnp.argsort(key)  # ascending; unmasked rows sink to the front
    s_sorted = key[order]
    y_sorted = jnp.where(mask[order], y[order], -1)  # -1 = ignore
    m_sorted = mask[order].astype(scores.dtype)

    # rank among masked elements (1-based, ascending)
    ranks = jnp.cumsum(m_sorted)
    # average ranks across tie groups (only masked rows can tie: unmasked
    # share the neg_inf key but have zero weight below)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]]
    )
    group_id = jnp.cumsum(new_group) - 1
    group_min = jax.ops.segment_min(ranks, group_id, num_segments=n)
    group_max = jax.ops.segment_max(ranks, group_id, num_segments=n)
    avg_rank = (group_min[group_id] + group_max[group_id]) / 2.0

    pos = (y_sorted == 1).astype(scores.dtype)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(m_sorted) - n_pos
    rank_sum = jnp.sum(avg_rank * pos)
    auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def masked_rocauc(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """ROC-AUC following the reference's eval_rocauc semantics:

    - binary (C==2) single-label: score = softmax(logits)[:, 1]
      (/root/reference/ACM-Pytorch/utils.py:124-126);
    - multilabel: per-column AUC on raw logits, averaged over columns
      where both classes appear.
    """
    if labels.ndim == 1 or labels.shape[-1] == 1:
        lab = labels.reshape(-1)
        scores = jax.nn.softmax(logits, axis=-1)[:, 1]
        return _binary_auc_masked(scores, lab, mask)
    aucs = jax.vmap(
        lambda s, y: _binary_auc_masked(s, y, mask), in_axes=(1, 1)
    )(logits, labels)
    return jnp.nanmean(aucs)
