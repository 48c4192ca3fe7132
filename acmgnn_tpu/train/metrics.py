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


def _auc_from_sorted_batch(order, group_id, y, masks_mat, dtype):
    """Mann-Whitney AUCs (average-rank ties) for M masks at once, from a
    precomputed mask-independent sort.  Returns an ``[M]`` vector; entry
    i is exactly sklearn.roc_auc_score on mask i's subset (NaN when a
    class is absent).  Unmasked rows may share tie groups with masked
    ones; they carry zero rank weight and are excluded from the group
    min/max, so the masked average-rank is unaffected.

    Two TPU shapes matter here (residual_profile genius trace):

    - Tie groups are CONTIGUOUS runs of the sorted order, so per-group
      min/max masked rank are boundary lookups via two log-depth scans —
      not segment reductions (which lower to serializing scatters).
    - Every [N] gather is batched across masks (and the label rides the
      mask gather as an extra column): a single-column take at 421k rows
      costs 3-9 ms on TPU — one descriptor per ROW regardless of width —
      so per-mask takes cost M× for no reason.  One [N, 1+M] take + two
      [N, M] rank takes replace the ~13 single-column takes the per-mask
      formulation issued (genius eval: the dominant non-SpMM cost).
    """
    n = order.shape[0]
    # label + all masks share ONE row gather (0/1 ints are exact in f32)
    packed = jnp.concatenate(
        [y.reshape(-1, 1).astype(jnp.float32),
         masks_mat.astype(jnp.float32)],
        axis=1,
    )
    g = jnp.take(packed, order, axis=0)   # [N, 1+M]
    y_perm = g[:, 0]
    m_bool = g[:, 1:] > 0                 # [N, M]

    # rank among masked elements (1-based, ascending); int32 keeps the
    # prefix counts exact beyond f32's 2^24 integer range
    m_i32 = m_bool.astype(jnp.int32)
    ranks = jnp.cumsum(m_i32, axis=0)     # masked count through row i
    ranks_before = ranks - m_i32          # masked count before row i
    idx = jnp.arange(n, dtype=jnp.int32)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), group_id[1:] != group_id[:-1]]
    )
    end_flag = jnp.concatenate([new_group[1:], jnp.ones((1,), bool)])
    # position of each row's group start (propagate forward) / end
    # (propagate backward) — log-depth scans, mask-independent
    start_pos = jax.lax.cummax(jnp.where(new_group, idx, 0))
    end_pos = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(end_flag, idx, n - 1)))
    )
    lo = jnp.take(ranks_before, start_pos, axis=0)   # [N, M]
    hi = jnp.take(ranks, end_pos, axis=0)            # [N, M]
    avg_rank = (lo.astype(dtype) + 1.0 + hi.astype(dtype)) / 2.0

    pos = ((y_perm == 1.0)[:, None] & m_bool).astype(dtype)  # [N, M]
    n_pos = jnp.sum(pos, axis=0)                             # [M]
    n_neg = ranks[-1].astype(dtype) - n_pos
    rank_sum = jnp.sum(avg_rank * pos, axis=0)
    auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def _auc_from_sorted(order, group_id, y, mask, dtype):
    """Single-mask wrapper over the batched formulation."""
    return _auc_from_sorted_batch(
        order, group_id, y, mask.reshape(-1, 1), dtype
    )[0]


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
    masks_mat = jnp.stack(masks, axis=1)
    if labels.ndim == 1 or labels.shape[-1] == 1:
        lab = labels.reshape(-1)
        scores = jax.nn.softmax(logits, axis=-1)[:, 1]
        order, _, group_id = _sort_scores(scores)
        aucs = _auc_from_sorted_batch(
            order, group_id, lab, masks_mat, scores.dtype
        )
        return tuple(aucs[i] for i in range(len(masks)))
    orders, group_ids = jax.vmap(
        lambda s: (lambda o, _, g: (o, g))(*_sort_scores(s)), in_axes=1
    )(logits)
    # [C, M]: per-column AUC for every mask, masks batched inside
    aucs = jax.vmap(
        lambda o, g, y: _auc_from_sorted_batch(
            o, g, y, masks_mat, logits.dtype
        ),
        in_axes=(0, 0, 1),
    )(orders, group_ids, labels)
    return tuple(jnp.nanmean(aucs[:, i]) for i in range(len(masks)))
