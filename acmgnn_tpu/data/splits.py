"""Train/val/test split management.

Three split regimes, matching the reference:

- fixed Geom-GCN ``.npz`` mask files, 48/32/20 despite the ``0.6_0.2``
  filename (/root/reference/ACM-Pytorch/utils.py:73-82, SURVEY.md §2.14);
- random "disassortative" 60/20/20 splits with per-class balanced train
  (/root/reference/ACM-Pytorch/utils.py:462-483);
- LINKX random proportion splits with negative-label exclusion
  (/root/reference/ACM-Pytorch/utils.py:498-524,
  /root/reference/ACM-Geometric/data_utils.py:14-32).

All masks are numpy bool arrays; callers ship them to device.
"""

from __future__ import annotations

import numpy as np

from acmgnn_tpu.data.paths import find_data_file


def load_fixed_split_masks(dataset_name: str, idx: int):
    """Bundled Geom-GCN fixed split #idx -> (train, val, test) bool masks."""
    path = find_data_file(
        "ACM-Pytorch", "splits", f"{dataset_name}_split_0.6_0.2_{idx}.npz"
    )
    with np.load(path) as f:
        return (
            f["train_mask"].astype(bool),
            f["val_mask"].astype(bool),
            f["test_mask"].astype(bool),
        )


def random_disassortative_splits(labels: np.ndarray, num_classes: int, rng=None):
    """60/20/20 with class-balanced train set.

    Per class: ``round(0.6 * N / C)`` nodes to train; the pooled remainder
    is shuffled, first ``round(0.2 * N)`` to val, rest to test.
    """
    rng = np.random.default_rng() if rng is None else rng
    labels = np.asarray(labels)
    n = labels.shape[0]
    indices = []
    for i in range(num_classes):
        index = np.nonzero(labels == i)[0]
        indices.append(rng.permutation(index))
    percls_trn = int(round(0.6 * (n / num_classes)))
    val_lb = int(round(0.2 * n))
    train_index = np.concatenate([i[:percls_trn] for i in indices])
    rest_index = np.concatenate([i[percls_trn:] for i in indices])
    rest_index = rng.permutation(rest_index)

    def mask(idx):
        m = np.zeros(n, dtype=bool)
        m[idx] = True
        return m

    return (
        mask(train_index),
        mask(rest_index[:val_lb]),
        mask(rest_index[val_lb:]),
    )


def rand_train_test_idx(
    label: np.ndarray,
    train_prop: float = 0.5,
    valid_prop: float = 0.25,
    ignore_negative: bool = True,
    rng=None,
):
    """LINKX-style random proportional split, returns index arrays."""
    rng = np.random.default_rng() if rng is None else rng
    label = np.asarray(label).squeeze()
    if ignore_negative:
        labeled_nodes = np.where(label != -1)[0]
    else:
        labeled_nodes = np.arange(label.shape[0])

    n = labeled_nodes.shape[0]
    train_num = int(n * train_prop)
    valid_num = int(n * valid_prop)
    perm = rng.permutation(n)
    train_idx = labeled_nodes[perm[:train_num]]
    valid_idx = labeled_nodes[perm[train_num : train_num + valid_num]]
    test_idx = labeled_nodes[perm[train_num + valid_num :]]
    return train_idx, valid_idx, test_idx


def indices_to_masks(n: int, train_idx, valid_idx, test_idx):
    masks = []
    for idx in (train_idx, valid_idx, test_idx):
        m = np.zeros(n, dtype=bool)
        m[np.asarray(idx)] = True
        masks.append(m)
    return tuple(masks)


def load_linkx_split_masks(dataset_name: str, sub_dataset: str = ""):
    """LINKX bundled ``*-splits.npy`` files -> list of (train,val,test) idx dicts
    (/root/reference/ACM-Geometric/data_utils.py:80-96)."""
    name = dataset_name
    if sub_dataset and sub_dataset != "None":
        name += f"-{sub_dataset}"
    path = find_data_file("ACM-Geometric", "splits", f"{name}-splits.npy")
    splits_lst = np.load(path, allow_pickle=True)
    return [
        {k: np.asarray(s[k]) for k in ("train", "valid", "test")} for s in splits_lst
    ]
