from acmgnn_tpu.data.registry import load_dataset, DATASETS
from acmgnn_tpu.data.splits import (
    random_disassortative_splits,
    load_fixed_split_masks,
    rand_train_test_idx,
)

__all__ = [
    "load_dataset",
    "DATASETS",
    "random_disassortative_splits",
    "load_fixed_split_masks",
    "rand_train_test_idx",
]
