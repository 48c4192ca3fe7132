from acmgnn_tpu.ops.graph import (
    GraphData,
    Operators,
    DenseOp,
    CooOp,
    precompute_operators,
)
from acmgnn_tpu.ops.spmm import spmm, spmm_high

__all__ = [
    "GraphData",
    "Operators",
    "DenseOp",
    "CooOp",
    "precompute_operators",
    "spmm",
    "spmm_high",
]
