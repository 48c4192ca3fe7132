"""acmgnn_tpu — a TPU-native framework for Adaptive Channel Mixing GNNs.

A from-scratch JAX/XLA/Pallas implementation of the ACM-GNN model family
("Revisiting Heterophily for Graph Neural Networks", NeurIPS 2022) with the
same capabilities as the reference PyTorch implementation (SitaoLuan/ACM-GNN),
re-designed TPU-first:

- sparse operators precomputed on host into MXU/HBM-friendly device formats
  (dense tiles for small graphs, sorted-COO + transpose for large graphs);
- the whole per-split training loop (forward, backward, optimizer, eval,
  early stopping, best-model selection) compiled into a single XLA program
  via ``lax.while_loop`` — no per-epoch host round trips;
- multi-chip scale-out via ``jax.sharding.Mesh`` + ``shard_map`` with
  nnz-balanced row partitioning of the graph operators.
"""

__version__ = "0.1.0"

from acmgnn_tpu.ops.graph import GraphData, Operators, precompute_operators
from acmgnn_tpu.models.models import ACMGNN

__all__ = [
    "GraphData",
    "Operators",
    "precompute_operators",
    "ACMGNN",
]
