from acmgnn_tpu.parallel.partition import (
    build_sharded_coo,
    build_sharded_ell,
    partition_rows,
)
from acmgnn_tpu.parallel.sharded import (
    ShardedCooOp,
    ShardedEllOp,
    make_graph_mesh,
    make_sharded_coo_op,
    make_sharded_ell_op,
    make_sharded_operators,
    shard_node_array,
    sharded_ell_spmm,
    sharded_ell_spmm_transpose,
    sharded_spmm,
    sharded_spmm_transpose,
)

__all__ = [
    "partition_rows",
    "build_sharded_coo",
    "build_sharded_ell",
    "ShardedCooOp",
    "ShardedEllOp",
    "make_graph_mesh",
    "make_sharded_coo_op",
    "make_sharded_ell_op",
    "make_sharded_operators",
    "shard_node_array",
    "sharded_spmm",
    "sharded_spmm_transpose",
    "sharded_ell_spmm",
    "sharded_ell_spmm_transpose",
]
