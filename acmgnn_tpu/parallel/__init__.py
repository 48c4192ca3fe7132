from acmgnn_tpu.parallel.partition import partition_rows, build_sharded_coo
from acmgnn_tpu.parallel.sharded import (
    ShardedCooOp,
    make_graph_mesh,
    shard_node_array,
    sharded_spmm,
)

__all__ = [
    "partition_rows",
    "build_sharded_coo",
    "ShardedCooOp",
    "make_graph_mesh",
    "shard_node_array",
    "sharded_spmm",
]
