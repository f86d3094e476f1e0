from arxiv_rag_tpu.parallel.distributed import (
    global_mesh,
    host_shard,
    init_distributed,
    is_primary,
)
from arxiv_rag_tpu.parallel.mesh import data_mesh, replicate, shard_index_rows
from arxiv_rag_tpu.parallel.ivf import ShardedIVF
from arxiv_rag_tpu.parallel.search import sharded_topk

__all__ = [
    "ShardedIVF",
    "data_mesh",
    "global_mesh",
    "host_shard",
    "init_distributed",
    "is_primary",
    "replicate",
    "shard_index_rows",
    "sharded_topk",
]
