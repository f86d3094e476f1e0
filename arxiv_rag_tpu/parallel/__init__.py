from arxiv_rag_tpu.parallel.mesh import data_mesh, shard_index_rows
from arxiv_rag_tpu.parallel.search import sharded_topk

__all__ = ["data_mesh", "shard_index_rows", "sharded_topk"]
