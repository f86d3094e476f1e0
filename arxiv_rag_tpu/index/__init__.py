from arxiv_rag_tpu.index.ivf import IVFIndex
from arxiv_rag_tpu.index.store import DenseIndex, IndexManifest, build_index

__all__ = ["DenseIndex", "IVFIndex", "IndexManifest", "build_index"]
