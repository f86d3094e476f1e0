from arxiv_rag_tpu.index.store import DenseIndex, IndexManifest, build_index

__all__ = ["DenseIndex", "IndexManifest", "build_index"]
