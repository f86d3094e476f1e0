from arxiv_rag_tpu.store.corpus import ChunkRecord, CorpusReader, CorpusWriter
from arxiv_rag_tpu.store.progress import ProgressDB

__all__ = ["ChunkRecord", "CorpusReader", "CorpusWriter", "ProgressDB"]
