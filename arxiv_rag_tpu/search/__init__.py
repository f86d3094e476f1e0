from arxiv_rag_tpu.search.bm25 import BM25Index
from arxiv_rag_tpu.search.engine import SearchEngine, SearchResult, bm25_for_index

__all__ = ["BM25Index", "SearchEngine", "SearchResult", "bm25_for_index"]
