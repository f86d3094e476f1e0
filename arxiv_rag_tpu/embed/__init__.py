from arxiv_rag_tpu.embed.runner import Embedder

__all__ = ["Embedder"]
