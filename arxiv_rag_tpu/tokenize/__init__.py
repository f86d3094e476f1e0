from arxiv_rag_tpu.tokenize.wordpiece import SpecialTokens, WordPieceTokenizer

__all__ = ["WordPieceTokenizer", "SpecialTokens"]
