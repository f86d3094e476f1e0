"""arxiv_rag_tpu — a TPU-native dense-retrieval framework.

A from-scratch rebuild of the capabilities of matiasrodlo/arxiv-rag
(download → extract → chunk → embed), redesigned TPU-first:

- the sentence-transformers encoder becomes a jitted Flax MPNet forward
  pass with length-bucketed batching (``arxiv_rag_tpu.models``,
  ``arxiv_rag_tpu.embed``);
- the flat chunk-embedding store becomes an HBM-resident, chip-sharded
  matrix (``arxiv_rag_tpu.index``);
- query-time cosine top-k runs as a Pallas fused matmul + streaming
  top-k kernel with shard-local candidates merged over ICI
  (``arxiv_rag_tpu.ops``, ``arxiv_rag_tpu.parallel``);
- the CPU-side corpus pipeline (ingest, PDF extraction, cleaning,
  chunking, quality audit) feeds the TPU core through a columnar chunk
  store (``arxiv_rag_tpu.pipeline``, ``arxiv_rag_tpu.store``).

Reference behavior citations in docstrings point into the upstream tree
(e.g. ``pdf_extractor.py:244``) for parity checking; the implementation
here is original and TPU-first.
"""

__version__ = "0.1.0"
