"""Stage-3 orchestration: per-paper processing into the corpus store.

The reference's ``RAGPipeline`` (``pipeline.py:31-1200``) + worker
(``worker.py:23-901``) re-instantiate extractor/processor/chunker per
paper in 24 processes and write one JSON per paper. Here the same
pipeline is a pure function ``process_paper`` (components constructed
once per process) feeding a sharded columnar corpus store, with the
SQLite progress DB for skip/resume (``pipeline.py:111-181,599-633``)
and process-pool fan-out at file granularity (:865-959).
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ProcessPoolExecutor, as_completed
from dataclasses import dataclass, field
from pathlib import Path

from arxiv_rag_tpu.config import Config
from arxiv_rag_tpu.logging_utils import get_logger
from arxiv_rag_tpu.pipeline.chunk import Chunker, ChunkerConfig
from arxiv_rag_tpu.pipeline.citations import extract_citations
from arxiv_rag_tpu.pipeline.clean import TextCleaner
from arxiv_rag_tpu.pipeline.extract import PDFExtractor, improve_pages, score_text
from arxiv_rag_tpu.pipeline.metadata import extract_metadata
from arxiv_rag_tpu.pipeline.sections import extract_sections
from arxiv_rag_tpu.store.corpus import ChunkRecord, CorpusWriter
from arxiv_rag_tpu.store.progress import ProgressDB

log = get_logger("pipeline")


@dataclass
class PaperResult:
    paper_id: str
    ok: bool
    num_chunks: int = 0
    text_length: int = 0
    quality: float = 0.0
    error: str | None = None
    seconds: float = 0.0
    records: list[ChunkRecord] = field(default_factory=list)
    paper_meta: dict = field(default_factory=dict)


_WORKER_STATE: dict = {}


def _make_sentence_encoder(cfg: Config):
    """Sentence encoder for semantic chunking: the framework's own
    jitted model (one SPMD encoder replaces the reference's per-worker
    torch MiniLM, ``text_processor.py:856-887``). ``semantic_model`` is
    a converted-checkpoint dir; returns None when unavailable."""
    from pathlib import Path as _P

    ckpt = _P(cfg.chunking.semantic_model)
    if not (ckpt / "model_config.json").exists():
        return None
    try:
        from arxiv_rag_tpu.embed import Embedder
        from arxiv_rag_tpu.models.convert import load_checkpoint
        from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

        params, mcfg = load_checkpoint(ckpt)
        vocab = ckpt / "vocab.txt"
        tok = (
            WordPieceTokenizer.from_vocab_file(vocab)
            if vocab.exists()
            else WordPieceTokenizer.toy()
        )
        embedder = Embedder(params, mcfg, tok, batch_size=cfg.chunking.semantic_batch_size)
        return embedder.encode_texts
    except (OSError, KeyError, ValueError) as exc:
        log.warning("semantic encoder load failed: %s", exc)
        return None


def _load_ocr(cfg: Config):
    """Resolve the configured OCR plugin (extraction.ocr_plugin), None
    when OCR is disabled. A bad spec raises — never a silent downgrade."""
    if not cfg.extraction.ocr_enabled or not cfg.extraction.ocr_plugin:
        return None
    from arxiv_rag_tpu.pipeline.extract.ocr import load_ocr_plugin

    return load_ocr_plugin(cfg.extraction.ocr_plugin)


def _components(cfg: Config) -> tuple[PDFExtractor, TextCleaner, Chunker]:
    """Construct (and per-process cache) the pipeline components —
    unlike ``worker.py:244-313``, which re-initializes per *paper*.

    The cache key is the config *content*: executor workers unpickle a
    fresh Config per task, so an identity key would rebuild components
    (and reload the semantic encoder) per paper, and a recycled id()
    could serve stale components for a different config."""
    key = json.dumps(cfg.to_dict(), sort_keys=True, default=str)
    if _WORKER_STATE.get("key") != key:
        chunk_cfg = ChunkerConfig(
            method=cfg.chunking.method,
            target_chars=min(cfg.text.max_chunk_chars, cfg.chunking.target_tokens * 4),
            min_chars=cfg.text.min_chunk_chars,
            max_chars=cfg.text.max_chunk_chars,
            overlap_chars=cfg.text.overlap_chars,
            semantic_threshold=cfg.chunking.semantic_threshold,
            semantic_overlap_frac=cfg.chunking.semantic_overlap_frac,
        )
        sentence_encoder = None
        if cfg.chunking.method == "semantic":
            sentence_encoder = _make_sentence_encoder(cfg)
            if sentence_encoder is None:
                log.warning(
                    "semantic chunking requested but no encoder checkpoint at "
                    "%s; Chunker will fall back to fixed (reference analog: "
                    "worker+CPU forces fixed, text_processor.py:1006-1034)",
                    cfg.chunking.semantic_model,
                )
        _WORKER_STATE.update(
            key=key,
            extractor=PDFExtractor(
                cache_dir=cfg.paths.resolve("cache_dir") if cfg.extraction.cache_enabled else None,
                accept_score=cfg.extraction.accept_quality,
                ocr=_load_ocr(cfg),
                ocr_accept_score=cfg.extraction.ocr_accept_quality,
            ),
            cleaner=TextCleaner(),
            chunker=Chunker(chunk_cfg, sentence_encoder=sentence_encoder),
        )
    return _WORKER_STATE["extractor"], _WORKER_STATE["cleaner"], _WORKER_STATE["chunker"]


def process_paper(
    cfg: Config, paper_id: str, pdf_path: str | Path, category: str = ""
) -> PaperResult:
    """extract → improve → clean → sections → chunk → cite → metadata.

    Mirrors the worker critical path (``worker.py:365-802``) but emits
    ChunkRecords for the columnar store instead of per-paper JSON.
    """
    t0 = time.perf_counter()
    extractor, cleaner, chunker = _components(cfg)
    try:
        ext = extractor.extract(pdf_path)
    except OSError as exc:
        return PaperResult(paper_id, False, error=f"io: {exc}")
    if not ext.success:
        return PaperResult(paper_id, False, error=ext.error or "extraction failed")

    improved = improve_pages(ext.pages)
    pages = improved.pages
    cleaned_pages = [cleaner.clean(p) for p in pages]
    text = "\n\n".join(cleaned_pages)
    if not text.strip():
        return PaperResult(paper_id, False, error="empty after cleaning")

    smap = extract_sections(text, cleaned_pages, page_join="\n\n")
    md = extract_metadata(text)
    citations = extract_citations(text, smap)
    from arxiv_rag_tpu.pipeline.crossref import extract_crossrefs

    crossrefs = extract_crossrefs(text, smap)
    chunks = chunker.chunk(text)
    quality = score_text(text, num_pages=max(1, len(pages))).score

    year_month = paper_id.split(".")[0] if "." in paper_id else ""
    records: list[ChunkRecord] = []
    for c in chunks:
        records.append(
            ChunkRecord(
                paper_id=paper_id,
                text=c.text,
                category=category,
                year_month=year_month,
                section=smap.section_at(c.start),
                page=smap.page_at(c.start),
                chunk_index=c.index,
                quality=round(quality, 4),
                token_count=len(c.text) // 4,
            )
        )
    paper_meta = {
        "paper_id": paper_id,
        "title": md.title,
        "abstract": md.abstract[:2000],
        "authors": md.authors,
        "doi": md.doi,
        "arxiv_id": md.arxiv_id,
        "num_citations": len(citations),
        "num_sections": len(smap.sections),
        "num_crossrefs": len(crossrefs.refs),
        "crossrefs_resolved": crossrefs.resolved_count,
        "method_used": ext.method_used,
        "quality_score": quality,
        "num_pages": len(pages),
    }
    return PaperResult(
        paper_id,
        True,
        num_chunks=len(records),
        text_length=len(text),
        quality=quality,
        seconds=time.perf_counter() - t0,
        records=records,
        paper_meta=paper_meta,
    )


def _process_one(args: tuple) -> PaperResult:
    cfg, paper_id, pdf_path, category = args
    try:
        return process_paper(cfg, paper_id, pdf_path, category)
    except Exception as exc:  # worker must never crash the pool
        return PaperResult(paper_id, False, error=f"{type(exc).__name__}: {exc}")


class PipelineRunner:
    """Batch fan-out with skip-processed + progress DB
    (``pipeline.py:437-959``)."""

    STAGE = "chunk"

    def __init__(self, cfg: Config, corpus_dir: str | Path | None = None) -> None:
        self.cfg = cfg
        self.corpus_dir = Path(corpus_dir or cfg.paths.resolve("corpus_dir"))
        self.corpus_dir.mkdir(parents=True, exist_ok=True)
        self.progress = ProgressDB(self.corpus_dir / "progress.db")
        self._meta_path = self.corpus_dir / "papers.jsonl"

    def run(
        self,
        papers: list[tuple[str, str, str]],  # (paper_id, pdf_path, category)
        skip_processed: bool = True,
        max_workers: int | None = None,
    ) -> dict:
        if skip_processed:
            pending_ids = set(self.progress.filter_pending(self.STAGE, [p[0] for p in papers]))
            todo = [p for p in papers if p[0] in pending_ids]
        else:
            todo = list(papers)
        skipped = len(papers) - len(todo)
        workers = max_workers if max_workers is not None else self.cfg.processing.num_workers
        log.info("pipeline: %d papers (%d skipped), %d workers", len(todo), skipped, workers)

        stats = {"total": len(papers), "skipped": skipped, "ok": 0, "failed": 0, "chunks": 0}
        t0 = time.perf_counter()
        results_buffer: list[tuple[str, str, str, str]] = []

        with CorpusWriter(self.corpus_dir) as writer, open(self._meta_path, "a") as meta_f:

            def consume(res: PaperResult) -> None:
                if res.ok:
                    stats["ok"] += 1
                    stats["chunks"] += res.num_chunks
                    writer.add_all(res.records)
                    meta_f.write(json.dumps(res.paper_meta) + "\n")
                    detail = json.dumps(
                        {"num_chunks": res.num_chunks, "text_length": res.text_length}
                    )
                    results_buffer.append((res.paper_id, "done", detail, ""))
                else:
                    stats["failed"] += 1
                    results_buffer.append((res.paper_id, "failed", "", res.error or ""))
                if len(results_buffer) >= 50:  # batched writes, pipeline.py:163-181
                    self.progress.mark_batch(self.STAGE, results_buffer)
                    results_buffer.clear()

            if workers <= 1:
                for item in todo:
                    consume(_process_one((self.cfg, *item)))
            else:
                with ProcessPoolExecutor(max_workers=workers) as ex:
                    futs = [ex.submit(_process_one, (self.cfg, *item)) for item in todo]
                    for fut in as_completed(futs):
                        consume(fut.result())
            if results_buffer:
                self.progress.mark_batch(self.STAGE, results_buffer)
        stats["seconds"] = round(time.perf_counter() - t0, 3)
        stats["papers_per_sec"] = round((stats["ok"] + stats["failed"]) / max(stats["seconds"], 1e-9), 3)
        return stats

    def get_stats(self) -> dict:
        return self.progress.stats(self.STAGE)

    def close(self) -> None:
        self.progress.close()
