"""`arag` — the framework CLI.

Verbs mirror the reference's per-stage CLIs plus the new engine:

  download  1-downloader/downloader.py:979-1030
  dedup     1-downloader/deduplicate.py:143-188
  chunk     3-chunks/pipeline/run.py:50-166 (extract+chunk)
  repair    fix_chunk_issues.py / fix_embedding_issues.py
  augment   3-chunks/improvement/improve_chunks.py:279-305
  audit     the five analyzer CLIs (SURVEY §2 #8/#16/#18)
  convert   HF checkpoint → framework checkpoint
  embed     4-embed/generation/generate_embeddings_parallel.py:470-618
  index     index build over stored embeddings
  search    query-time engine (config-only in the reference)
  bench     the missing benchmarks/ harness

Heavy imports (jax, pyarrow) are deferred into each verb so
`arag download --help` never pays TPU init.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
from pathlib import Path




def _native_tokenizer_or_none(vocab_path):
    """C++ batch tokenizer when a real vocab exists and the native lib
    builds (38x the Python path per core); None otherwise."""
    from pathlib import Path as _P

    if not (vocab_path and _P(vocab_path).exists()):
        return None
    try:
        from arxiv_rag_tpu.tokenize.native import NativeWordPieceTokenizer, is_available

        if is_available():
            return NativeWordPieceTokenizer(vocab_path)
    except Exception as exc:  # noqa: BLE001 — fall back silently but log
        print(f"note: native tokenizer unavailable ({exc}); using Python",
              file=sys.stderr)
    return None


def _tokenizer_or_toy(vocab_path):
    """Real vocab when available; the toy char-level fallback is for
    smoke runs only and is announced loudly (silent fallback destroys
    retrieval quality with real weights)."""
    from pathlib import Path as _P

    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

    if vocab_path and _P(vocab_path).exists():
        return WordPieceTokenizer.from_vocab_file(vocab_path)
    print("WARNING: no vocab.txt found - using the toy char-level vocab "
          "(fine for --random-init smoke runs, wrong for real checkpoints)",
          file=sys.stderr)
    return WordPieceTokenizer.toy()


def _add_download(sub) -> None:
    p = sub.add_parser("download", help="fetch arXiv PDFs from GCS")
    p.add_argument("--ids", required=True, help="file of category|paper_id lines")
    p.add_argument("--output", required=True)
    p.add_argument("--max-workers", type=int, default=12)
    p.add_argument("--max-versions", type=int, default=4)
    p.add_argument("--min-free-gb", type=float, default=5.0)
    p.add_argument("--limit", type=int, default=0)


def cmd_download(args) -> int:
    from arxiv_rag_tpu.ingest import Downloader, DownloaderConfig
    from arxiv_rag_tpu.ingest.downloader import parse_papers_file

    papers = parse_papers_file(args.ids)
    if args.limit:
        papers = papers[: args.limit]
    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    dl = Downloader(
        DownloaderConfig(
            output_dir=Path(args.output),
            max_workers=args.max_workers,
            max_versions=args.max_versions,
            min_free_gb=args.min_free_gb,
        ),
        stop_event=stop,
    )
    res = dl.download(papers)
    print(json.dumps(res.__dict__, default=str))
    return 0 if res.failed == 0 else 1


def _add_dedup(sub) -> None:
    p = sub.add_parser("dedup", help="remove cross-listed duplicate PDFs")
    p.add_argument("root")
    p.add_argument("--execute", action="store_true", help="actually delete (default dry-run)")


def cmd_dedup(args) -> int:
    from arxiv_rag_tpu.ingest import deduplicate

    rep = deduplicate(args.root, execute=args.execute)
    print(json.dumps({k: v for k, v in rep.__dict__.items() if k != "kept"}))
    return 0


def _add_chunk(sub) -> None:
    p = sub.add_parser("chunk", help="extract+chunk PDFs into the corpus store")
    p.add_argument("--pdfs", required=True, help="PDF root ({cat}/{ym}/{id}.pdf)")
    p.add_argument("--corpus", required=True, help="output corpus dir")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--paper-id", default=None)
    p.add_argument("--no-skip", action="store_true")


def cmd_chunk(args) -> int:
    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.pipeline.runner import PipelineRunner

    cfg = load_config(args.config)
    root = Path(args.pdfs)
    papers = []
    for pdf in sorted(root.rglob("*.pdf")):
        rel = pdf.relative_to(root)
        if pdf.name.startswith("._"):  # macOS junk filter, pipeline.py:599
            continue
        cat = rel.parts[0] if len(rel.parts) >= 3 else ""
        pid = pdf.stem.replace("_", "/")
        if args.paper_id and pid != args.paper_id:
            continue
        papers.append((pid, str(pdf), cat))
    if args.limit:
        papers = papers[: args.limit]
    runner = PipelineRunner(cfg, corpus_dir=args.corpus)
    stats = runner.run(papers, skip_processed=not args.no_skip, max_workers=args.workers)
    runner.close()
    print(json.dumps(stats))
    return 0 if stats["failed"] == 0 else 1


def _add_extract(sub) -> None:
    p = sub.add_parser("extract", help="extract PDFs to JSON (no chunking)")
    p.add_argument("--pdfs", required=True)
    p.add_argument("--out", required=True, help="output dir (mirrors layout)")
    p.add_argument("--cache", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--seed", type=int, default=None, help="random sample seed")
    p.add_argument("--improve", action="store_true", help="run the improver pass")
    p.add_argument("--tables", action="store_true", help="geometric table extraction")
    p.add_argument("--report", default=None, help="write run stats JSON here")


def cmd_extract(args) -> int:
    """Standalone extract-everything driver (reference:
    save_extractions.py, extract_pdfs_to_disk.py). Writes one JSON per
    paper + error/run ledgers; memory-aware batching."""
    import random

    from arxiv_rag_tpu.pipeline.extract import PDFExtractor, improve_pages
    from arxiv_rag_tpu.pipeline.extract.extractor import extract_tables_bytes
    from arxiv_rag_tpu.utils import MemoryManager, ProgressReporter

    root = Path(args.pdfs)
    out_root = Path(args.out)
    pdfs = sorted(p for p in root.rglob("*.pdf") if not p.name.startswith("._"))
    if args.seed is not None:
        random.Random(args.seed).shuffle(pdfs)
    if args.limit:
        pdfs = pdfs[: args.limit]

    extractor = PDFExtractor(cache_dir=args.cache)
    mm = MemoryManager()
    reporter = ProgressReporter(len(pdfs), every=25, phase="extract")
    stats = {"total": len(pdfs), "ok": 0, "failed": 0, "by_method": {}}
    errors_path = out_root / "_extraction_errors.jsonl"
    out_root.mkdir(parents=True, exist_ok=True)
    with open(errors_path, "a") as errf:
        for pdf in pdfs:
            res = extractor.extract(pdf)
            rel = pdf.relative_to(root).with_suffix(".json")
            if res.success:
                pages = res.pages
                if args.improve:
                    pages = improve_pages(pages).pages
                dest = out_root / rel
                dest.parent.mkdir(parents=True, exist_ok=True)
                tables = extract_tables_bytes(pdf.read_bytes()) if args.tables else []
                dest.write_text(json.dumps({
                    "paper_id": pdf.stem.replace("_", "/"),
                    "tables": tables,
                    "text": "\n\n".join(pages),
                    "pages": pages,
                    "method_used": res.method_used,
                    "quality_score": res.quality_score,
                    "pdf_type": res.pdf_type,
                    "metadata": res.metadata,
                }))
                stats["ok"] += 1
                stats["by_method"][res.method_used] = (
                    stats["by_method"].get(res.method_used, 0) + 1
                )
                reporter.update(1)
            else:
                errf.write(json.dumps({"pdf": str(pdf), "error": res.error}) + "\n")
                stats["failed"] += 1
                reporter.update(0, failed=1)
            mm.maybe_gc()
    state = reporter.finish()
    stats["seconds"] = round(state.elapsed, 2)
    stats["pdfs_per_sec"] = round(state.rate, 3)
    if args.report:
        Path(args.report).write_text(json.dumps(stats, indent=1))
    print(json.dumps(stats))
    return 0 if stats["failed"] == 0 else 1


def _add_repair(sub) -> None:
    p = sub.add_parser("repair", help="enforce the chunk contract (split/drop/clean)")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-chars", type=int, default=50)
    p.add_argument("--max-chars", type=int, default=2000)
    p.add_argument("--min-quality", type=float, default=0.7)
    p.add_argument("--no-headers", action="store_true")
    p.add_argument("--keep-duplicates", action="store_true")
    p.add_argument("--dry-run", action="store_true")


def cmd_repair(args) -> int:
    from arxiv_rag_tpu.pipeline.repair import repair_corpus

    stats = repair_corpus(
        args.corpus,
        args.out,
        min_chars=args.min_chars,
        max_chars=args.max_chars,
        min_quality=args.min_quality,
        add_context_headers=not args.no_headers,
        drop_duplicates=not args.keep_duplicates,
        dry_run=args.dry_run,
    )
    print(json.dumps(stats.__dict__))
    return 0


def _add_augment(sub) -> None:
    p = sub.add_parser("augment", help="build per-paper light payloads")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True, help="output JSONL")
    p.add_argument("--min-readability", type=float, default=None)
    p.add_argument("--min-citations", type=int, default=None)


def cmd_augment(args) -> int:
    from collections import defaultdict

    from arxiv_rag_tpu.pipeline.augment import build_light_payload, passes_filters
    from arxiv_rag_tpu.pipeline.repair import load_paper_titles
    from arxiv_rag_tpu.store.corpus import CorpusReader

    reader = CorpusReader(args.corpus)
    titles = load_paper_titles(args.corpus)
    texts: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for batch in reader.iter_batches(columns=["paper_id", "chunk_index", "text"]):
        for row in batch.to_pylist():
            texts[row["paper_id"]].append((row["chunk_index"], row["text"]))
    kept = 0
    with open(args.out, "w") as f:
        for pid, chunks in texts.items():
            body = "\n\n".join(t for _, t in sorted(chunks))
            payload = build_light_payload(pid, body, title=titles.get(pid, ""))
            if passes_filters(payload, args.min_readability, args.min_citations):
                f.write(json.dumps(payload.to_dict()) + "\n")
                kept += 1
    print(json.dumps({"papers": len(texts), "kept": kept}))
    return 0


def _add_audit(sub) -> None:
    p = sub.add_parser("audit", help="corpus census + readiness report")
    p.add_argument("--corpus", default=None)
    p.add_argument("--extractions", default=None,
                   help="audit an `arag extract` output dir instead")
    p.add_argument("--embed-model", default="mpnet",
                   help="token-band profile (mpnet/sentence_transformers/"
                        "minilm/openai/cohere)")
    p.add_argument("--json-out", default=None)


def cmd_audit(args) -> int:
    from arxiv_rag_tpu.audit import (
        audit_corpus,
        audit_extractions,
        format_report,
        save_report,
    )

    if args.extractions:
        rep = audit_extractions(args.extractions)
        print(json.dumps(rep, indent=1))
        if args.json_out:
            Path(args.json_out).write_text(json.dumps(rep, indent=1))
        return 0
    if not args.corpus:
        print("need --corpus or --extractions", file=sys.stderr)
        return 2
    rep = audit_corpus(args.corpus, model=args.embed_model)
    print(format_report(rep))
    if args.json_out:
        save_report(rep, args.json_out)
    return 0


def _add_convert(sub) -> None:
    p = sub.add_parser("convert", help="convert an HF MPNet checkpoint")
    p.add_argument("--hf-dir", required=True, help="dir with model.safetensors + config.json")
    p.add_argument("--out", required=True)


def cmd_convert(args) -> int:
    from arxiv_rag_tpu.models.convert import (
        from_safetensors,
        load_model_config,
        save_checkpoint,
    )

    cfg = load_model_config(args.hf_dir)
    params = from_safetensors(args.hf_dir, cfg)
    save_checkpoint(args.out, params, cfg)
    # carry tokenizer files: embed/search/train look for vocab.txt next
    # to the checkpoint (falling back to the toy vocab silently breaks
    # real-model quality)
    copied = []
    for name in ("vocab.txt", "tokenizer.json", "tokenizer_config.json",
                 "special_tokens_map.json"):
        srcf = Path(args.hf_dir) / name
        if srcf.exists():
            (Path(args.out) / name).write_bytes(srcf.read_bytes())
            copied.append(name)
    print(json.dumps({"saved": args.out, "hidden": cfg.hidden_size,
                      "layers": cfg.num_hidden_layers, "tokenizer_files": copied}))
    return 0


def _add_embed(sub) -> None:
    p = sub.add_parser("embed", help="embed corpus chunks on TPU")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True, help="output embeddings dir")
    p.add_argument("--checkpoint", default=None, help="converted checkpoint dir")
    p.add_argument("--vocab", default=None, help="tokenizer vocab.txt")
    p.add_argument("--random-init", action="store_true", help="random weights (smoke runs)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--min-quality", type=float, default=0.9)
    p.add_argument("--shard-batches", action="store_true", help="shard batches over the device mesh")


def cmd_embed(args) -> int:
    import numpy as np

    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.store.corpus import CorpusReader
    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

    if not args.checkpoint and not args.random_init:
        print("need --checkpoint or --random-init", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.models.convert import load_checkpoint

    if args.checkpoint:
        params, mcfg = load_checkpoint(args.checkpoint)
        vocab_path = args.vocab or str(Path(args.checkpoint) / "vocab.txt")
    else:
        mcfg = ModelConfig()
        params = init_params(jax.random.PRNGKey(0), mcfg, dtype=jnp.bfloat16)
        vocab_path = args.vocab
    tokenizer = _tokenizer_or_toy(vocab_path)
    native_tok = _native_tokenizer_or_none(vocab_path)
    mesh = None
    if args.shard_batches:
        from arxiv_rag_tpu.parallel import data_mesh

        mesh = data_mesh()
    embedder = Embedder(params, mcfg, tokenizer, batch_size=args.batch_size,
                        mesh=mesh, native_tokenizer=native_tok)

    reader = CorpusReader(args.corpus)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = {"batches": [], "dim": mcfg.hidden_size, "model": args.checkpoint or "random-init"}
    total = 0
    resumed = 0
    for i, batch in enumerate(
        reader.iter_batches(batch_size=8192, columns=["chunk_id", "text"], min_quality=args.min_quality)
    ):
        texts = batch.column("text").to_pylist()
        ids = batch.column("chunk_id").to_pylist()
        emb_path = out_dir / f"embeddings_{i:05d}.npy"
        ids_path = out_dir / f"ids_{i:05d}.json"
        # resume: batch files are the checkpoint unit (the reference's
        # batch-numbered .npy + manifest scheme, save_embeddings_to_disk.py:31-80)
        if emb_path.exists() and ids_path.exists() and json.loads(ids_path.read_text()) == ids:
            resumed += 1
        else:
            # failure ladder: batch → per-item → exclusion ledger. The
            # reference falls back to ZERO VECTORS that silently poison
            # the index (generate_embeddings_parallel.py:167-169); here
            # failing items are excluded and ledgered instead.
            try:
                embs = embedder.encode_texts(texts)
            except Exception as batch_exc:  # noqa: BLE001 — ladder, not silence
                good_embs, good_ids = [], []
                with open(out_dir / "_excluded.jsonl", "a") as exf:
                    for cid, text in zip(ids, texts):
                        try:
                            good_embs.append(embedder.encode_texts([text])[0])
                            good_ids.append(cid)
                        except Exception as item_exc:  # noqa: BLE001
                            exf.write(json.dumps({
                                "chunk_id": cid,
                                "error": f"{type(item_exc).__name__}: {item_exc}",
                                "batch_error": f"{type(batch_exc).__name__}",
                            }) + "\n")
                embs = np.stack(good_embs) if good_embs else np.zeros((0, mcfg.hidden_size), np.float32)
                ids = good_ids
            np.save(emb_path, embs)
            ids_path.write_text(json.dumps(ids))
        manifest["batches"].append({"file": emb_path.name, "rows": len(ids)})
        total += len(ids)
    manifest["total_rows"] = total
    (out_dir / "index.json").write_text(json.dumps(manifest, indent=1))
    print(json.dumps({"embedded": total, "resumed_batches": resumed,
                      "batches": len(manifest["batches"]),
                      "stats": embedder.stats.__dict__}))
    return 0


def _add_index(sub) -> None:
    p = sub.add_parser("index", help="build the dense search index")
    p.add_argument("--embeddings", required=True, help="embed output dir")
    p.add_argument("--corpus", default=None, help="corpus dir (for category masks)")
    p.add_argument("--out", required=True)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32", "int8"])
    p.add_argument("--device-build", action="store_true",
                   help="normalize/quantize on the TPU (fast for multi-M rows)")
    p.add_argument("--append", action="store_true",
                   help="append these embeddings to an EXISTING index at "
                        "--out (new shard files; dtype/normalize follow the "
                        "base manifest; a saved IVF delta is refreshed from "
                        "its trained centroids without re-running k-means)")
    p.add_argument("--ivf-clusters", type=int, default=0,
                   help="also train an IVF (cluster-pruned) delta with this "
                        "many clusters; search probes it via --nprobe")
    p.add_argument("--ivf-block-rows", type=int, default=1024,
                   help="IVF layout block size; must be a multiple of 128 "
                        "(TPU lane tiling of the scale/mask sidecars — "
                        "sweeps favor 1024-4096)")
    p.add_argument("--ivf-iters", type=int, default=10)


def cmd_index(args) -> int:
    import numpy as np

    from arxiv_rag_tpu.index.store import build_index, build_index_device

    src = Path(args.embeddings)
    manifest = json.loads((src / "index.json").read_text())
    parts = [np.load(src / b["file"]) for b in manifest["batches"]]
    ids: list[str] = []
    for i in range(len(manifest["batches"])):
        ids.extend(json.loads((src / f"ids_{i:05d}.json").read_text()))
    embs = np.concatenate(parts, axis=0) if parts else np.zeros((0, manifest["dim"]), np.float32)

    categories = None
    if args.corpus:
        from arxiv_rag_tpu.store.corpus import CorpusReader

        cat_of: dict[str, str] = {}
        for batch in CorpusReader(args.corpus).iter_batches(columns=["chunk_id", "category"]):
            for row in batch.to_pylist():
                cat_of[row["chunk_id"]] = row["category"]
        categories = [cat_of.get(cid, "") for cid in ids]

    ivf_meta = {}
    if args.append:
        from arxiv_rag_tpu.index.ivf import IVFIndex
        from arxiv_rag_tpu.index.store import append_index

        idx = append_index(
            args.out, embs, categories=categories,
            chunk_ids=ids if ids else None, device=args.device_build,
        )
        if IVFIndex.exists(args.out):
            ivf = IVFIndex.extend(args.out, idx)
            ivf_meta = {"ivf_clusters": ivf.n_clusters,
                        "ivf_block_rows": ivf.block_rows,
                        "ivf_refreshed": True}
    else:
        builder = build_index_device if args.device_build else build_index
        idx = builder(embs, categories=categories, dtype=args.dtype, chunk_ids=ids)
        idx.model = manifest.get("model", "")
        idx.save(args.out)  # writes chunk_ids.json from idx.chunk_ids
    if args.ivf_clusters and not ivf_meta:
        from arxiv_rag_tpu.index.ivf import IVFIndex

        if args.ivf_block_rows % 128:
            print(f"error: --ivf-block-rows {args.ivf_block_rows} must be a "
                  f"multiple of 128 (TPU lane tiling of the IVF kernel's "
                  f"scale/mask sidecars)", file=sys.stderr)
            return 2

        ivf = IVFIndex.build(
            idx, args.ivf_clusters, block_rows=args.ivf_block_rows,
            iters=args.ivf_iters,
        )
        ivf.save(args.out)
        ivf_meta = {"ivf_clusters": ivf.n_clusters,
                    "ivf_block_rows": ivf.block_rows}
    print(json.dumps({"rows": idx.num_rows, "dim": idx.dim, "dtype": idx.dtype,
                      "categories": idx.categories, **ivf_meta}))
    return 0


def _add_search(sub) -> None:
    p = sub.add_parser("search", help="query the index")
    p.add_argument("--index", required=True)
    p.add_argument("--corpus", default=None)
    p.add_argument("--query", action="append", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--categories", default=None, help="comma-separated cs.* filter")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--hybrid-alpha", type=float, default=None,
                   help="dense/BM25 mix (reference config.yaml:66 uses 0.7); "
                        "builds a BM25 index over the corpus texts")
    p.add_argument("--rerank-checkpoint", default=None,
                   help="BERT cross-encoder checkpoint dir; enables reranking")
    p.add_argument("--rerank-random-init", action="store_true",
                   help="random cross-encoder (smoke runs)")
    p.add_argument("--rerank-cascade", type=int, default=None,
                   help="cascade depth: score all candidate pairs at a "
                        "64-token truncation, rescore only the top N "
                        "survivors per query at full pair length "
                        "(~1.6x less cross-encoder work at depth 20; 0/absent = "
                        "the reference's single-stage config)")
    p.add_argument("--shard", action="store_true",
                   help="row-shard the index over the device mesh")
    p.add_argument("--nprobe", type=int, default=None,
                   help="probe this many IVF clusters (approximate search; "
                        "needs an index built with --ivf-clusters)")


def _build_engine(args):
    # serve's parser omits some search-only flags; default them here
    for _attr in ("hybrid_alpha", "rerank_checkpoint"):
        if not hasattr(args, _attr):
            setattr(args, _attr, None)
    if not hasattr(args, "rerank_random_init"):
        args.rerank_random_init = False
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.index.store import DenseIndex
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.models.convert import load_checkpoint
    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.search.engine import SearchEngine
    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

    # retrieval knobs (rerank truncation/admission, hybrid alpha default)
    # come from the typed config: defaults <- ARAG__RETRIEVAL__* env
    rcfg = load_config().retrieval
    if getattr(args, "nprobe", None) is not None:
        import dataclasses as _dc

        rcfg = _dc.replace(rcfg, nprobe=args.nprobe)
    if getattr(args, "rerank_cascade", None) is not None:
        import dataclasses as _dc2

        rcfg = _dc2.replace(rcfg, rerank_cascade_depth=args.rerank_cascade)

    idx = DenseIndex.load(args.index)
    ivf = None
    from arxiv_rag_tpu.index.ivf import IVFIndex

    if IVFIndex.exists(args.index):
        # the delta is small on disk; the load re-permutes dense rows
        ivf = IVFIndex.load(args.index, idx)
        if rcfg.nprobe and not getattr(args, "shard", False):
            # single-chip placement only: the mesh route builds its own
            # cluster-partitioned layout (engine._sharded_ivf), so the
            # replicated upload here would be multi-GB dead weight
            ivf.to_device()
    if getattr(args, "shard", False):
        from arxiv_rag_tpu.parallel import data_mesh, init_distributed

        init_distributed()
        idx.to_device(mesh=data_mesh())
    if args.checkpoint:
        params, mcfg = load_checkpoint(args.checkpoint)
        vocab_path = args.vocab or str(Path(args.checkpoint) / "vocab.txt")
    else:
        mcfg = ModelConfig()
        params = init_params(jax.random.PRNGKey(0), mcfg, dtype=jnp.bfloat16)
        vocab_path = args.vocab
    tokenizer = _tokenizer_or_toy(vocab_path)
    # query-time embedder: serving windows are small and varied, so
    # allow small padded batch heights next to the bulk shape
    embedder = Embedder(params, mcfg, tokenizer, batch_sizes=(64, 512))

    corpus = None
    if args.corpus:
        from arxiv_rag_tpu.store.corpus import CorpusReader

        # size the lazy-hydration row-group cache so a large corpus fits:
        # the old fixed 512 MB default churned through eviction at 2M rows
        # (the serve_bench 366-qps hybrid number needed 2 GB). Default:
        # 1.5x the on-disk parquet bytes (decompression headroom),
        # clamped to [512 MB, 4 GB]; --hydration-cache-mb overrides.
        mb = getattr(args, "hydration_cache_mb", None)
        if mb is None:
            try:
                disk = sum(p.stat().st_size
                           for p in Path(args.corpus).glob("*.parquet"))
            except OSError:
                disk = 0
            cache = max(512 << 20, min(4 << 30, int(disk * 1.5)))
        else:
            cache = int(mb) << 20
        corpus = CorpusReader(args.corpus, cache_bytes=cache)

    bm25 = None
    if args.hybrid_alpha is not None:
        if corpus is None:
            print("--hybrid-alpha needs --corpus (BM25 is built over its texts)",
                  file=sys.stderr)
            raise SystemExit(2)
        from arxiv_rag_tpu.search.engine import bm25_for_index

        # aligned to INDEX rows (the index may be a quality-filtered
        # subset of the corpus), not raw corpus order
        bm25 = bm25_for_index(idx, corpus)

    reranker = None
    if args.rerank_checkpoint or args.rerank_random_init:
        from arxiv_rag_tpu.models.bert import BertConfig, init_params as bert_init
        from arxiv_rag_tpu.search.rerank import CrossEncoderReranker

        if args.rerank_checkpoint:
            import numpy as _np

            ck = Path(args.rerank_checkpoint)
            bcfg_d = json.loads((ck / "config.json").read_text())
            bcfg = BertConfig(**{k: v for k, v in bcfg_d.items()
                                 if k in BertConfig.__dataclass_fields__})
            from arxiv_rag_tpu.models.bert import from_hf_state_dict

            with _np.load(ck / "state.npz") as z:
                state = {k: z[k] for k in z.files}
            bparams = from_hf_state_dict(state, bcfg)
            btok = WordPieceTokenizer.from_vocab_file(ck / "vocab.txt")
        else:
            btok = tokenizer
            bcfg = BertConfig(vocab_size=max(tokenizer.vocab.values()) + 1,
                              hidden_size=64, num_hidden_layers=2,
                              num_attention_heads=4, intermediate_size=128,
                              pad_token_id=tokenizer.pad_id)
            bparams = bert_init(jax.random.PRNGKey(2), bcfg)
        reranker = CrossEncoderReranker(
            bparams, bcfg, btok,
            max_pair_len=rcfg.rerank_max_pair_len or None,
        )

    return SearchEngine(idx, embedder=embedder, corpus=corpus, bm25=bm25,
                        reranker=reranker, cfg=rcfg, ivf=ivf)


def cmd_search(args) -> int:
    engine = _build_engine(args)
    cats = args.categories.split(",") if args.categories else None
    results = engine.search(args.query, k=args.k, categories=cats, hybrid_alpha=args.hybrid_alpha)
    for qi, hits in enumerate(results):
        print(f"query[{qi}]: {args.query[qi]}")
        for h in hits:
            line = f"  {h.score:.4f} row={h.row}"
            if h.chunk_id:
                line += f" {h.chunk_id} [{h.category}] {h.section}"
            if h.text:
                line += f" :: {h.text[:100]}"
            print(line)
    return 0






def _add_eval(sub) -> None:
    p = sub.add_parser("eval", help="retrieval-quality evaluation (recall@k/MRR)")
    p.add_argument("--index", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max-queries", type=int, default=256)
    p.add_argument("--hybrid-alpha", type=float, default=None)
    p.add_argument("--rerank-checkpoint", default=None)
    p.add_argument("--rerank-random-init", action="store_true")
    p.add_argument("--shard", action="store_true")


def cmd_eval(args) -> int:
    from arxiv_rag_tpu.evaluate import evaluate_engine, title_queries
    from arxiv_rag_tpu.pipeline.repair import load_paper_titles

    engine = _build_engine(args)
    if engine.corpus is None:
        print("eval needs --corpus", file=sys.stderr)
        return 2
    titles = load_paper_titles(args.corpus)
    queries, relevant = title_queries(engine.corpus, titles, args.max_queries)
    if not queries:
        print("no usable (title, chunks) pairs in the corpus", file=sys.stderr)
        return 2
    res = evaluate_engine(engine, queries, relevant, k=args.k)
    print(json.dumps(res.to_dict()))
    return 0


def _add_status(sub) -> None:
    p = sub.add_parser("status", help="pipeline progress + corpus summary")
    p.add_argument("--corpus", required=True)


def cmd_status(args) -> int:
    from arxiv_rag_tpu.store.progress import ProgressDB

    out = {}
    db_path = Path(args.corpus) / "progress.db"
    if db_path.exists():
        with ProgressDB(db_path) as db:
            out["chunk_stage"] = db.stats("chunk")
            fails = db.failures("chunk")
            if fails:
                # surface the error ledger (capped) so operators see WHY
                out["failed_papers"] = [
                    {"paper_id": pid, "error": (err or "")[:200]}
                    for pid, err in fails[:50]
                ]
                if len(fails) > 50:
                    out["failed_papers_truncated"] = len(fails) - 50
    for name in ("corpus.json", "manifest.json"):
        mp = Path(args.corpus) / name
        if mp.exists():
            m = json.loads(mp.read_text())
            out["corpus"] = {
                "num_rows": m.get("num_rows"),
                "categories": m.get("categories"),
                "shards": len(m.get("shards", [])),
            }
            break
    papers = Path(args.corpus) / "papers.jsonl"
    if papers.exists():
        out["papers"] = sum(1 for _ in papers.open())
    print(json.dumps(out, indent=1))
    return 0


def _add_train(sub) -> None:
    p = sub.add_parser("train", help="contrastive fine-tune of the encoder")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--checkpoint", default=None, help="starting checkpoint (else random init)")
    p.add_argument("--vocab", default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--max-pairs", type=int, default=50000)
    p.add_argument("--shard-batches", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="orbax TrainState snapshot every N steps (0=off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest snapshot under --out/state")
    p.add_argument("--small-model", action="store_true",
                   help="tiny ModelConfig for smoke runs")


def cmd_train(args) -> int:
    """Fine-tune the embedder on (title+abstract -> chunk) pairs mined
    from the corpus: self-supervised domain adaptation, the capability
    the reference lacks (it only consumes a frozen checkpoint)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.models.convert import load_checkpoint, save_checkpoint
    from arxiv_rag_tpu.pipeline.repair import load_paper_titles
    from arxiv_rag_tpu.store.corpus import CorpusReader
    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer
    from arxiv_rag_tpu.train import make_train_step

    # --- mine pairs: query = paper title, positive = a chunk of it ---
    reader = CorpusReader(args.corpus)
    titles = load_paper_titles(args.corpus)
    pairs: list[tuple[str, str]] = []
    for batch in reader.iter_batches(columns=["paper_id", "text"]):
        for row in batch.to_pylist():
            title = titles.get(row["paper_id"], "")
            if len(title) > 10 and len(row["text"]) > 100:
                pairs.append((title, row["text"]))
            if len(pairs) >= args.max_pairs:
                break
        if len(pairs) >= args.max_pairs:
            break
    if len(pairs) < args.batch_size:
        print(f"not enough pairs ({len(pairs)}) for batch {args.batch_size}",
              file=sys.stderr)
        return 2

    if args.checkpoint:
        params, mcfg = load_checkpoint(args.checkpoint)
        vocab_path = args.vocab or str(Path(args.checkpoint) / "vocab.txt")
    else:
        mcfg = (
            ModelConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=128,
                        max_position_embeddings=args.seq_len + 2)
            if args.small_model else ModelConfig()
        )
        params = init_params(jax.random.PRNGKey(0), mcfg)
        vocab_path = args.vocab
    tokenizer = _tokenizer_or_toy(vocab_path)
    if args.small_model:
        mcfg = ModelConfig(
            vocab_size=max(tokenizer.vocab.values()) + 1, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=args.seq_len + 2,
            pad_token_id=tokenizer.pad_id,
        )
        params = init_params(jax.random.PRNGKey(0), mcfg)

    mesh = None
    if args.shard_batches:
        from arxiv_rag_tpu.parallel import data_mesh

        mesh = data_mesh()
    init_state, train_step = make_train_step(
        mcfg, learning_rate=args.lr, mesh=mesh,
        compute_dtype=jnp.bfloat16 if not args.small_model else jnp.float32,
    )
    state = init_state(params)
    state_dir = Path(args.out) / "state"
    if args.resume:
        from arxiv_rag_tpu.train.checkpoint import restore_train_state

        restored = restore_train_state(state_dir, state)
        if restored is not None:
            state = restored
            print(f"resumed at step {int(state.step)}", file=sys.stderr)

    rng = np.random.default_rng(0)
    order = rng.permutation(len(pairs))
    bs, sl = args.batch_size, args.seq_len
    losses = []
    for step in range(args.steps):
        sel = order[(step * bs) % len(pairs):][:bs]
        if len(sel) < bs:
            sel = np.concatenate([sel, order[: bs - len(sel)]])
        q_texts = [pairs[i][0] for i in sel]
        p_texts = [pairs[i][1] for i in sel]
        q_ids, q_mask = tokenizer.encode_batch(q_texts, max_len=sl)
        p_ids, p_mask = tokenizer.encode_batch(p_texts, max_len=sl)
        state, metrics = train_step(
            state, jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(p_ids), jnp.asarray(p_mask),
        )
        losses.append(float(metrics["loss"]))
        if (step + 1) % 10 == 0:
            print(f"step {step+1}/{args.steps} loss={losses[-1]:.4f} "
                  f"acc={float(metrics['in_batch_acc']):.3f}", file=sys.stderr)
        if args.checkpoint_every and (step + 1) % args.checkpoint_every == 0:
            from arxiv_rag_tpu.train.checkpoint import save_train_state

            save_train_state(state_dir, state)

    save_checkpoint(args.out, jax.device_get(state.params), mcfg)
    if vocab_path and Path(vocab_path).exists():
        (Path(args.out) / "vocab.txt").write_text(Path(vocab_path).read_text())
    print(json.dumps({
        "steps": args.steps, "pairs": len(pairs),
        "first_loss": round(losses[0], 4), "last_loss": round(losses[-1], 4),
        "saved": args.out,
    }))
    return 0


def _add_serve(sub) -> None:
    p = sub.add_parser("serve", help="HTTP query service over an index")
    p.add_argument("--index", required=True)
    p.add_argument("--corpus", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--shard", action="store_true",
                   help="row-shard the index over the device mesh")
    p.add_argument("--nprobe", type=int, default=None,
                   help="serve with IVF probing (approximate retrieval)")
    p.add_argument("--batch-window-ms", type=float, default=4.0,
                   help="micro-batch coalescing window (0 = serialize directly)")
    p.add_argument("--max-batch", type=int, default=512,
                   help="dispatch immediately once this many queries are queued")
    p.add_argument("--warmup", action="store_true",
                   help="compile every query-batch shape before listening "
                        "(a cold shape stalls live windows for seconds; on "
                        "the shared pool a remote compile can take minutes)")
    # flagship retrieval config (reference config.yaml:62-69) is
    # servable, not just searchable: hybrid BM25 merge + cross-encoder
    p.add_argument("--hybrid-alpha", type=float, default=None,
                   help="enable hybrid retrieval at this dense weight "
                        "(builds BM25 over --corpus, aligned to index rows)")
    p.add_argument("--rerank-checkpoint", default=None,
                   help="cross-encoder checkpoint dir (config.json + "
                        "state.npz + vocab.txt) for rerank of top-"
                        "rerank_top_k candidates")
    p.add_argument("--rerank-random-init", action="store_true",
                   help="random-init cross-encoder (tests/offline smoke)")
    p.add_argument("--rerank-cascade", type=int, default=None,
                   help="cascade depth: 64-token first pass over all "
                        "pairs, full-length rescore of the top N "
                        "survivors per query (0/absent = single-stage)")
    p.add_argument("--hydration-cache-mb", type=int, default=None,
                   help="row-group text cache for lazy hydration (default: "
                        "sized from corpus metadata, min 512 MB — at 2M rows "
                        "the text column alone exceeds the old fixed 512 MB "
                        "and warm_hydration churned through eviction)")
    p.add_argument("--admin-token", default=None,
                   help="shared secret for POST /admin/reload path "
                        "overrides (X-Admin-Token header); without it, "
                        "reload only accepts the --index/--corpus paths "
                        "this server was started with")


def cmd_serve(args) -> int:
    engine = _build_engine(args)
    from arxiv_rag_tpu.serve import serve

    if args.warmup:
        # every (Q bucket x token bucket) the micro-batcher can produce;
        # beyond 512 the engine rounds Q up to multiples of 128, so big
        # --max-batch values extend the list instead of staying cold
        buckets = getattr(engine.embedder, "buckets", (64,))
        qs = [1, 32, 64, 128, 256, 384, 512]
        q = 640
        while q <= args.max_batch:
            qs.append(q)
            q += 128
        # build warm texts by MEASURED token count, not a chars-per-token
        # guess: with a real WordPiece vocab "warm" is ~1 token (not 5
        # chars -> 1), so a char-count heuristic never fills buckets
        # >=64 and the first real long-query window still pays the
        # multi-second cold compile this flag exists to prevent
        tok = getattr(engine.embedder, "tokenizer", None)
        warm_texts = {}
        for b in buckets:
            target = max(1, b - 8)  # margin: the per-query suffix below
            words = ["warm"]
            if tok is not None:
                while (len(tok.encode(" ".join(words))) < target
                       and len(words) < 8 * target):
                    words = words + words
                while len(words) > 1 and len(tok.encode(" ".join(words[:-1]))) >= target:
                    words = words[:-1]
            warm_texts[b] = " ".join(words)
        for qn in qs:
            if qn > args.max_batch and qn != 1:
                continue
            for b in buckets:
                engine.search([f"{warm_texts[b]} {i}" for i in range(qn)], k=10)
            print(f"warmed shapes for {qn}-query windows", file=sys.stderr)
        groups = engine.warm_hydration()
        if groups:
            print(f"hydration cache prewarmed ({groups} row groups)",
                  file=sys.stderr)
        if engine.reranker is not None and hasattr(engine.reranker, "warm"):
            warmed = engine.reranker.warm(
                max_window_pairs=getattr(
                    engine.cfg, "rerank_max_window_pairs", 0) or 2048,
            )
            print(f"rerank buckets warmed: {warmed}", file=sys.stderr)

    httpd = serve(
        engine, args.host, args.port,
        index_stats={"rows": engine.index.num_rows, "dim": engine.index.dim,
                     "dtype": engine.index.dtype},
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        # POST /admin/reload picks up `arag index --append` growth from
        # these locations with zero downtime
        reload_paths={"index": args.index, "corpus": args.corpus},
        admin_token=args.admin_token,
    )
    print(f"serving on http://{args.host}:{args.port}", file=sys.stderr)
    # graceful SIGTERM (the downloader's shutdown contract, applied to
    # serving): stop accepting, resolve in-flight windows, then exit —
    # a killed dispatcher would leave handler threads blocked forever
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    old = signal.signal(signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("shutting down (draining in-flight windows)", file=sys.stderr)
    finally:
        signal.signal(signal.SIGTERM, old)
        httpd.batcher.close()
        httpd.server_close()
    return 0


def _add_bench(sub) -> None:
    p = sub.add_parser("bench", help="run the benchmark harness")
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace (TensorBoard format) here")


def cmd_bench(args) -> int:
    import os

    if args.rows:
        os.environ["ARAG_BENCH_ROWS"] = str(args.rows)
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import bench

    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            bench.main()
    else:
        bench.main()
    return 0


COMMANDS = {
    "download": cmd_download,
    "dedup": cmd_dedup,
    "extract": cmd_extract,
    "chunk": cmd_chunk,
    "repair": cmd_repair,
    "augment": cmd_augment,
    "audit": cmd_audit,
    "convert": cmd_convert,
    "embed": cmd_embed,
    "index": cmd_index,
    "search": cmd_search,
    "eval": cmd_eval,
    "status": cmd_status,
    "train": cmd_train,
    "serve": cmd_serve,
    "bench": cmd_bench,
}


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="arag", description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="command", required=True)
    for adder in (_add_download, _add_dedup, _add_extract, _add_chunk, _add_repair, _add_augment,
                  _add_audit, _add_convert, _add_embed, _add_index, _add_search, _add_eval, _add_status, _add_train, _add_serve, _add_bench):
        adder(sub)
    return ap


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS for CLI runs. A sitecustomize in some images
    registers a TPU plugin at interpreter start and overrides the env
    var, so the config must be re-applied post-import."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:  # jax may be absent for host-only verbs
            pass


def main(argv: list[str] | None = None) -> int:
    _apply_platform_env()
    args = build_parser().parse_args(argv)
    return COMMANDS[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
