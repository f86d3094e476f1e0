"""CLI end-to-end: chunk → audit → repair → embed(random) → index → search.

Runs in-process via main(argv) — no subprocess, so the jax CPU-mesh
conftest setup applies and compile caches are shared.
"""

import json

import pytest

from pdfgen import simple_text_pdf
from arxiv_rag_tpu.cli.main import main

TEXT = (
    "A Study Of Retrieval Pipelines\n"
    "Abstract\n"
    "We evaluate retrieval systems for scientific corpora at scale. "
    + " ".join(
        f"Sentence {i} describes the dense retrieval encoder and its sharded index design."
        for i in range(80)
    )
    + "\nReferences\n[1] A. Author. Paper. 2020.\n"
)


@pytest.fixture(scope="module")
def pdf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pdfs")
    for i in range(3):
        pid = f"2402.{20000+i}"
        p = root / "cs.IR" / "2402" / f"{pid}.pdf"
        p.parent.mkdir(parents=True, exist_ok=True)
        # unique text per paper so repair's exact-dedup keeps all three
        text = TEXT.replace("Sentence", f"Paper{i} sentence")
        p.write_bytes(simple_text_pdf([text[:1200], text[1200:]]))
    return root


def test_cli_full_chain(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "corpus"
    assert main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus),
                 "--workers", "0"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ok"] == 3

    assert main(["audit", "--corpus", str(corpus),
                 "--json-out", str(tmp_path / "audit.json")]) == 0
    out = capsys.readouterr().out
    assert "papers: 3" in out
    assert (tmp_path / "audit.json").exists()

    repaired = tmp_path / "repaired"
    assert main(["repair", "--corpus", str(corpus), "--out", str(repaired)]) == 0
    capsys.readouterr()

    payloads = tmp_path / "payloads.jsonl"
    assert main(["augment", "--corpus", str(repaired), "--out", str(payloads)]) == 0
    capsys.readouterr()
    assert len(payloads.read_text().splitlines()) == 3

    emb_dir = tmp_path / "emb"
    assert main(["embed", "--corpus", str(repaired), "--out", str(emb_dir),
                 "--random-init", "--batch-size", "8", "--min-quality", "0.0"]) == 0
    emb_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert emb_stats["embedded"] > 0
    assert (emb_dir / "index.json").exists()

    idx_dir = tmp_path / "index"
    assert main(["index", "--embeddings", str(emb_dir), "--corpus", str(repaired),
                 "--out", str(idx_dir), "--dtype", "float32"]) == 0
    idx_stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert idx_stats["rows"] == emb_stats["embedded"]
    assert idx_stats["categories"] == ["cs.IR"]

    assert main(["search", "--index", str(idx_dir), "--corpus", str(repaired),
                 "--query", "dense retrieval encoder", "--k", "3",
                 "--random-init", "--categories", "cs.IR"]) == 0
    out = capsys.readouterr().out
    assert "query[0]" in out
    assert "row=" in out


def test_cli_dedup_and_download_parsing(tmp_path, capsys):
    # dedup dry-run over duplicated layout
    root = tmp_path / "pdfs"
    for cat in ("cs.AI", "cs.LG"):
        p = root / cat / "2402" / "2402.1.pdf"
        p.parent.mkdir(parents=True)
        p.write_bytes(b"%PDF-1.4 x")
    assert main(["dedup", str(root)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["duplicate_papers"] == 1 and rep["dry_run"] is True
    assert (root / "cs.LG" / "2402" / "2402.1.pdf").exists()


def test_cli_extract_standalone(pdf_root, tmp_path, capsys):
    out = tmp_path / "extracted"
    assert main(["extract", "--pdfs", str(pdf_root), "--out", str(out),
                 "--improve", "--report", str(tmp_path / "rep.json")]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ok"] == 3 and stats["failed"] == 0
    jsons = list(out.rglob("*.json"))
    assert len(jsons) == 3
    rec = json.loads(jsons[0].read_text())
    assert rec["quality_score"] > 0.2 and rec["pages"]
    assert (tmp_path / "rep.json").exists()


def test_cli_search_hybrid_and_rerank(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c2"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e2"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx = tmp_path / "i2"
    main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
          "--out", str(idx), "--dtype", "float32"])
    capsys.readouterr()
    assert main(["search", "--index", str(idx), "--corpus", str(corpus),
                 "--query", "retrieval encoder", "--k", "3", "--random-init",
                 "--hybrid-alpha", "0.7", "--rerank-random-init"]) == 0
    out = capsys.readouterr().out
    assert "query[0]" in out and "row=" in out
    # round 5: --rerank-cascade flows through _build_engine into
    # RetrievalConfig and the cascade path serves the same shape
    assert main(["search", "--index", str(idx), "--corpus", str(corpus),
                 "--query", "retrieval encoder", "--k", "3", "--random-init",
                 "--hybrid-alpha", "0.7", "--rerank-random-init",
                 "--rerank-cascade", "5"]) == 0
    out = capsys.readouterr().out
    assert "query[0]" in out and "row=" in out


def test_cli_index_ivf_and_search_nprobe(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c_ivf"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e_ivf"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx = tmp_path / "i_ivf"
    capsys.readouterr()
    assert main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
                 "--out", str(idx), "--dtype", "float32",
                 "--ivf-clusters", "3", "--ivf-block-rows", "128"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["ivf_clusters"] == 3
    assert (idx / "ivf" / "meta.json").exists()
    assert main(["search", "--index", str(idx), "--corpus", str(corpus),
                 "--query", "retrieval encoder", "--k", "3", "--random-init",
                 "--nprobe", "3"]) == 0
    out = capsys.readouterr().out
    assert "query[0]" in out and "row=" in out


def test_cli_serve_http_roundtrip(pdf_root, tmp_path):
    import urllib.request

    corpus = tmp_path / "c3"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e3"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx_dir = tmp_path / "i3"
    main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
          "--out", str(idx_dir), "--dtype", "float32"])

    import jax, jax.numpy as jnp
    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.index.store import DenseIndex
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.search.engine import SearchEngine
    from arxiv_rag_tpu.serve import serve_in_thread
    from arxiv_rag_tpu.store.corpus import CorpusReader
    from arxiv_rag_tpu.tokenize.wordpiece import WordPieceTokenizer

    mcfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), mcfg, dtype=jnp.bfloat16)
    engine = SearchEngine(
        DenseIndex.load(idx_dir),
        embedder=Embedder(params, mcfg, WordPieceTokenizer.toy()),
        corpus=CorpusReader(corpus),
        use_pallas=False,
    )
    httpd, _thread = serve_in_thread(engine, port=0,
                                     index_stats={"rows": engine.index.num_rows})
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"

    with urllib.request.urlopen(f"{base}/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["rows"] > 0

    req = urllib.request.Request(
        f"{base}/search",
        data=json.dumps({"queries": ["dense retrieval"], "k": 3}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert len(body["results"]) == 1
    assert len(body["results"][0]) == 3
    assert body["results"][0][0]["chunk_id"]

    # bad request -> 400
    bad = urllib.request.Request(f"{base}/search", data=b'{"queries": "nope"}')
    try:
        urllib.request.urlopen(bad)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    httpd.shutdown()


def test_cli_train_smoke(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c4"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    capsys.readouterr()
    out_ckpt = tmp_path / "ckpt"
    assert main(["train", "--corpus", str(corpus), "--out", str(out_ckpt),
                 "--steps", "6", "--batch-size", "4", "--seq-len", "32",
                 "--lr", "3e-4", "--small-model"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pairs"] >= 4
    assert (out_ckpt / "params.msgpack").exists()
    assert (out_ckpt / "model_config.json").exists()
    # fine-tuned checkpoint loads back
    from arxiv_rag_tpu.models.convert import load_checkpoint

    params, cfg = load_checkpoint(out_ckpt)
    assert cfg.hidden_size == 64


def test_cli_status(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c5"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    capsys.readouterr()
    assert main(["status", "--corpus", str(corpus)]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["chunk_stage"].get("done") == 3
    assert st["corpus"]["num_rows"] > 0
    assert st["papers"] == 3


def test_cli_audit_extractions(pdf_root, tmp_path, capsys):
    out = tmp_path / "ex"
    main(["extract", "--pdfs", str(pdf_root), "--out", str(out)])
    capsys.readouterr()
    assert main(["audit", "--extractions", str(out)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["documents"] == 3
    assert rep["by_method"]
    assert rep["quality"]["count"] == 3


def test_cli_train_resume(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c6"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    capsys.readouterr()
    out_ckpt = tmp_path / "ck6"
    args = ["train", "--corpus", str(corpus), "--out", str(out_ckpt),
            "--steps", "4", "--batch-size", "4", "--seq-len", "24",
            "--small-model", "--checkpoint-every", "2"]
    assert main(args) == 0
    capsys.readouterr()
    assert (out_ckpt / "state" / "step_00000004").exists()
    assert main(args + ["--resume"]) == 0
    # resumed run continues from step 4 -> ends at step 8
    assert (out_ckpt / "state" / "step_00000008").exists()


def test_cli_search_sharded(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c7"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e7"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx = tmp_path / "i7"
    main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
          "--out", str(idx), "--dtype", "float32", "--device-build"])
    capsys.readouterr()
    assert main(["search", "--index", str(idx), "--corpus", str(corpus),
                 "--query", "retrieval", "--k", "3", "--random-init",
                 "--shard"]) == 0
    out = capsys.readouterr().out
    assert "row=" in out


def test_cli_eval_retrieval_quality(pdf_root, tmp_path, capsys):
    corpus = tmp_path / "c8"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e8"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx = tmp_path / "i8"
    main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
          "--out", str(idx), "--dtype", "float32"])
    capsys.readouterr()
    assert main(["eval", "--index", str(idx), "--corpus", str(corpus),
                 "--k", "5", "--random-init"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["queries"] == 3
    assert 0.0 <= rep["recall_at_k"] <= 1.0
    assert 0.0 <= rep["mrr_at_k"] <= 1.0


def test_cli_serve_hybrid_rerank_engine(pdf_root, tmp_path):
    """The serve verb accepts the flagship retrieval config (hybrid +
    rerank, reference config.yaml:62-69): engine built from serve args
    answers an HTTP query through the micro-batcher."""
    import urllib.request
    from types import SimpleNamespace

    corpus = tmp_path / "c4"
    main(["chunk", "--pdfs", str(pdf_root), "--corpus", str(corpus), "--workers", "0"])
    emb = tmp_path / "e4"
    main(["embed", "--corpus", str(corpus), "--out", str(emb),
          "--random-init", "--batch-size", "8", "--min-quality", "0.0"])
    idx_dir = tmp_path / "i4"
    main(["index", "--embeddings", str(emb), "--corpus", str(corpus),
          "--out", str(idx_dir), "--dtype", "float32"])

    from arxiv_rag_tpu.cli.main import _build_engine
    from arxiv_rag_tpu.serve import serve_in_thread

    args = SimpleNamespace(
        index=str(idx_dir), corpus=str(corpus), checkpoint=None, vocab=None,
        random_init=True, shard=False, hybrid_alpha=0.7,
        rerank_checkpoint=None, rerank_random_init=True,
    )
    engine = _build_engine(args)
    assert engine.bm25 is not None and engine.reranker is not None
    httpd, _thread = serve_in_thread(engine, port=0, index_stats={})
    host, port = httpd.server_address[:2]
    req = urllib.request.Request(
        f"http://{host}:{port}/search",
        data=json.dumps({"queries": ["retrieval evaluation"], "k": 3,
                         "hybrid_alpha": 0.7}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    hits = out["results"][0]
    assert hits and all("score" in h for h in hits)
    # reranked hits carry the dense score in extras -> surfaced as field
    assert any("dense_score" in h for h in hits)
    httpd.batcher.close()
    httpd.server_close()
