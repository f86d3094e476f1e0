"""End-to-end CPU pipeline: synthetic PDFs → extract → chunk → corpus."""

import json

from pdfgen import simple_text_pdf
from arxiv_rag_tpu.config import load_config
from arxiv_rag_tpu.pipeline.runner import PipelineRunner, process_paper
from arxiv_rag_tpu.store.corpus import CorpusReader

PAPER_TEXT = (
    "Retrieval Augmented Systems At Scale\n"
    "Alice Zhang\n"
    "alice@lab.org\n"
    "Abstract\n"
    "We study large scale retrieval for scientific documents [1]. "
    "Our approach embeds chunks of papers and searches them with a "
    "fused kernel on accelerators. The results show strong recall.\n"
    "1 Introduction\n"
    + " ".join(
        f"Sentence {i} explains why dense retrieval over scientific text benefits from scale and careful chunking."
        for i in range(60)
    )
    + "\n2 Method\n"
    + " ".join(
        f"Sentence {i} details the encoder architecture and the sharded index layout across accelerator memory."
        for i in range(60)
    )
    + "\nReferences\n"
    "[1] A. Author. Dense passage retrieval. arXiv:2004.04906, 2020.\n"
)


def make_corpus(tmp_path, n_papers=3):
    pdf_dir = tmp_path / "pdfs"
    papers = []
    for i in range(n_papers):
        pid = f"2401.{10000 + i}"
        p = pdf_dir / "cs.LG" / "2401" / f"{pid}.pdf"
        p.parent.mkdir(parents=True, exist_ok=True)
        # two pages per paper
        half = len(PAPER_TEXT) // 2
        p.write_bytes(simple_text_pdf([PAPER_TEXT[:half], PAPER_TEXT[half:]]))
        papers.append((pid, str(p), "cs.LG"))
    return papers


def base_cfg(tmp_path):
    return load_config(overrides={"paths.root": str(tmp_path / "data")})


def test_process_paper_full_stack(tmp_path):
    cfg = base_cfg(tmp_path)
    papers = make_corpus(tmp_path, 1)
    pid, path, cat = papers[0]
    res = process_paper(cfg, pid, path, cat)
    assert res.ok, res.error
    assert res.num_chunks >= 2
    assert res.paper_meta["title"].startswith("Retrieval Augmented Systems")
    assert res.paper_meta["num_sections"] >= 3
    secs = {r.section for r in res.records}
    assert "introduction" in secs or "method" in secs
    assert all(r.page in (1, 2) for r in res.records)
    assert all(len(r.text) <= 2000 for r in res.records)


def test_runner_batch_resume_and_store(tmp_path):
    cfg = base_cfg(tmp_path)
    papers = make_corpus(tmp_path, 3)
    runner = PipelineRunner(cfg, corpus_dir=tmp_path / "corpus")
    stats = runner.run(papers, max_workers=0)
    assert stats["ok"] == 3 and stats["failed"] == 0
    assert stats["chunks"] >= 6

    # corpus store readable, metadata ledger written
    reader = CorpusReader(tmp_path / "corpus")
    assert reader.num_rows == stats["chunks"]
    assert reader.categories.get("cs.LG") == stats["chunks"]
    meta_lines = (tmp_path / "corpus" / "papers.jsonl").read_text().splitlines()
    assert len(meta_lines) == 3
    assert json.loads(meta_lines[0])["title"]

    # resume: all skipped on second run
    stats2 = runner.run(papers, max_workers=0)
    assert stats2["skipped"] == 3 and stats2["ok"] == 0
    runner.close()


def test_runner_records_failures(tmp_path):
    cfg = base_cfg(tmp_path)
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"not a pdf")
    runner = PipelineRunner(cfg, corpus_dir=tmp_path / "corpus")
    stats = runner.run([("2401.99999", str(bad), "cs.AI")], max_workers=0)
    assert stats["failed"] == 1
    assert runner.get_stats().get("failed") == 1
    runner.close()
