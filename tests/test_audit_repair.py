"""Audit + repair + augment over a synthetic corpus store."""

import json

from arxiv_rag_tpu.audit import audit_corpus, format_report
from arxiv_rag_tpu.pipeline.augment import (
    build_light_payload,
    flesch_reading_ease,
    passes_filters,
)
from arxiv_rag_tpu.pipeline.repair import repair_corpus
from arxiv_rag_tpu.store.corpus import ChunkRecord, CorpusReader, CorpusWriter

GOOD = (
    "We present a simple method for learning dense representations. "
    "The model improves recall on every benchmark we evaluated. "
) * 8  # ~900 chars


def build_store(tmp_path):
    d = tmp_path / "corpus"
    with CorpusWriter(d) as w:
        for i in range(10):
            w.add(ChunkRecord(
                paper_id=f"2401.{10000+i//2}", text=GOOD, category="cs.LG",
                section="introduction", page=1, chunk_index=i % 2, quality=0.95,
                token_count=len(GOOD)//4,
            ))
        # problem chunks
        w.add(ChunkRecord(paper_id="2401.20000", text="tiny", chunk_index=0, quality=0.95))
        w.add(ChunkRecord(paper_id="2401.20001", text=GOOD, chunk_index=0, quality=0.3))
        w.add(ChunkRecord(paper_id="2401.20002", text="<div>html " + GOOD + "</div>",
                          chunk_index=0, quality=0.92, category="cs.CV"))
        w.add(ChunkRecord(paper_id="2401.20003", text=GOOD * 5, chunk_index=0, quality=0.92))
        w.add(ChunkRecord(paper_id="2401.20004", text=GOOD, chunk_index=0, quality=0.92))  # dup of GOOD
    (d / "papers.jsonl").write_text(json.dumps(
        {"paper_id": "2401.10000", "title": "A Paper Title"}) + "\n")
    return d


def test_audit_census(tmp_path):
    d = build_store(tmp_path)
    rep = audit_corpus(d)
    assert rep.num_chunks == 15
    assert rep.num_papers == 10
    assert rep.duplicates >= 9  # GOOD repeated many times
    assert rep.gates["below_keep_quality"] == 1
    assert rep.categories["cs.LG"] == 10
    assert rep.recommendations
    txt = format_report(rep)
    assert "papers: 10" in txt and "recommendations:" in txt


def test_repair_contract(tmp_path):
    d = build_store(tmp_path)
    out = tmp_path / "repaired"
    stats = repair_corpus(d, out, min_chars=50, max_chars=2000, min_quality=0.7)
    assert stats.dropped_short == 1
    assert stats.dropped_quality == 1
    assert stats.split >= 1  # GOOD*5 > 2000 chars
    assert stats.dropped_duplicate >= 9
    assert stats.html_stripped >= 1
    reader = CorpusReader(out)
    for batch in reader.iter_batches():
        for row in batch.to_pylist():
            assert len(row["text"]) <= 2100  # max_chars + header slack
    # context header present for the paper with a known title
    texts = reader.texts()
    assert any(t.startswith("# A Paper Title") for t in texts)


def test_repair_dry_run(tmp_path):
    d = build_store(tmp_path)
    out = tmp_path / "never"
    stats = repair_corpus(d, out, dry_run=True)
    assert stats.read == 15
    assert not out.exists()


def test_augment_payload():
    text = (
        "Abstract\n"
        "We propose a retrieval method for scientific search engines. "
        "It ranks documents with a learned relevance model and an index.\n"
        "1 Introduction\n"
        "Search and ranking matter [1]. Figure 1 shows the architecture. "
        "As shown in [2, 3], retrieval quality depends on the query encoder. "
        "Contact: author@lab.edu\n"
        "References\n"
        "[1] A. Author. Title. 2020.\n"
    )
    p = build_light_payload("2401.1", text, title="Retrieval Methods",
                            abstract="We propose a retrieval method for scientific search.")
    assert p.title == "Retrieval Methods"
    assert "retrieval" in p.keywords
    assert "retrieval" in p.domains
    assert p.summary.startswith("We propose")
    assert any(f["label"] == "1" for f in p.figures)
    assert "author@lab.edu" in p.emails
    assert any(s["name"] == "introduction" for s in p.section_index)
    assert len(p.citation_map) >= 2
    assert p.readability != 0.0
    assert passes_filters(p, min_citations=2)
    assert not passes_filters(p, min_citations=100)


def test_flesch_sanity():
    simple = "The cat sat. The dog ran. We like it. It is good. " * 5
    dense = ("Multidimensional heterogeneous representations necessitate "
             "disambiguation methodologies incorporating regularization. ") * 5
    assert flesch_reading_ease(simple) > flesch_reading_ease(dense)


def test_audit_per_model_token_bands(tmp_path):
    """Per-embedding-model band profiles (reference
    analyze_for_embeddings.py:91-96): the same corpus lands in
    different bands under different model profiles, and the report
    carries a cross-model summary."""
    import pytest

    d = build_store(tmp_path)
    rep = audit_corpus(d)  # default mpnet profile
    assert set(rep.token_bands_by_model) >= {"mpnet", "openai", "cohere", "minilm"}
    # GOOD*5 is ~1125 est. tokens: over mpnet's 512 hard limit but fine
    # under openai's 8192 window
    assert rep.token_bands_by_model["mpnet"]["over_limit"] >= 1
    assert rep.token_bands_by_model["openai"].get("over_limit", 0) == 0
    # the default headline bands must equal the selected model's profile
    assert rep.token_bands == rep.token_bands_by_model["mpnet"]
    rep_oa = audit_corpus(d, model="openai")
    assert rep_oa.token_bands == rep_oa.token_bands_by_model["openai"]
    with pytest.raises(ValueError):
        audit_corpus(d, model="nonexistent-model")
