"""Fixed golden query set for retrieval-quality eval (VERDICT round-1
weak #6: the title->own-chunks eval previously rode on corpus-synthesis
randomness, so regressions could hide in the noise).

The corpus, queries and relevance sets below are FROZEN in this file;
the expected metrics live in tests/golden/eval_metrics.json. Regenerate
after a deliberate behavior change with ARAG_REGEN_GOLDEN=1 and commit
the diff — an unexplained metric change is a retrieval regression."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden" / "eval_metrics.json"

# 12 papers x 3 chunks; each paper has a distinctive topic bigram plus
# shared filler vocabulary so BM25/dense are challenged but deterministic
TOPICS = [
    "quantum entanglement", "protein folding", "graph sparsification",
    "cache coherence", "optical interconnect", "speech synthesis",
    "market equilibrium", "soil microbiome", "glacier dynamics",
    "query optimization", "neural rendering", "swarm robotics",
]
FILLER = ("we study the problem and present results with experiments "
          "showing strong performance on standard benchmarks")


def _corpus():
    papers = []
    for i, topic in enumerate(TOPICS):
        pid = f"p{i:02d}"
        title = f"Advances in {topic} for large systems"
        chunks = [
            f"{title}. {FILLER}.",
            f"Our method improves {topic} using a novel algorithm. {FILLER}.",
            f"Results on {topic.split()[0]} tasks are reported. {FILLER}.",
        ]
        papers.append((pid, title, chunks))
    return papers


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.index import build_index
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.search.engine import SearchEngine, bm25_for_index
    from arxiv_rag_tpu.store import ChunkRecord, CorpusReader, CorpusWriter
    from arxiv_rag_tpu.tokenize import WordPieceTokenizer

    d = tmp_path_factory.mktemp("evalgold")
    papers = _corpus()
    with CorpusWriter(d / "corpus") as w:
        for pid, _title, chunks in papers:
            for j, text in enumerate(chunks):
                w.add(ChunkRecord(paper_id=pid, text=text, category="cs.LG",
                                  section="body", page=j, quality=1.0))
    corpus = CorpusReader(d / "corpus")
    tok = WordPieceTokenizer.toy()
    cfg = ModelConfig(vocab_size=len(tok.vocab) + 2, hidden_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=96, max_position_embeddings=128,
                      pad_token_id=tok.pad_id)
    params = init_params(jax.random.PRNGKey(0), cfg)
    emb = Embedder(params, cfg, tok, buckets=(96,), batch_size=8,
                   compute_dtype=jnp.float32)
    texts = corpus.texts()
    index = build_index(emb.encode_texts(texts), dtype="float32")
    bm25 = bm25_for_index(index, corpus)
    eng = SearchEngine(index, embedder=emb, corpus=corpus, bm25=bm25,
                       use_pallas=False)
    titles = {pid: title for pid, title, _ in papers}
    return eng, corpus, titles


def test_eval_metrics_match_golden(engine):
    from arxiv_rag_tpu.evaluate import evaluate_engine, title_queries

    eng, corpus, titles = engine
    queries, relevant = title_queries(corpus, titles)
    assert len(queries) == len(TOPICS)

    got = {}
    for name, alpha in (("bm25", 0.0), ("hybrid", 0.7), ("dense", 1.0)):
        res = evaluate_engine(eng, queries, relevant, k=5, hybrid_alpha=alpha)
        got[name] = res.to_dict()

    if os.environ.get("ARAG_REGEN_GOLDEN") == "1" or not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True))
        if os.environ.get("ARAG_REGEN_GOLDEN") != "1":
            pytest.fail(f"golden {GOLDEN} was missing; wrote it — commit and rerun")

    want = json.loads(GOLDEN.read_text())
    assert got == want, (
        "retrieval eval metrics changed vs the committed golden — if the "
        "change is deliberate, regenerate with ARAG_REGEN_GOLDEN=1 and "
        f"commit the diff.\n got: {json.dumps(got, sort_keys=True)}\n"
        f"want: {json.dumps(want, sort_keys=True)}"
    )
    # sanity floor: the unique-topic BM25 protocol must be near-perfect
    assert want["bm25"]["recall_at_k"] >= 0.9
    assert want["hybrid"]["recall_at_k"] >= want["dense"]["recall_at_k"]
