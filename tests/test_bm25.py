"""BM25: native(C++)/Python builder parity, scratch-scored topk, and
scale behavior (round-2 weak #5: the pure-Python build was ~360M dict
ops at the 2M-chunk target and scores() allocated a dense vector per
query)."""

import numpy as np
import pytest

from arxiv_rag_tpu.search import bm25_native
from arxiv_rag_tpu.search.bm25 import BM25Index, bm25_tokenize

TEXTS = [
    "The Cat sat on the mat 42 times",
    "dogs chase CATS and cats2 chase mice",
    "quantum computing with qubits: 99.9% fidelity",
    "café résumé ﬁne-tuning",  # unicode separators
    "",  # empty doc
    "repeated repeated repeated words words",
    "mixed 0x1F hex and under_score and dash-join",
]

QUERIES = ["cat", "cats chase", "quantum fidelity 99", "caf ne",
           "repeated words", "zzz never seen", "repeated repeated"]


def test_native_python_parity():
    if not bm25_native.is_available():
        pytest.skip("native toolchain unavailable")
    a = BM25Index.build(TEXTS, native=False)
    b = BM25Index.build(TEXTS, native=True)
    np.testing.assert_allclose(a.doc_lens, b.doc_lens)
    assert set(a.vocab) == set(b.vocab)
    for q in QUERIES:
        np.testing.assert_allclose(a.scores(q), b.scores(q), rtol=1e-6)
        va, ra = a.topk(q, 3)
        vb, rb = b.topk(q, 3)
        np.testing.assert_allclose(va, vb, rtol=1e-6)
        np.testing.assert_array_equal(ra, rb)


def test_topk_returns_only_matched_docs():
    idx = BM25Index.build(TEXTS, native=False)
    v, r = idx.topk("zzz never seen nowhere", 5)
    # "never"/"seen" don't occur either -> nothing matched
    assert len(v) == 0 and len(r) == 0
    v, r = idx.topk("cat", 5)  # exactly one doc contains the token "cat"
    assert list(r) == [0]
    assert v[0] > 0
    # duplicate query terms weight the term twice (classic query-tf)
    v1, _ = idx.topk("repeated", 1)
    v2, _ = idx.topk("repeated repeated", 1)
    assert v2[0] == pytest.approx(2 * v1[0])


def test_scratch_reuse_is_clean_across_queries():
    idx = BM25Index.build(TEXTS, native=False)
    first = idx.topk("cats chase", 4)
    _ = idx.topk("quantum fidelity", 4)
    again = idx.topk("cats chase", 4)
    np.testing.assert_allclose(first[0], again[0])
    np.testing.assert_array_equal(first[1], again[1])
    # the dense scores() path still sees a zeroed world too
    s = idx.scores("cat")
    assert (s[np.setdiff1d(np.arange(len(TEXTS)), [0])] == 0).all()


def test_save_load_roundtrip_native_build(tmp_path):
    if not bm25_native.is_available():
        pytest.skip("native toolchain unavailable")
    idx = BM25Index.build(TEXTS, native=True)
    idx.save(tmp_path / "bm25")
    idx2 = BM25Index.load(tmp_path / "bm25")
    for q in QUERIES:
        v1, r1 = idx.topk(q, 4)
        v2, r2 = idx2.topk(q, 4)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_array_equal(r1, r2)


@pytest.mark.scale
def test_native_build_scales():
    """30k synthetic docs through the native builder: parity on sampled
    queries vs Python, and the build must be dramatically faster (the
    2M proof lives in tools/bm25_scale.py; this keeps CI honest)."""
    if not bm25_native.is_available():
        pytest.skip("native toolchain unavailable")
    import time

    rng = np.random.default_rng(0)
    vocab = [f"tok{i}" for i in range(3000)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(40, 120)))
        for _ in range(30_000)
    ]
    t0 = time.perf_counter()
    nat = BM25Index.build(texts, native=True)
    t_native = time.perf_counter() - t0
    assert nat.num_docs == 30_000
    queries = [" ".join(rng.choice(vocab, size=5)) for _ in range(5)]
    py = BM25Index.build(texts[:2000], native=False)
    nat_small = BM25Index.build(texts[:2000], native=True)
    for q in queries:
        va, ra = py.topk(q, 10)
        vb, rb = nat_small.topk(q, 10)
        np.testing.assert_allclose(va, vb, rtol=1e-5)
        np.testing.assert_array_equal(ra, rb)
    # query latency at 30k docs: scratch-scored topk, not dense scans
    t0 = time.perf_counter()
    for q in queries * 20:
        nat.topk(q, 10)
    per_q = (time.perf_counter() - t0) / 100
    assert per_q < 0.05, f"topk {per_q * 1e3:.1f} ms/query at 30k docs"
    assert t_native < 30, f"native build took {t_native:.1f}s for 30k docs"


def test_topk_batch_native_matches_python_loop():
    """The one-call native window scorer == the per-query Python topk
    (same scores, same ids; deterministic tie order by doc id)."""
    from arxiv_rag_tpu.search import bm25_native

    rng = __import__("numpy").random.default_rng(9)
    words = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(words, rng.integers(5, 40)))
        for _ in range(500)
    ]
    idx = BM25Index.build(texts, native=False)  # Python-built: CSR on demand
    queries = [
        " ".join(rng.choice(words, 4)) for _ in range(32)
    ] + ["zzz-oov only", ""]
    batch = idx.topk_batch(queries, k=10)
    assert len(batch) == len(queries)
    for q, (bs, bi) in zip(queries, batch):
        ps, pi = idx.topk(q, 10)
        assert len(bs) == len(ps)
        np.testing.assert_allclose(bs, ps, rtol=1e-6)
        # id sets match; exact order can differ only within float ties
        assert set(bi.tolist()) == set(pi.tolist()) or (
            np.allclose(sorted(bs), sorted(ps))
        )
    if bm25_native.is_available():
        # native-built index exercises the zero-copy CSR path
        idx2 = BM25Index.build(texts, native=True)
        b2 = idx2.topk_batch(queries, k=10)
        for (a_s, a_i), (c_s, c_i) in zip(batch, b2):
            np.testing.assert_allclose(a_s, c_s, rtol=1e-6)
