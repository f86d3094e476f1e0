"""Zero-downtime index reload: `arag index --append` grows the on-disk
index; POST /admin/reload (or SearchEngine.prepare_reload directly)
swaps the grown index into a LIVE server — load+upload on the handler
thread while the old index keeps serving, ref swap on the micro-batcher
dispatch thread behind a completion barrier. The reference's growth
story is ChromaDB collection.add with no serving layer at all
(4-embed/generation/generate_embeddings_parallel.py:323-468)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.embed import Embedder
from arxiv_rag_tpu.index import build_index
from arxiv_rag_tpu.index.store import DenseIndex, append_index
from arxiv_rag_tpu.models import ModelConfig, init_params
from arxiv_rag_tpu.search import SearchEngine
from arxiv_rag_tpu.search.engine import bm25_for_index
from arxiv_rag_tpu.serve import serve_in_thread
from arxiv_rag_tpu.store import ChunkRecord, CorpusReader, CorpusWriter
from arxiv_rag_tpu.tokenize import WordPieceTokenizer

WORDS = ["neural", "network", "training", "graph", "database", "query",
         "quantum", "physics", "protein", "folding", "image", "vision"]
VOCAB = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"] + WORDS + ["zebrafish"]
CFG = ModelConfig(vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64)


def _texts(n, seed):
    rng = np.random.default_rng(seed)
    return [" ".join(rng.choice(WORDS, size=10)) for _ in range(n)]


def _post(port, path, body, headers=None) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def stack(tmp_path):
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(VOCAB) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(vp)
    emb = Embedder(init_params(jax.random.PRNGKey(2), CFG), CFG, tok,
                   buckets=(32,), batch_size=16, compute_dtype=jnp.float32)
    texts = _texts(24, seed=0)
    cdir, idir = tmp_path / "corpus", tmp_path / "index"
    with CorpusWriter(cdir) as w:
        for i, t in enumerate(texts):
            w.add(ChunkRecord(paper_id=f"p{i:03d}", text=t, category="cs.LG",
                              section="body", page=1, quality=1.0))
    vectors = emb.encode_texts(texts)
    build_index(vectors, categories=["cs.LG"] * len(texts)).save(idir)
    return tmp_path, tok, emb, texts, cdir, idir


def _grow(emb, texts, cdir, idir, n_new=8):
    """Append chunks to the corpus AND rows to the on-disk index — the
    `arag chunk` + `arag embed` + `arag index --append` lifecycle. The
    last new chunk contains a token no old chunk has."""
    new_texts = _texts(n_new - 1, seed=99) + ["zebrafish " * 8]
    with CorpusWriter(cdir) as w:  # reopened writer appends
        for j, t in enumerate(new_texts):
            w.add(ChunkRecord(paper_id=f"n{j:03d}", text=t, category="cs.CV",
                              section="body", page=2, quality=1.0))
    if idir is not None:
        append_index(idir, emb.encode_texts(new_texts),
                     categories=["cs.CV"] * n_new)
    return new_texts


def test_engine_prepare_reload_swap(stack):
    tmp_path, tok, emb, texts, cdir, idir = stack
    corpus = CorpusReader(cdir)
    eng = SearchEngine(DenseIndex.load(idir), embedder=emb, corpus=corpus)
    assert eng.search([texts[3]], k=3)[0][0].row == 3
    new_texts = _grow(emb, texts, cdir, idir)
    swap = eng.prepare_reload(idir)
    # live engine untouched until swap
    assert eng.index.num_rows == len(texts)
    info = swap()
    assert info["rows"] == len(texts) + len(new_texts)
    hit = eng.search([new_texts[-1]], k=3)[0][0]
    assert hit.row == len(texts) + len(new_texts) - 1
    assert "zebrafish" in hit.text and hit.paper_id == "n007"
    # old rows still retrieve, and the new category is filterable
    assert eng.search([texts[3]], k=3)[0][0].row == 3
    cv = eng.search([new_texts[-1]], k=3, categories=["cs.CV"])[0]
    assert all(h.category == "cs.CV" for h in cv)


def test_engine_reload_hybrid_rebuilds_bm25(stack):
    tmp_path, tok, emb, texts, cdir, idir = stack
    corpus = CorpusReader(cdir)
    idx = DenseIndex.load(idir)
    eng = SearchEngine(idx, embedder=emb, corpus=corpus,
                       bm25=bm25_for_index(idx, corpus))
    new_texts = _grow(emb, texts, cdir, idir)
    info = eng.prepare_reload(idir)()
    assert info["bm25_rebuilt"] is True
    assert eng.bm25.num_docs == eng.index.num_rows
    # the keyword side must know the appended vocabulary: "zebrafish"
    # appears only in the last appended chunk
    hits = eng.search(["zebrafish"], k=3, hybrid_alpha=0.3)[0]
    assert hits[0].paper_id == "n007"


def test_engine_reload_with_ivf_delta(stack):
    """Reload picks up the refreshed IVF delta (`IVFIndex.extend` after
    append) and the engine keeps routing nprobe searches through it."""
    from arxiv_rag_tpu.config import RetrievalConfig
    from arxiv_rag_tpu.index.ivf import IVFIndex

    tmp_path, tok, emb, texts, cdir, idir = stack
    idx = DenseIndex.load(idir)
    IVFIndex.build(idx, 4, block_rows=128, iters=4, seed=0).save(idir)
    eng = SearchEngine(idx, embedder=emb, corpus=CorpusReader(cdir),
                       ivf=IVFIndex.load(idir, idx),
                       cfg=RetrievalConfig(nprobe=4))
    assert eng.search([texts[3]], k=3)[0][0].row == 3
    new_texts = _grow(emb, texts, cdir, idir)
    IVFIndex.extend(idir, DenseIndex.load(idir))  # refresh the delta
    info = eng.prepare_reload(idir)()
    assert info["ivf"] is True
    assert eng.ivf.n_valid == len(texts) + len(new_texts)
    hit = eng.search([new_texts[-1]], k=3)[0][0]  # via the IVF route
    assert hit.paper_id == "n007" and "zebrafish" in hit.text


def test_engine_reload_mesh_sharded(stack):
    """Reload re-shards the grown index over the SAME mesh; the sharded
    route serves the appended rows."""
    from arxiv_rag_tpu.parallel import data_mesh

    tmp_path, tok, emb, texts, cdir, idir = stack
    mesh = data_mesh(4)
    idx = DenseIndex.load(idir)
    idx.to_device(mesh=mesh)
    eng = SearchEngine(idx, embedder=emb, corpus=CorpusReader(cdir))
    assert eng.search([texts[3]], k=3)[0][0].row == 3
    new_texts = _grow(emb, texts, cdir, idir)
    eng.prepare_reload(idir)()
    assert eng.index._mesh is mesh
    hit = eng.search([new_texts[-1]], k=3)[0][0]
    assert hit.paper_id == "n007"
    assert eng.search([texts[3]], k=3)[0][0].row == 3


def test_engine_reload_with_chunk_ids_subset(stack):
    """Quality-filtered lifecycle: the index covers a SUBSET of corpus
    rows, joined through chunk_ids. After append + reload, hydration
    must keep mapping index rows to the right corpus rows."""
    tmp_path, tok, emb, texts, cdir, idir = stack
    keep = [i for i in range(len(texts)) if i % 3 != 0]  # drop every 3rd
    sdir = tmp_path / "subset_index"
    build_index(emb.encode_texts([texts[i] for i in keep]),
                categories=["cs.LG"] * len(keep),
                chunk_ids=[f"p{i:03d}#0" for i in keep]).save(sdir)
    eng = SearchEngine(DenseIndex.load(sdir), embedder=emb,
                       corpus=CorpusReader(cdir))
    hit = eng.search([texts[keep[4]]], k=3)[0][0]
    assert hit.text == texts[keep[4]] and hit.paper_id == f"p{keep[4]:03d}"
    # grow the corpus AND the subset index (new rows all kept)
    new_texts = _grow(emb, texts, cdir, idir=None, n_new=6)
    append_index(sdir, emb.encode_texts(new_texts),
                 categories=["cs.CV"] * len(new_texts),
                 chunk_ids=[f"n{j:03d}#0" for j in range(len(new_texts))])
    info = eng.prepare_reload(sdir)()
    assert info["rows"] == len(keep) + len(new_texts)
    hit = eng.search([new_texts[-1]], k=3)[0][0]
    assert hit.paper_id == "n005" and "zebrafish" in hit.text
    # old subset rows still hydrate through the chunk_id join
    hit = eng.search([texts[keep[4]]], k=3)[0][0]
    assert hit.text == texts[keep[4]]


def test_engine_reload_dim_mismatch_rejected(stack, tmp_path):
    _, tok, emb, texts, cdir, idir = stack
    bad = tmp_path / "bad_index"
    build_index(np.ones((4, 16), np.float32)).save(bad)
    eng = SearchEngine(DenseIndex.load(idir), embedder=emb,
                       corpus=CorpusReader(cdir))
    with pytest.raises(ValueError, match="dim"):
        eng.prepare_reload(bad)
    assert eng.search([texts[3]], k=3)[0][0].row == 3  # untouched


def test_http_reload_under_traffic(stack):
    tmp_path, tok, emb, texts, cdir, idir = stack
    eng = SearchEngine(DenseIndex.load(idir), embedder=emb,
                       corpus=CorpusReader(cdir))
    httpd, _ = serve_in_thread(
        eng, index_stats={"rows": eng.index.num_rows, "dim": eng.index.dim},
        batch_window_ms=2.0,
        reload_paths={"index": str(idir), "corpus": str(cdir)})
    port = httpd.server_address[1]
    try:
        st, out = _post(port, "/search", {"queries": [texts[3]], "k": 3})
        assert st == 200 and out["results"][0][0]["row"] == 3

        new_texts = _grow(emb, texts, cdir, idir)
        stop = threading.Event()
        errors: list = []

        def hammer():
            while not stop.is_set():
                s, o = _post(port, "/search", {"queries": [texts[3]], "k": 3})
                if s != 200 or o["results"][0][0]["row"] != 3:
                    errors.append((s, o))
                    return

        clients = [threading.Thread(target=hammer) for _ in range(4)]
        for c in clients:
            c.start()
        st, out = _post(port, "/admin/reload", {})  # default paths
        stop.set()
        for c in clients:
            c.join(timeout=30)
        assert st == 200 and out["status"] == "reloaded", out
        assert out["rows"] == len(texts) + len(new_texts)
        assert not errors, errors[:2]
        # the appended row serves immediately, hydrated from the grown corpus
        st, out = _post(port, "/search", {"queries": [new_texts[-1]], "k": 3})
        assert st == 200
        hit = out["results"][0][0]
        assert hit["paper_id"] == "n007" and "zebrafish" in hit["text"]
        # healthz reflects the new size
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["rows"] == len(texts) + len(new_texts)
    finally:
        httpd.batcher.close()
        httpd.shutdown()


def test_http_reload_bad_dir_keeps_serving(stack):
    tmp_path, tok, emb, texts, cdir, idir = stack
    eng = SearchEngine(DenseIndex.load(idir), embedder=emb,
                       corpus=CorpusReader(cdir))
    httpd, _ = serve_in_thread(eng, batch_window_ms=2.0)
    port = httpd.server_address[1]
    try:
        st, out = _post(port, "/admin/reload", {})
        assert st == 400 and "index_dir" in out["error"]
        # path overrides without a token are refused (any client who can
        # reach the port must not be able to swap the live index)
        st, out = _post(port, "/admin/reload",
                        {"index_dir": str(tmp_path / "nope")})
        assert st == 403 and "admin-token" in out["error"]
        st, out = _post(port, "/search", {"queries": [texts[3]], "k": 3})
        assert st == 200 and out["results"][0][0]["row"] == 3
    finally:
        httpd.batcher.close()
        httpd.shutdown()


def test_http_reload_admin_token(stack):
    tmp_path, tok, emb, texts, cdir, idir = stack
    eng = SearchEngine(DenseIndex.load(idir), embedder=emb,
                       corpus=CorpusReader(cdir))
    httpd, _ = serve_in_thread(eng, batch_window_ms=2.0,
                               admin_token="s3cret")
    port = httpd.server_address[1]
    try:
        # token configured: EVERY reload needs the header
        st, out = _post(port, "/admin/reload", {"index_dir": str(idir)})
        assert st == 403 and "X-Admin-Token" in out["error"]
        new_texts = _grow(emb, texts, cdir, idir)
        st, out = _post(port, "/admin/reload",
                        {"index_dir": str(idir), "corpus_dir": str(cdir)},
                        headers={"X-Admin-Token": "s3cret"})
        assert st == 200 and out["rows"] == len(texts) + len(new_texts), out
        # bad path WITH the token: clean client error, serving intact
        st, out = _post(port, "/admin/reload",
                        {"index_dir": str(tmp_path / "nope")},
                        headers={"X-Admin-Token": "s3cret"})
        assert st in (400, 500)
        st, out = _post(port, "/search", {"queries": [new_texts[-1]], "k": 3})
        assert st == 200 and out["results"][0][0]["paper_id"] == "n007"
    finally:
        httpd.batcher.close()
        httpd.shutdown()
