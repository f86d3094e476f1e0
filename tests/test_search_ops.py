"""Recall parity of XLA flat search (fp32/bf16/int8, masked) vs the
numpy exact-scan oracle — BASELINE configs[1] and [4] acceptance."""

import numpy as np
import pytest

import jax.numpy as jnp

from arxiv_rag_tpu.ops import (
    cosine_topk_numpy,
    flat_search,
    int8_search,
    masked_flat_search,
    quantize_int8,
)
from arxiv_rag_tpu.ops.topk import make_row_masks, recall_at_k

N, D, Q, K = 5000, 64, 32, 10
CATEGORIES = ["cs.LG", "cs.CV", "cs.AI", "cs.CL"]


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def data(rng=None):
    rng = np.random.default_rng(0)
    index = _normalize(rng.standard_normal((N, D), dtype=np.float32))
    queries = _normalize(rng.standard_normal((Q, D), dtype=np.float32))
    cats = rng.choice(CATEGORIES, size=N)
    return index, queries, cats


def test_fp32_exact_match(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = flat_search(jnp.asarray(index), jnp.asarray(queries), K)
    # XLA vs numpy fp32 matmuls differ by ~1ulp → near-ties may swap;
    # tie-tolerant recall is the acceptance gate (SURVEY §7 hard part 2)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0
    np.testing.assert_allclose(np.asarray(fv), ov, atol=1e-5)


def test_bf16_recall_parity(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = flat_search(jnp.asarray(index, jnp.bfloat16), jnp.asarray(queries), K)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=5e-3, candidate_scores=np.asarray(fv, np.float32))
    assert r >= 0.99, f"bf16 recall {r}"


def test_int8_recall_parity(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    values, scales = quantize_int8(index)
    # quantization roundtrip sanity
    deq = np.asarray(values, np.float32) * np.asarray(scales)[:, None]
    assert np.abs(deq - index).max() < 0.5 / 127 * 2
    fv, fi = int8_search(values, scales, jnp.asarray(queries), K)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-2, candidate_scores=np.asarray(fv, np.float32))
    assert r >= 0.97, f"int8 recall {r}"


def test_masked_search_exact_filter(data):
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES))
    want = "cs.CV"
    qmask = jnp.full((Q,), np.uint32(1 << CATEGORIES.index(want)), jnp.uint32)
    fv, fi = masked_flat_search(jnp.asarray(index), row_masks, qmask, jnp.asarray(queries), K)
    fi = np.asarray(fi)
    # every hit is in the requested category
    assert all(cats[i] == want for row in fi for i in row)
    # and matches the oracle restricted to that category (tie-tolerant)
    sub = np.where(cats == want)[0]
    ov, oi = cosine_topk_numpy(index[sub], queries, K)
    r = recall_at_k(fi, sub[oi], ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0


def test_masked_search_multi_category(data):
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES))
    bits = np.uint32((1 << 0) | (1 << 1))  # cs.LG | cs.CV
    qmask = jnp.full((Q,), bits, jnp.uint32)
    _, fi = masked_flat_search(jnp.asarray(index), row_masks, qmask, jnp.asarray(queries), K)
    assert all(cats[i] in ("cs.LG", "cs.CV") for row in np.asarray(fi) for i in row)


def test_mask_excluding_everything(data):
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES))
    qmask = jnp.zeros((Q,), jnp.uint32)
    fv, _ = masked_flat_search(jnp.asarray(index), row_masks, qmask, jnp.asarray(queries), K)
    assert np.all(np.isneginf(np.asarray(fv)))


def test_k_larger_than_matches(data):
    index, queries, cats = data
    # restrict to 3 rows, ask for 10
    row_masks = np.zeros(N, np.uint32)
    row_masks[:3] = 1
    qmask = jnp.full((Q,), np.uint32(1), jnp.uint32)
    fv, fi = masked_flat_search(jnp.asarray(index), jnp.asarray(row_masks), qmask, jnp.asarray(queries), K)
    fv = np.asarray(fv)
    assert np.isfinite(fv[:, :3]).all()
    assert np.isneginf(fv[:, 3:]).all()


def test_flat_search_k_exceeds_rows():
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.topk import flat_search

    rng = np.random.default_rng(0)
    idx = rng.standard_normal((6, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    vals, ids = flat_search(jnp.asarray(idx), jnp.asarray(q), k=10)
    assert vals.shape == (2, 10) and ids.shape == (2, 10)
    assert (np.asarray(ids)[:, 6:] == -1).all()
    assert np.isneginf(np.asarray(vals)[:, 6:]).all()
    assert (np.asarray(ids)[:, :6] >= 0).all()


def test_bm25_save_load_without_npz_suffix(tmp_path):
    from arxiv_rag_tpu.search.bm25 import BM25Index

    idx = BM25Index.build(["alpha beta gamma", "beta delta", "gamma epsilon"])
    p = tmp_path / "bm25.bin"
    idx.save(p)
    idx2 = BM25Index.load(p)  # same path accepted back
    v1, r1 = idx.topk("beta gamma", 2)
    v2, r2 = idx2.topk("beta gamma", 2)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_int8_search_padding_rows_excluded():
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.quant import int8_search, quantize_int8

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((20, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vals8, scales = quantize_int8(emb)
    # simulate device padding: 12 zero rows with zero scales
    vals8 = jnp.pad(vals8, ((0, 12), (0, 0)))
    scales = jnp.pad(scales, (0, 12))
    # query anti-correlated with everything -> all true scores negative
    q = -np.asarray(emb[:1])
    v, r = int8_search(vals8, scales, jnp.asarray(q), k=5)
    assert (np.asarray(r) < 20).all()  # no padding rows in results


def test_device_build_matches_host_build():
    import jax.numpy as jnp

    from arxiv_rag_tpu.index.store import build_index, build_index_device

    rng = np.random.default_rng(4)
    embs = rng.standard_normal((300, 32)).astype(np.float32) * 3.0
    cats = ["cs.LG" if i % 2 else "cs.AI" for i in range(300)]
    for dtype in ("float32", "bfloat16", "int8"):
        host = build_index(embs, categories=cats, dtype=dtype)
        dev = build_index_device(embs, categories=cats, dtype=dtype, batch_rows=128)
        assert dev.dtype == host.dtype and dev.num_rows == host.num_rows
        np.testing.assert_array_equal(dev.row_masks, host.row_masks)
        hv = np.asarray(jnp.asarray(host.values, jnp.float32))
        dv = np.asarray(jnp.asarray(dev.values, jnp.float32))
        atol = 2e-2 if dtype != "float32" else 2e-6
        np.testing.assert_allclose(dv, hv, atol=atol)
        if dtype == "int8":
            np.testing.assert_allclose(dev.scales, host.scales, rtol=1e-5)
