"""Pallas fused matmul+top-k kernel vs the numpy oracle (interpret mode
on CPU; the same code compiles on TPU). BASELINE configs[3,4] acceptance:
recall parity at equal memory, masks and int8 fused into the scan."""

import numpy as np
import pytest

import jax.numpy as jnp

from arxiv_rag_tpu.ops import quantize_int8
from arxiv_rag_tpu.ops.pallas_topk import fused_topk, fused_topk_int8, fused_topk_masked
from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, make_row_masks, recall_at_k

N, D, Q, K = 3000, 128, 32, 10
BLOCK = 512
CATEGORIES = ["cs.LG", "cs.CV", "cs.AI"]


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    index = _normalize(rng.standard_normal((N, D), dtype=np.float32))
    queries = _normalize(rng.standard_normal((Q, D), dtype=np.float32))
    cats = rng.choice(CATEGORIES, size=N)
    return index, queries, cats


def test_fused_fp32_parity(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = fused_topk(jnp.asarray(index), jnp.asarray(queries), K, block_rows=BLOCK)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0
    np.testing.assert_allclose(np.asarray(fv), ov, atol=1e-5)


def test_fused_handles_ragged_tail(data):
    """N not a multiple of block_rows: padded rows must never surface."""
    index, queries, _ = data
    n = 2900  # 2900 = 5*512 + 340
    ov, oi = cosine_topk_numpy(index[:n], queries, K)
    fv, fi = fused_topk(jnp.asarray(index[:n]), jnp.asarray(queries), K, block_rows=BLOCK)
    assert np.asarray(fi).max() < n
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0


def test_fused_tie_breaking_matches_topk(data):
    """Duplicate rows ⇒ exact score ties across blocks; lowest global
    index must win, like lax.top_k."""
    _, queries, _ = data
    rng = np.random.default_rng(5)
    base = _normalize(rng.standard_normal((40, D), dtype=np.float32))
    index = np.tile(base, (40, 1))  # 1600 rows, every row duplicated 40×
    fv, fi = fused_topk(jnp.asarray(index), jnp.asarray(queries), K, block_rows=BLOCK)
    scores = queries @ index.T
    import jax.lax

    lv, li = jax.lax.top_k(jnp.asarray(scores), K)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(li))


def test_fused_bf16_recall(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = fused_topk(jnp.asarray(index, jnp.bfloat16), jnp.asarray(queries), K, block_rows=BLOCK)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=5e-3, candidate_scores=np.asarray(fv, np.float32))
    assert r >= 0.99


def test_fused_masked(data):
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES).astype(np.int32))
    want = "cs.CV"
    qmask = jnp.full((Q,), 1 << CATEGORIES.index(want), jnp.int32)
    fv, fi = fused_topk_masked(
        jnp.asarray(index), row_masks, qmask, jnp.asarray(queries), K, block_rows=BLOCK
    )
    fi = np.asarray(fi)
    assert all(cats[i] == want for row in fi for i in row)
    sub = np.where(cats == want)[0]
    ov, oi = cosine_topk_numpy(index[sub], queries, K)
    r = recall_at_k(fi, sub[oi], ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0


def test_fused_mask_excludes_all(data):
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES).astype(np.int32))
    qmask = jnp.zeros((Q,), jnp.int32)
    fv, fi = fused_topk_masked(
        jnp.asarray(index), row_masks, qmask, jnp.asarray(queries), K, block_rows=BLOCK
    )
    assert np.all(np.isneginf(np.asarray(fv)))
    assert np.all(np.asarray(fi) == -1)


def test_fused_int8_recall(data):
    index, queries, _ = data
    ov, oi = cosine_topk_numpy(index, queries, K)
    values, scales = quantize_int8(index)
    fv, fi = fused_topk_int8(values, scales, jnp.asarray(queries), K, block_rows=BLOCK)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=2e-2, candidate_scores=np.asarray(fv))
    assert r >= 0.95, f"int8 recall {r}"


def test_fused_per_query_masks_differ(data):
    """Each query can carry its own category filter."""
    index, queries, cats = data
    row_masks = jnp.asarray(make_row_masks(cats, CATEGORIES).astype(np.int32))
    qmask = np.array(
        [1 << (i % len(CATEGORIES)) for i in range(Q)], np.int32
    )
    _, fi = fused_topk_masked(
        jnp.asarray(index), row_masks, jnp.asarray(qmask), jnp.asarray(queries), K,
        block_rows=BLOCK,
    )
    fi = np.asarray(fi)
    for qi in range(Q):
        want = CATEGORIES[qi % len(CATEGORIES)]
        assert all(cats[i] == want for i in fi[qi])


def test_masked_fewer_than_k_eligible_pads_with_minus1():
    """<k eligible rows: padded slots must be (-inf, -1), not dupes."""
    rng = np.random.default_rng(5)
    n, d, k = 256, 32, 10
    index = rng.standard_normal((n, d)).astype(np.float32)
    index /= np.linalg.norm(index, axis=1, keepdims=True)
    q = index[:2] + 0.01
    row_masks = np.zeros(n, np.int32)
    row_masks[:3] = 1  # only 3 eligible rows
    qmask = np.ones(2, np.int32)
    vals, ids = fused_topk_masked(
        jnp.asarray(index), jnp.asarray(row_masks), jnp.asarray(qmask),
        jnp.asarray(q), k, interpret=True,
    )
    ids = np.asarray(ids)
    vals = np.asarray(vals)
    assert (ids[:, 3:] == -1).all()
    assert np.isneginf(vals[:, 3:]).all()
    assert len(set(ids[0, :3].tolist())) == 3  # no duplicates


def test_k_above_lanes_raises():
    rng = np.random.default_rng(0)
    index = jnp.asarray(rng.standard_normal((256, 32)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    with pytest.raises(ValueError, match="k=128"):
        fused_topk(index, q, 129, interpret=True)


def test_int8_masked_fused_matches_oracle():
    """Fused int8-storage + category-mask kernel == masked numpy oracle."""
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8_masked
    from arxiv_rag_tpu.ops.quant import quantize_int8
    from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, recall_at_k

    rng = np.random.default_rng(8)
    n, d, qn, k = 700, 64, 4, 10
    index = rng.standard_normal((n, d)).astype(np.float32)
    index /= np.linalg.norm(index, axis=1, keepdims=True)
    q = index[:qn] + 0.01 * rng.standard_normal((qn, d)).astype(np.float32)
    cats = rng.integers(0, 2, n)
    row_masks = (1 << cats).astype(np.int32)
    want = 0b10  # category 1
    vals8, scales = quantize_int8(jnp.asarray(index))
    v, ids = fused_topk_int8_masked(
        vals8, scales, jnp.asarray(row_masks),
        jnp.full((qn,), want, jnp.int32), jnp.asarray(q), k,
        block_rows=256, interpret=True,
    )
    eligible = (row_masks & want) != 0
    sub_ids = np.nonzero(eligible)[0]
    ov, oi_local = cosine_topk_numpy(index[eligible], q, k)
    oi = sub_ids[oi_local]
    rec = recall_at_k(np.asarray(ids), oi, ov, tie_tol=2e-2,
                      candidate_scores=np.asarray(v, np.float32))
    assert rec >= 0.95  # int8 quantization tolerance
    got = np.asarray(ids)
    assert ((row_masks[got] & want) != 0)[got >= 0].all()


def test_fused_multi_tile_large_q(data):
    """Q > 64 runs the 2-D grid (query tiles inner, index resident per
    row block) — the round-1 kernel shrank block_rows at large Q and
    lost to XLA; this exercises the tiled path for exact parity."""
    index, _, _ = data
    rng = np.random.default_rng(11)
    queries = _normalize(rng.standard_normal((256, D), dtype=np.float32))
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = fused_topk(jnp.asarray(index), jnp.asarray(queries), K, block_rows=BLOCK)
    assert fv.shape == (256, K)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0
    np.testing.assert_allclose(np.asarray(fv), ov, atol=1e-5)


def test_fused_odd_query_count_pads_and_slices(data):
    """Non-tile-aligned Q (e.g. 100) pads internally and slices back."""
    index, _, _ = data
    rng = np.random.default_rng(12)
    queries = _normalize(rng.standard_normal((100, D), dtype=np.float32))
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = fused_topk(jnp.asarray(index), jnp.asarray(queries), K, block_rows=BLOCK)
    assert fv.shape == (100, K)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(fv))
    assert r == 1.0


def test_fused_masked_multi_tile(data):
    """Masked variant across multiple query tiles: per-query masks land
    on the right tile rows."""
    index, _, cats = data
    rng = np.random.default_rng(13)
    qn = 128
    queries = _normalize(rng.standard_normal((qn, D), dtype=np.float32))
    row_masks = make_row_masks(cats, CATEGORIES)
    # alternate wanted category per query
    qmask = np.array([1 << (i % len(CATEGORIES)) for i in range(qn)], np.uint32)
    fv, fi = fused_topk_masked(
        jnp.asarray(index), jnp.asarray(row_masks.astype(np.int32)),
        jnp.asarray(qmask.astype(np.int32)), jnp.asarray(queries), K,
        block_rows=BLOCK,
    )
    fi = np.asarray(fi)
    for i in range(qn):
        want = CATEGORIES[i % len(CATEGORIES)]
        got = set(cats[fi[i][fi[i] >= 0]])
        assert got <= {want}, (i, want, got)
    # oracle parity on the eligible subset
    for i in range(0, qn, 17):
        elig = np.nonzero(row_masks & qmask[i])[0]
        ov, oi = cosine_topk_numpy(index[elig], queries[i : i + 1], K)
        np.testing.assert_allclose(np.sort(np.asarray(fv)[i]), np.sort(ov[0]), atol=1e-5)


def test_fused_int8_multi_tile(data):
    index, _, _ = data
    rng = np.random.default_rng(14)
    queries = _normalize(rng.standard_normal((192, D), dtype=np.float32))
    vals, scales = quantize_int8(jnp.asarray(index))
    ov, oi = cosine_topk_numpy(index, queries, K)
    fv, fi = fused_topk_int8(vals, scales, jnp.asarray(queries), K, block_rows=BLOCK)
    assert fv.shape == (192, K)
    r = recall_at_k(np.asarray(fi), oi, ov, tie_tol=5e-3, candidate_scores=np.asarray(fv))
    assert r > 0.9  # int8 quantization tolerance, same as single-tile test


def test_staged_merge_matches_extract_and_topk_order():
    """The staged merge (per-128-lane-group extraction, round 3) must be
    bit-identical to the plain extract merge and to lax.top_k's
    lowest-index-wins order — including exact ties from duplicated rows
    within one group, across groups, and across blocks."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((500, 64)).astype(np.float32)
    x = np.concatenate([base, base[:250], base[:125]], axis=0)  # 875 rows
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, 500, 24)] + 0.01 * rng.standard_normal((24, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    xj, qj = jnp.asarray(x), jnp.asarray(q)
    import jax

    lv, li = jax.lax.top_k(jnp.asarray(q @ x.T), 10)
    for br in (256, 512):
        ve, ie = fused_topk(xj, qj, 10, n_valid=875, block_rows=br, _merge="extract")
        vs, is_ = fused_topk(xj, qj, 10, n_valid=875, block_rows=br, _merge="staged")
        np.testing.assert_array_equal(np.asarray(ie), np.asarray(is_))
        np.testing.assert_allclose(np.asarray(ve), np.asarray(vs), atol=0)
        np.testing.assert_array_equal(np.asarray(is_), np.asarray(li))
    # pathological: every row identical -> ids must be 0..k-1
    xd = np.tile(x[:1], (640, 1))
    xd /= np.linalg.norm(xd, axis=1, keepdims=True)
    _, idd = fused_topk(jnp.asarray(xd), qj, 10, n_valid=640, block_rows=256,
                        _merge="staged")
    assert (np.asarray(idd) == np.arange(10)).all()


def test_staged_merge_int8_and_masked_paths():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1100, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v8, s8 = quantize_int8(jnp.asarray(x))
    ve, ie = fused_topk_int8(v8, s8, jnp.asarray(q), 10, n_valid=1100,
                             block_rows=256, _merge="extract")
    vs, is_ = fused_topk_int8(v8, s8, jnp.asarray(q), 10, n_valid=1100,
                              block_rows=256, _merge="staged")
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(is_))
    np.testing.assert_allclose(np.asarray(ve), np.asarray(vs), atol=0)


def test_unrolled_extract_merge_matches_extract_exactly():
    """extractN (N max-extractions per while trip, round 3) must be
    bit-identical to extract and to lax.top_k order — incl. exact ties
    from duplicated rows, and over-stepping past completion (unroll
    larger than the insertions any block needs)."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((500, 64)).astype(np.float32)
    x = np.concatenate([base, base[:250], base[:125]], axis=0)  # 875 rows
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, 500, 24)] + 0.01 * rng.standard_normal((24, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    xj, qj = jnp.asarray(x), jnp.asarray(q)
    import jax

    lv, li = jax.lax.top_k(jnp.asarray(q @ x.T), 10)
    for merge in ("extract2", "extract4", "extract16"):
        ve, ie = fused_topk(xj, qj, 10, n_valid=875, block_rows=256, _merge="extract")
        vu, iu = fused_topk(xj, qj, 10, n_valid=875, block_rows=256, _merge=merge)
        np.testing.assert_array_equal(np.asarray(ie), np.asarray(iu))
        np.testing.assert_allclose(np.asarray(ve), np.asarray(vu), atol=0)
        np.testing.assert_array_equal(np.asarray(iu), np.asarray(li))
    # int8 s8s8 path takes merge too
    v8, s8 = quantize_int8(xj)
    ie8 = np.asarray(fused_topk_int8(v8, s8, qj, 10, n_valid=875,
                                     block_rows=256, _merge="extract")[1])
    iu8 = np.asarray(fused_topk_int8(v8, s8, qj, 10, n_valid=875,
                                     block_rows=256, _merge="extract4")[1])
    np.testing.assert_array_equal(ie8, iu8)
    # every row identical -> ids must be 0..k-1 even with over-stepping
    xd = np.tile(x[:1], (640, 1))
    xd /= np.linalg.norm(xd, axis=1, keepdims=True)
    _, idd = fused_topk(jnp.asarray(xd), qj, 10, n_valid=640, block_rows=256,
                        _merge="extract8")
    assert (np.asarray(idd) == np.arange(10)).all()


def test_group_merge_matches_extract_and_topk_order():
    """The group-cached merges (round 4: per-128-lane-group top-1/top-2
    cache, lazy bound-carrying refill) must be bit-identical to extract
    and to lax.top_k's lowest-index-wins order — including exact ties
    from duplicated rows within one group, across groups, and across
    blocks (ties are what exercise the (vlast, ne) re-masking rule)."""
    rng = np.random.default_rng(6)
    base = rng.standard_normal((500, 64)).astype(np.float32)
    x = np.concatenate([base, base[:250], base[:125]], axis=0)  # 875 rows
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, 500, 24)] + 0.01 * rng.standard_normal((24, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    xj, qj = jnp.asarray(x), jnp.asarray(q)
    import jax

    lv, li = jax.lax.top_k(jnp.asarray(q @ x.T), 10)
    for merge in ("group1", "group2"):
        for br in (256, 512):
            ve, ie = fused_topk(xj, qj, 10, n_valid=875, block_rows=br,
                                _merge="extract")
            vg, ig = fused_topk(xj, qj, 10, n_valid=875, block_rows=br,
                                _merge=merge)
            np.testing.assert_array_equal(np.asarray(ie), np.asarray(ig))
            np.testing.assert_allclose(np.asarray(ve), np.asarray(vg), atol=0)
            np.testing.assert_array_equal(np.asarray(ig), np.asarray(li))
    # pathological: every row identical — ids must be 0..k-1 (each group
    # is drained past its cache depth, forcing refills on every group)
    xd = np.tile(x[:1], (640, 1))
    xd /= np.linalg.norm(xd, axis=1, keepdims=True)
    for merge in ("group1", "group2"):
        _, idd = fused_topk(jnp.asarray(xd), qj, 10, n_valid=640,
                            block_rows=256, _merge=merge)
        assert (np.asarray(idd) == np.arange(10)).all()


def test_group_merge_k_equals_lanes_tie_dense():
    """k = 128 (the scratch width) on a tiny value alphabet: every
    group's cache is consumed many times over, duplicates of the same
    value span refill generations — the worst case for the extracted-
    lane reconstruction (> vlast, plus ne lowest equal lanes)."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 3, size=(1024, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
    q = rng.standard_normal((8, 64)).astype(np.float32)
    xj, qj = jnp.asarray(x), jnp.asarray(q)
    import jax

    lv, li = jax.lax.top_k(jnp.asarray(q @ x.T), 128)
    for merge in ("group1", "group2"):
        vg, ig = fused_topk(xj, qj, 128, block_rows=256, _merge=merge)
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(li))
        np.testing.assert_allclose(np.asarray(vg), np.asarray(lv),
                                   rtol=1e-5, atol=1e-6)


def test_group_merge_int8_and_masked_paths():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1100, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v8, s8 = quantize_int8(jnp.asarray(x))
    masks = jnp.asarray(rng.integers(1, 8, size=(1100,)).astype(np.uint32))
    qmask = jnp.asarray(np.full((16,), 3, np.uint32))
    for merge in ("group1", "group2"):
        for variant in ("s8s8", "row"):
            ie = np.asarray(fused_topk_int8(
                v8, s8, jnp.asarray(q), 10, n_valid=1100, block_rows=256,
                _variant=variant, _merge="extract")[1])
            ig = np.asarray(fused_topk_int8(
                v8, s8, jnp.asarray(q), 10, n_valid=1100, block_rows=256,
                _variant=variant, _merge=merge)[1])
            np.testing.assert_array_equal(ie, ig)
        ime = np.asarray(fused_topk_masked(
            jnp.asarray(x), masks, qmask, jnp.asarray(q), 10, n_valid=1100,
            block_rows=256, _merge="extract")[1])
        img = np.asarray(fused_topk_masked(
            jnp.asarray(x), masks, qmask, jnp.asarray(q), 10, n_valid=1100,
            block_rows=256, _merge=merge)[1])
        np.testing.assert_array_equal(ime, img)
