"""IVF subsystem: k-means, the scalar-prefetch pruned kernel, and the
IVFIndex build/probe/search/persist path (interpret mode on CPU; the
same kernel compiles on TPU).

Acceptance contract: with nprobe == n_clusters the IVF result must
EXACTLY match the flat oracle (pruning covers everything); at partial
nprobe the result must exactly match the oracle restricted to the
probed blocks' rows (no row invented, none silently dropped); recall on
clustered data at modest nprobe must clear a floor that random pruning
could not.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arxiv_rag_tpu.index.ivf import IVFIndex
from arxiv_rag_tpu.index.store import build_index
from arxiv_rag_tpu.ops.kmeans import assign_clusters, spherical_kmeans
from arxiv_rag_tpu.ops.pallas_ivf import (
    ivf_topk,
    ivf_topk_int8,
    ivf_topk_masked,
    pad_index_for_ivf,
)
from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, make_row_masks, recall_at_k

D, K, BR, QB = 64, 10, 128, 8
CATEGORIES = ["cs.LG", "cs.CV", "cs.AI"]


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _blobs(rng, n_blobs, per_blob, d=D, spread=0.05):
    # NB spread multiplies an isotropic d-dim draw whose norm is
    # ~spread*sqrt(d); at d=64, 0.05 keeps rows within ~0.4 of their
    # center (cosine ~0.93) — genuinely clustered, not near-isotropic
    """Clustered unit vectors: n_blobs centers, per_blob noisy copies."""
    centers = _normalize(rng.standard_normal((n_blobs, d)).astype(np.float32))
    rows = centers[np.repeat(np.arange(n_blobs), per_blob)]
    rows = _normalize(rows + spread * rng.standard_normal(rows.shape).astype(np.float32))
    return rows


@pytest.fixture(scope="module")
def blob_data():
    rng = np.random.default_rng(7)
    index = _blobs(rng, n_blobs=24, per_blob=100)
    perm = rng.permutation(index.shape[0])  # clusters must be discovered
    index = index[perm]
    queries = _normalize(
        index[rng.choice(index.shape[0], 24)]
        + 0.1 * rng.standard_normal((24, D)).astype(np.float32)
    )
    cats = rng.choice(CATEGORIES, size=index.shape[0])
    return index, queries, cats


# -- k-means ---------------------------------------------------------------


def test_kmeans_recovers_blob_structure(blob_data):
    index, _, _ = blob_data
    cents = spherical_kmeans(index, 24, iters=12, seed=0, sample_rows=None)
    assert cents.shape == (24, D)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)
    assign = assign_clusters(index, cents)
    counts = np.bincount(assign, minlength=24)
    # blobs are size 100; a decent clustering keeps every centroid alive
    # and no cluster swallows more than a few blobs
    assert counts.min() > 0
    assert counts.max() < 500
    # within-cluster cohesion beats the global mean similarity
    sim_to_own = np.einsum("nd,nd->n", index, cents[assign])
    assert sim_to_own.mean() > 0.8


def test_kmeans_reseeds_empty_clusters():
    rng = np.random.default_rng(0)
    # 2 tight blobs but 8 clusters: most start empty-prone
    data = _blobs(rng, n_blobs=2, per_blob=50, spread=0.02)
    cents = spherical_kmeans(data, 8, iters=6, seed=1, sample_rows=None)
    assert cents.shape == (8, D)
    assert np.isfinite(cents).all()


# -- kernel ----------------------------------------------------------------


@pytest.fixture(scope="module")
def flat_data():
    rng = np.random.default_rng(3)
    index = _normalize(rng.standard_normal((1500, D)).astype(np.float32))
    queries = _normalize(rng.standard_normal((16, D)).astype(np.float32))
    return index, queries


def test_ivf_kernel_full_coverage_exact(flat_data):
    index, queries = flat_data
    n = index.shape[0]
    vals_pad, _, _, dead = pad_index_for_ivf(index, BR)
    tiles = queries.shape[0] // QB
    full = np.tile(np.arange(dead, dtype=np.int32), (tiles, 1))
    v, i = ivf_topk(
        jnp.asarray(vals_pad), full, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    ov, oi = cosine_topk_numpy(index, queries, K)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(v), ov, atol=2e-2)


def test_ivf_kernel_partial_coverage_matches_restricted_oracle(flat_data):
    index, queries = flat_data
    n = index.shape[0]
    vals_pad, _, _, dead = pad_index_for_ivf(index, BR)
    probe_sets = [np.array([0, 2, 5], np.int32), np.array([1, 3, 4, 8], np.int32)]
    width = max(len(p) for p in probe_sets)
    table = np.full((2, width), dead, np.int32)
    for t, p in enumerate(probe_sets):
        table[t, : len(p)] = p
    v, i = ivf_topk(
        jnp.asarray(vals_pad), table, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    v, i = np.asarray(v), np.asarray(i)
    for t, p in enumerate(probe_sets):
        rows = np.concatenate([np.arange(b * BR, min((b + 1) * BR, n)) for b in p])
        sv, si = cosine_topk_numpy(index[rows], queries[t * QB : (t + 1) * QB], K)
        np.testing.assert_array_equal(i[t * QB : (t + 1) * QB], rows[si])
        np.testing.assert_allclose(v[t * QB : (t + 1) * QB], sv, atol=2e-2)


def test_ivf_kernel_dead_block_padding_is_noop(flat_data):
    index, queries = flat_data
    n = index.shape[0]
    vals_pad, _, _, dead = pad_index_for_ivf(index, BR)
    base = np.tile(np.arange(4, dtype=np.int32), (2, 1))
    padded = np.concatenate([base, np.full((2, 5), dead, np.int32)], axis=1)
    v1, i1 = ivf_topk(
        jnp.asarray(vals_pad), base, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    v2, i2 = ivf_topk(
        jnp.asarray(vals_pad), padded, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_ivf_kernel_int8_full_coverage_recall(flat_data):
    from arxiv_rag_tpu.ops.quant import quantize_int8

    index, queries = flat_data
    n = index.shape[0]
    v8, s8 = quantize_int8(index)
    vals_pad, scales_pad, _, dead = pad_index_for_ivf(
        np.asarray(v8), BR, scales=np.asarray(s8)
    )
    tiles = queries.shape[0] // QB
    full = np.tile(np.arange(dead, dtype=np.int32), (tiles, 1))
    v, i = ivf_topk_int8(
        jnp.asarray(vals_pad), jnp.asarray(scales_pad), full,
        jnp.asarray(queries), K, n_valid=n, block_rows=BR, q_block=QB,
        interpret=True,
    )
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(np.asarray(i), oi, ov, tie_tol=5e-3,
                    candidate_scores=np.asarray(v))
    assert r >= 0.99


def test_ivf_kernel_masked_exact_filter(flat_data):
    index, queries = flat_data
    n = index.shape[0]
    rng = np.random.default_rng(11)
    cats = rng.choice(CATEGORIES, size=n)
    row_masks = make_row_masks(cats, CATEGORIES)
    vals_pad, _, masks_pad, dead = pad_index_for_ivf(index, BR, row_masks=row_masks)
    tiles = queries.shape[0] // QB
    full = np.tile(np.arange(dead, dtype=np.int32), (tiles, 1))
    qmask = np.full((queries.shape[0],), np.uint32(0b001))  # cs.LG only
    v, i = ivf_topk_masked(
        jnp.asarray(vals_pad),
        jnp.asarray(masks_pad.astype(np.int32)),
        jnp.asarray(qmask.astype(np.int32)),
        full, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    keep = cats == "cs.LG"
    rows = np.flatnonzero(keep)
    sv, si = cosine_topk_numpy(index[rows], queries, K)
    np.testing.assert_array_equal(np.asarray(i), rows[si])


# -- IVFIndex end-to-end ---------------------------------------------------


def test_ivf_index_full_probe_matches_oracle(blob_data):
    index, queries, _ = blob_data
    dense = build_index(index, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 24, block_rows=BR, iters=8, seed=0)
    vals, rows = ivf.search(queries, K, nprobe=24, q_block=QB, interpret=True)
    ov, oi = cosine_topk_numpy(index, queries, K)
    np.testing.assert_array_equal(rows, oi)
    np.testing.assert_allclose(vals, ov, atol=2e-2)


def test_ivf_index_partial_probe_recall_on_clustered_data(blob_data):
    index, queries, _ = blob_data
    dense = build_index(index, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 24, block_rows=BR, iters=8, seed=0)
    vals, rows = ivf.search(queries, K, nprobe=6, q_block=QB, interpret=True)
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(rows, oi, ov, tie_tol=5e-3, candidate_scores=vals)
    # 6 of 24 clusters probed; blob queries concentrate their true
    # neighbors in few clusters, so recall must far exceed the 25%
    # coverage a random prune would give
    assert r >= 0.9, r


def test_ivf_index_int8_roundtrip_and_recall(blob_data, tmp_path):
    index, queries, cats = blob_data
    dense = build_index(index, categories=cats, dtype="int8", normalize=False)
    ivf = IVFIndex.build(dense, 16, block_rows=BR, iters=6, seed=1)
    ivf.save(tmp_path)
    assert IVFIndex.exists(tmp_path)
    loaded = IVFIndex.load(tmp_path, dense)
    np.testing.assert_array_equal(loaded.perm, ivf.perm)
    np.testing.assert_array_equal(loaded.values, ivf.values)
    v1, r1 = ivf.search(queries, K, nprobe=16, q_block=QB, interpret=True)
    v2, r2 = loaded.search(queries, K, nprobe=16, q_block=QB, interpret=True)
    np.testing.assert_array_equal(r1, r2)
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(r1, oi, ov, tie_tol=5e-3, candidate_scores=v1)
    assert r >= 0.99  # full probe: only int8 quantization error remains


def test_ivf_index_masked_search(blob_data):
    index, queries, cats = blob_data
    dense = build_index(index, categories=cats, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 16, block_rows=BR, iters=6, seed=2)
    qmask = np.full((queries.shape[0],), dense.category_mask(["cs.CV"]))
    vals, rows = ivf.search(
        queries, K, nprobe=16, q_block=QB, query_mask=qmask, interpret=True
    )
    keep = np.flatnonzero(cats == "cs.CV")
    sv, si = cosine_topk_numpy(index[keep], queries, K)
    np.testing.assert_array_equal(rows, keep[si])


def test_ivf_index_ragged_query_count(blob_data):
    """Query counts that aren't a q_block multiple pad by replicating the
    last query and trim back."""
    index, queries, _ = blob_data
    dense = build_index(index, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 16, block_rows=BR, iters=6, seed=0)
    q5 = queries[:5]
    vals, rows = ivf.search(q5, K, nprobe=16, q_block=QB, interpret=True)
    assert vals.shape == (5, K) and rows.shape == (5, K)
    ov, oi = cosine_topk_numpy(index, q5, K)
    np.testing.assert_array_equal(rows, oi)


def test_engine_routes_through_ivf(blob_data):
    """SearchEngine.search_embeddings(nprobe=...) uses the IVF path and
    returns the same row space as the flat scan."""
    from arxiv_rag_tpu.search.engine import SearchEngine

    index, queries, cats = blob_data
    dense = build_index(index, categories=cats, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 24, block_rows=BR, iters=8, seed=0)
    eng = SearchEngine(dense, ivf=ivf, use_pallas=False)
    fvals, frows = eng.search_embeddings(queries, K)  # flat (nprobe=0 default)
    ivals, irows = eng.search_embeddings(queries, K, nprobe=24)  # full probe
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(irows, oi, ov, tie_tol=5e-3, candidate_scores=ivals)
    assert r == 1.0
    rf = recall_at_k(frows, oi, ov, tie_tol=5e-3, candidate_scores=fvals)
    assert rf == 1.0
    # category filter through the IVF route
    cvals, crows = eng.search_embeddings(queries, K, categories=["cs.AI"],
                                         nprobe=24)
    keep = np.flatnonzero(np.asarray(cats) == "cs.AI")
    sv, si = cosine_topk_numpy(index[keep], queries, K)
    rc = recall_at_k(crows, keep[si], sv, tie_tol=5e-3, candidate_scores=cvals)
    assert rc == 1.0


def test_ivf_load_rejects_mismatched_dense(blob_data, tmp_path):
    index, _, _ = blob_data
    dense = build_index(index, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 8, block_rows=BR, iters=4, seed=0)
    ivf.save(tmp_path)
    other = build_index(index[:500], dtype="float32", normalize=False)
    with pytest.raises(ValueError, match="rebuild"):
        IVFIndex.load(tmp_path, other)


def test_device_plan_matches_host_plan(blob_data):
    """plan="device" (probe + plan + scan fused into one dispatch) must
    cover exactly the same candidate rows as the host planner, hence
    identical results — f32, int8, and masked variants."""
    index, queries, cats = blob_data
    for dtype in ("float32", "int8"):
        dense = build_index(index, categories=cats, dtype=dtype, normalize=False)
        ivf = IVFIndex.build(dense, 16, block_rows=BR, iters=6, seed=3)
        for nprobe in (2, 5, 16):
            hv, hr = ivf.search(queries, K, nprobe=nprobe, q_block=QB,
                                interpret=True, plan="host")
            dv, dr = ivf.search(queries, K, nprobe=nprobe, q_block=QB,
                                interpret=True, plan="device")
            np.testing.assert_array_equal(dr, hr, err_msg=f"{dtype} nprobe={nprobe}")
            np.testing.assert_allclose(dv, hv, atol=1e-6)
        # masked route
        qmask = np.full((queries.shape[0],), dense.category_mask(["cs.CV"]))
        hv, hr = ivf.search(queries, K, nprobe=16, q_block=QB, interpret=True,
                            query_mask=qmask, plan="host")
        dv, dr = ivf.search(queries, K, nprobe=16, q_block=QB, interpret=True,
                            query_mask=qmask, plan="device")
        np.testing.assert_array_equal(dr, hr)
        np.testing.assert_allclose(dv, hv, atol=1e-6)


def test_cluster_block_table_contract():
    from arxiv_rag_tpu.ops.pallas_ivf import cluster_block_table

    offsets = np.array([0, 0, 5, 5, 300, 301], np.int64)  # empty clusters too
    cb = cluster_block_table(offsets, 128, dead_block=99)
    assert cb.shape[0] == 5
    np.testing.assert_array_equal(cb[0], np.full(cb.shape[1], 99))  # empty
    assert cb[1][0] == 0 and (cb[1][1:] == 99).all()  # rows 0-5 -> block 0
    assert (cb[2] == 99).all()  # empty
    row = cb[3]
    assert list(row[row != 99]) == [0, 1, 2]  # rows 5-300 span blocks 0..2
    assert cb[4][0] == 2 and (cb[4][1:] == 99).all()  # row 300 -> block 2


def test_engine_k_over_128_falls_back_to_flat(blob_data):
    """k > 128 exceeds the fused kernels' VMEM scratch; with IVF + nprobe
    configured the engine must fall through to the flat route (served by
    the XLA scan) instead of crashing the window."""
    from arxiv_rag_tpu.search.engine import SearchEngine

    index, queries, _ = blob_data
    dense = build_index(index, dtype="float32", normalize=False)
    ivf = IVFIndex.build(dense, 24, block_rows=BR, iters=4, seed=0)
    eng = SearchEngine(dense, ivf=ivf, use_pallas=False)
    k_big = 200
    vals, rows = eng.search_embeddings(queries[:4], k_big, nprobe=24)
    assert vals.shape == (4, k_big)
    ov, oi = cosine_topk_numpy(index, queries[:4], k_big)
    r = recall_at_k(rows, oi, ov, tie_tol=5e-3, candidate_scores=vals)
    assert r == 1.0


def test_search_dispatch_accepts_device_arrays(blob_data):
    """search_dispatch must take a jax array (the engine's device window
    handoff) and produce the same results as the numpy path — without a
    host fetch in dispatch (spot-checked by equality; the no-fetch
    property is the code contract)."""
    import jax.numpy as jnp

    index, queries, _ = blob_data
    dense = build_index(index, dtype="int8", normalize=False)
    ivf = IVFIndex.build(dense, 24, block_rows=BR, iters=4, seed=0)
    fin_np = ivf.search_dispatch(queries[:12], K, nprobe=6, q_block=QB,
                                 interpret=True)
    fin_dev = ivf.search_dispatch(jnp.asarray(queries[:12]), K, nprobe=6,
                                  q_block=QB, interpret=True)
    v1, r1 = fin_np()
    v2, r2 = fin_dev()
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_unaligned_block_rows_rejected_for_tpu():
    """Mosaic lane tiling: the [1, N] scale/mask sidecars block as
    (1, block_rows), so compiled (non-interpret) lowering needs
    block_rows % 128 == 0 (int8/masked) or % 8 (bf16). The call builder
    must say so instead of the opaque Mosaic BlockSpec error."""
    from arxiv_rag_tpu.ops.pallas_ivf import _build_ivf_call

    with pytest.raises(ValueError, match="multiple of 128"):
        _build_ivf_call(64, 32, 8, 5, 8, np.int8, False, True,
                        interpret=False, q_block=8, max_blocks=4)
    with pytest.raises(ValueError, match="multiple of 8"):
        _build_ivf_call(60, 32, 8, 5, 4, np.float32, False, False,
                        interpret=False, q_block=8, max_blocks=4)
    # interpret mode (CPU tests) keeps accepting tiny blocks
    _build_ivf_call(64, 32, 8, 5, 8, np.int8, False, True,
                    interpret=True, q_block=8, max_blocks=4)


def test_ivf_kernel_group_merges_match_extract(flat_data):
    """The round-4 group-cached merges flow through the IVF kernel's
    probe-ordered visits too (same kernel body): ids and values must
    match the extract merge exactly, including out-of-order block
    visits (later-visited block with smaller global ids)."""
    index, queries = flat_data
    n = index.shape[0]
    vals_pad, _, _, dead = pad_index_for_ivf(index, BR)
    # out-of-order, partial, ragged probe sets + dead padding
    probe_sets = [np.array([5, 0, 2], np.int32), np.array([8, 1, 3, 4], np.int32)]
    width = max(len(p) for p in probe_sets)
    table = np.full((2, width), dead, np.int32)
    for t, p in enumerate(probe_sets):
        table[t, : len(p)] = p
    ve, ie = ivf_topk(
        jnp.asarray(vals_pad), table, jnp.asarray(queries), K,
        n_valid=n, block_rows=BR, q_block=QB, interpret=True,
    )
    for merge in ("group1", "group2"):
        vg, ig = ivf_topk(
            jnp.asarray(vals_pad), table, jnp.asarray(queries), K,
            n_valid=n, block_rows=BR, q_block=QB, interpret=True,
            _merge=merge,
        )
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))
        np.testing.assert_allclose(np.asarray(vg), np.asarray(ve), atol=0)
