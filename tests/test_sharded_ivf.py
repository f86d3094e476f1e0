"""Sharded IVF (cluster-partitioned shards + all_gather merge) on the
8-device CPU simulation mesh.

Acceptance contract (extends tests/test_ivf.py's): at full probe the
mesh result must EXACTLY equal the flat oracle at every device count
(coverage is total, the merge is lossless); at nd=1 the route must
EXACTLY reproduce the single-chip IVFIndex (same layout, same planner);
at partial probe every returned row must come from the planned
coverage, and recall on clustered data must clear the same floor as
the single-chip index.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.index.ivf import IVFIndex
from arxiv_rag_tpu.index.store import build_index
from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, make_row_masks, recall_at_k
from arxiv_rag_tpu.parallel import data_mesh
from arxiv_rag_tpu.parallel.ivf import ShardedIVF, partition_clusters

D, K, BR, QB, NC = 64, 10, 128, 8, 24
CATEGORIES = ["cs.LG", "cs.CV", "cs.AI"]


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.fixture(scope="module")
def blob_data():
    rng = np.random.default_rng(13)
    centers = _normalize(rng.standard_normal((NC, D)).astype(np.float32))
    rows = centers[np.repeat(np.arange(NC), 100)]
    rows = _normalize(rows + 0.05 * rng.standard_normal(rows.shape).astype(np.float32))
    rows = rows[rng.permutation(rows.shape[0])]
    queries = _normalize(
        rows[rng.choice(rows.shape[0], 24)]
        + 0.1 * rng.standard_normal((24, D)).astype(np.float32)
    )
    cats = rng.choice(CATEGORIES, size=rows.shape[0])
    return rows, queries, cats


def _ivf(rows, dtype="float32", cats=None):
    dense = build_index(rows, dtype=dtype, normalize=False,
                        categories=None if cats is None else list(cats))
    return dense, IVFIndex.build(dense, NC, block_rows=BR, iters=8, seed=0,
                                 sample_rows=None)


def test_partition_clusters_covers_and_balances():
    offsets = np.array([0, 10, 10, 40, 45, 100, 160, 200], np.int64)
    cuts = partition_clusters(offsets, 4)
    assert cuts[0] == 0 and cuts[-1] == 7
    assert (np.diff(cuts) >= 0).all()
    rows = np.diff(offsets[cuts])
    assert rows.sum() == 200
    assert rows.max() <= 200  # degenerate-safe; balance is best-effort


@pytest.mark.parametrize("nd", [1, 2, 8])
def test_full_probe_matches_flat_oracle(blob_data, nd):
    rows, queries, _ = blob_data
    siv = ShardedIVF.build(_ivf(rows)[1], nd)
    vals, rids = siv.search(queries, K, data_mesh(nd), nprobe=NC)
    ov, oi = cosine_topk_numpy(rows, queries, K)
    assert (rids >= 0).all()
    r = recall_at_k(rids, oi, ov, tie_tol=1e-5, candidate_scores=vals)
    assert r == 1.0, f"{nd}-device full-probe recall {r}"
    np.testing.assert_allclose(vals, ov, atol=1e-4)


def test_single_shard_reproduces_single_chip(blob_data):
    rows, queries, _ = blob_data
    ivf = _ivf(rows)[1]
    siv = ShardedIVF.build(ivf, 1)
    sv, sr = siv.search(queries, K, data_mesh(1), nprobe=4)
    iv, ir = ivf.search(queries, K, nprobe=4)
    np.testing.assert_array_equal(sr, ir)
    np.testing.assert_allclose(sv, iv, atol=1e-5)


def test_partial_probe_recall_and_coverage(blob_data):
    rows, queries, _ = blob_data
    ivf = _ivf(rows)[1]
    siv = ShardedIVF.build(ivf, 8)
    mesh = data_mesh(8)
    vals, rids = siv.search(queries, K, mesh, nprobe=4)
    ov, oi = cosine_topk_numpy(rows, queries, K)
    r = recall_at_k(rids, oi, ov, tie_tol=1e-4, candidate_scores=vals)
    assert r >= 0.9, f"partial-probe recall {r}"

    # every hit must come from the planned coverage of its query tile
    siv.to_device(mesh)
    cids = siv.probe(jnp.asarray(queries), 4)
    table = siv.plan_blocks(cids, QB)
    starts, br = siv.row_starts, siv.block_rows
    for qi in range(queries.shape[0]):
        t = qi // QB
        covered = set()
        for s in range(8):
            nv = int(starts[s + 1] - starts[s])
            for b in table[s, t]:
                if b == siv.dead_block:
                    continue
                lo = int(b) * br
                for l in range(lo, min(lo + br, nv)):
                    covered.add(int(siv.ivf.perm[starts[s] + l]))
        for rid in rids[qi]:
            assert int(rid) in covered


@pytest.mark.parametrize("nd", [2, 8])
def test_int8_full_probe_matches_single_chip(blob_data, nd):
    rows, queries, _ = blob_data
    ivf = _ivf(rows, dtype="int8")[1]
    siv = ShardedIVF.build(ivf, nd)
    sv, sr = siv.search(queries, K, data_mesh(nd), nprobe=NC)
    iv, ir = ivf.search(queries, K, nprobe=NC)
    # same int8 storage, same "row" bf16 compute — scores agree tightly;
    # rankings may swap only at ties
    r = recall_at_k(sr, ir, iv, tie_tol=1e-4, candidate_scores=sv)
    assert r == 1.0
    np.testing.assert_allclose(sv, iv, atol=1e-3, rtol=1e-3)


def test_masked_sharded_ivf_exact_filter(blob_data):
    rows, queries, cats = blob_data
    dense, ivf = _ivf(rows, dtype="int8", cats=cats)
    siv = ShardedIVF.build(ivf, 8)
    want_cat = CATEGORIES[0]
    qmask = np.full((queries.shape[0],), dense.category_mask([want_cat]))
    vals, rids = siv.search(queries, K, data_mesh(8), nprobe=NC,
                            query_mask=qmask)
    eligible = np.flatnonzero(np.asarray(cats) == want_cat)
    assert (rids >= 0).all()
    assert np.isin(rids, eligible).all()
    # oracle restricted to the eligible rows
    sub_v, sub_i = cosine_topk_numpy(rows[eligible], queries, K)
    r = recall_at_k(rids, eligible[sub_i], sub_v, tie_tol=1e-3,
                    candidate_scores=vals)
    assert r == 1.0


def test_ragged_query_count(blob_data):
    rows, queries, _ = blob_data
    siv = ShardedIVF.build(_ivf(rows)[1], 8)
    vals, rids = siv.search(queries[:5], K, data_mesh(8), nprobe=NC)
    assert vals.shape == (5, K) and rids.shape == (5, K)
    ov, oi = cosine_topk_numpy(rows, queries[:5], K)
    r = recall_at_k(rids, oi, ov, tie_tol=1e-5, candidate_scores=vals)
    assert r == 1.0


def test_engine_mesh_routes_through_sharded_ivf(blob_data):
    """A mesh-sharded engine with an IVF delta and nprobe>0 serves
    through the cluster-partitioned route and matches the single-chip
    engine's IVF results at full probe."""
    from arxiv_rag_tpu.search.engine import SearchEngine

    rows, queries, cats = blob_data
    dense, ivf = _ivf(rows, dtype="int8", cats=cats)
    single = SearchEngine(dense, ivf=ivf, use_pallas=False)
    sv, sr = single.search_embeddings(queries, K, nprobe=NC)

    dense2, ivf2 = _ivf(rows, dtype="int8", cats=cats)
    dense2.to_device(mesh=data_mesh(8), row_multiple=BR)
    meshed = SearchEngine(dense2, ivf=ivf2, use_pallas=False)
    mv, mr = meshed.search_embeddings(queries, K, nprobe=NC)
    assert hasattr(meshed, "_sharded_ivf_cache")  # routed through the mesh path
    r = recall_at_k(mr, sr, sv, tie_tol=1e-4, candidate_scores=mv)
    assert r == 1.0
    np.testing.assert_allclose(mv, sv, atol=1e-3, rtol=1e-3)

    # category filter through the mesh IVF route
    cv, cr = meshed.search_embeddings(queries, K, categories=["cs.CV"],
                                      nprobe=NC)
    keep = np.flatnonzero(np.asarray(cats) == "cs.CV")
    assert np.isin(cr, keep).all()


@pytest.mark.parametrize("nd", [1, 2, 8])
def test_device_plan_matches_host_plan_sharded(blob_data, nd):
    """plan="device" (probe + per-shard planning traced inside the
    shard_map) covers the same blocks per shard as the host planner, so
    results match exactly — f32 and int8, full and partial probe."""
    rows, queries, _ = blob_data
    for dtype in ("float32", "int8"):
        siv = ShardedIVF.build(_ivf(rows, dtype=dtype)[1], nd)
        mesh = data_mesh(nd)
        for nprobe in (3, NC):
            hv, hr = siv.search(queries, K, mesh, nprobe=nprobe, plan="host")
            dv, dr = siv.search(queries, K, mesh, nprobe=nprobe, plan="device")
            np.testing.assert_array_equal(dr, hr,
                                          err_msg=f"{dtype} nd={nd} np={nprobe}")
            np.testing.assert_allclose(dv, hv, atol=1e-6)


def test_device_plan_masked_sharded(blob_data):
    rows, queries, cats = blob_data
    dense, ivf = _ivf(rows, dtype="int8", cats=cats)
    siv = ShardedIVF.build(ivf, 8)
    mesh = data_mesh(8)
    qmask = np.full((queries.shape[0],), dense.category_mask(["cs.AI"]))
    hv, hr = siv.search(queries, K, mesh, nprobe=NC, query_mask=qmask,
                        plan="host")
    dv, dr = siv.search(queries, K, mesh, nprobe=NC, query_mask=qmask,
                        plan="device")
    np.testing.assert_array_equal(dr, hr)
    np.testing.assert_allclose(dv, hv, atol=1e-6)
