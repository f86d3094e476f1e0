"""Multi-chip sharded search on the 8-device CPU simulation mesh:
shard-local top-k + all_gather merge must equal the single-host oracle
(BASELINE configs[5] acceptance, SURVEY §4c strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, recall_at_k
from arxiv_rag_tpu.parallel import data_mesh, shard_index_rows, sharded_topk

N, D, Q, K = 4100, 64, 16, 10  # N deliberately not divisible by 8


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    index = _normalize(rng.standard_normal((N, D), dtype=np.float32))
    queries = _normalize(rng.standard_normal((Q, D), dtype=np.float32))
    return index, queries


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_matches_oracle(data, n_devices):
    index, queries = data
    mesh = data_mesh(n_devices)
    sharded, n_valid = shard_index_rows(index, mesh)
    assert n_valid == N
    vals, gids = sharded_topk(sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid)
    ov, oi = cosine_topk_numpy(index, queries, K)
    gids = np.asarray(gids)
    assert gids.max() < N  # padding never surfaces
    r = recall_at_k(gids, oi, ov, tie_tol=1e-5, candidate_scores=np.asarray(vals))
    assert r == 1.0, f"{n_devices}-device recall {r}"
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-5)


def test_scaling_devices_agree(data):
    """1-chip and 8-chip results are identical (merge is lossless)."""
    index, queries = data
    results = {}
    for nd in (1, 8):
        mesh = data_mesh(nd)
        sharded, n_valid = shard_index_rows(index, mesh)
        vals, gids = sharded_topk(sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid)
        results[nd] = (np.asarray(vals), np.asarray(gids))
    np.testing.assert_allclose(results[1][0], results[8][0], atol=1e-5)


def test_bf16_sharded_recall(data):
    index, queries = data
    mesh = data_mesh(8)
    sharded, n_valid = shard_index_rows(index.astype(jnp.bfloat16), mesh)
    vals, gids = sharded_topk(sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid)
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(
        np.asarray(gids), oi, ov, tie_tol=5e-3,
        candidate_scores=np.asarray(vals, np.float32),
    )
    assert r >= 0.99


def test_distributed_helpers_single_process():
    from arxiv_rag_tpu.parallel.distributed import (
        global_mesh,
        host_shard,
        init_distributed,
        is_primary,
    )

    assert init_distributed() is False  # no coordinator in tests
    assert is_primary()
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    items = list(range(10))
    assert host_shard(items) == items  # single process owns everything


def test_sharded_masked_matches_masked_oracle(data):
    """Category filtering on the sharded path == masked numpy oracle."""
    index, queries = data
    rng = np.random.default_rng(3)
    categories = rng.integers(0, 3, N)  # 3 pseudo-categories
    row_masks = (1 << categories).astype(np.int32)
    want = 0b01  # category 0 only
    mesh = data_mesh(8)
    sharded, n_valid = shard_index_rows(index, mesh)
    rm_sharded, _ = shard_index_rows(row_masks.reshape(-1, 1), mesh)
    rm_sharded = rm_sharded.reshape(-1)
    qmask = jnp.full((Q,), want, jnp.int32)
    vals, gids = sharded_topk(
        sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid,
        row_masks=rm_sharded, query_mask=qmask,
    )
    # oracle: numpy scan restricted to eligible rows
    eligible = (row_masks & want) != 0
    sub = index[eligible]
    sub_ids = np.nonzero(eligible)[0]
    ov, oi_local = cosine_topk_numpy(sub, queries, K)
    oi = sub_ids[oi_local]
    rec = recall_at_k(np.asarray(gids), oi, ov,
                      candidate_scores=np.asarray(vals, np.float32))
    assert rec == 1.0
    # every returned id is eligible
    got = np.asarray(gids)
    assert ((row_masks[got] & want) != 0)[got >= 0].all()


# ---- fused-kernel (Pallas, interpret) variants inside shard_map --------
# Round-1 gap: the masked/int8 sharded routes fell back to the XLA scan,
# so the production layout (sharded + filtered + int8) never ran the
# fused kernel. These run every variant through shard_map with the
# kernel in interpret mode — the same code Mosaic-compiles on TPU.

def _pallas_kw():
    return dict(use_pallas=True, interpret=True)


def test_sharded_pallas_plain(data):
    index, queries = data
    mesh = data_mesh(8)
    sharded, n_valid = shard_index_rows(index, mesh)
    vals, gids = sharded_topk(sharded, jnp.asarray(queries), K, mesh,
                              n_valid=n_valid, **_pallas_kw())
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(np.asarray(gids), oi, ov, tie_tol=1e-5,
                    candidate_scores=np.asarray(vals))
    assert r == 1.0
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-5)


def test_sharded_pallas_masked(data):
    index, queries = data
    rng = np.random.default_rng(4)
    categories = rng.integers(0, 3, N)
    row_masks = (1 << categories).astype(np.int32)
    want = 0b10
    mesh = data_mesh(8)
    sharded, n_valid = shard_index_rows(index, mesh)
    rm_sharded, _ = shard_index_rows(row_masks.reshape(-1, 1), mesh)
    vals, gids = sharded_topk(
        sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid,
        row_masks=rm_sharded.reshape(-1), query_mask=jnp.full((Q,), want, jnp.int32),
        **_pallas_kw(),
    )
    eligible = (row_masks & want) != 0
    sub_ids = np.nonzero(eligible)[0]
    ov, oi_local = cosine_topk_numpy(index[eligible], queries, K)
    rec = recall_at_k(np.asarray(gids), sub_ids[oi_local], ov, tie_tol=1e-5,
                      candidate_scores=np.asarray(vals, np.float32))
    assert rec == 1.0
    got = np.asarray(gids)
    assert ((row_masks[got] & want) != 0)[got >= 0].all()


def test_sharded_pallas_int8(data):
    # default int8_variant="s8s8" — the round-3 single-chip default now
    # runs through shard_map too (VERDICT r3 missing #2)
    from arxiv_rag_tpu.ops import quantize_int8

    index, queries = data
    mesh = data_mesh(8)
    vals8, scales = quantize_int8(jnp.asarray(index))
    sharded, n_valid = shard_index_rows(vals8, mesh)
    s_sharded, _ = shard_index_rows(np.asarray(scales).reshape(-1, 1), mesh)
    vals, gids = sharded_topk(
        sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid,
        scales=s_sharded.reshape(-1), **_pallas_kw(),
    )
    ov, oi = cosine_topk_numpy(index, queries, K)
    r = recall_at_k(np.asarray(gids), oi, ov, tie_tol=5e-3,
                    candidate_scores=np.asarray(vals, np.float32))
    assert r > 0.9


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_s8s8_matches_single_chip_kernel(data, n_devices):
    """s8s8 through shard_map == the single-chip fused_topk_int8 s8s8
    kernel: identical query-quantization recipe and identical per-row
    dequant means identical scores, and the all_gather merge is
    lossless — so the sharded values must equal the single-chip values
    to float tolerance."""
    from arxiv_rag_tpu.ops import quantize_int8
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8

    index, queries = data
    vals8, scales = quantize_int8(jnp.asarray(index))
    sv, si = fused_topk_int8(vals8, scales, jnp.asarray(queries), K,
                             interpret=True)
    mesh = data_mesh(n_devices)
    sharded, n_valid = shard_index_rows(np.asarray(vals8), mesh)
    s_sharded, _ = shard_index_rows(np.asarray(scales).reshape(-1, 1), mesh)
    pv, pg = sharded_topk(
        sharded, jnp.asarray(queries), K, mesh, n_valid=n_valid,
        scales=s_sharded.reshape(-1), int8_variant="s8s8", **_pallas_kw(),
    )
    np.testing.assert_allclose(np.asarray(pv), np.asarray(sv), atol=1e-5)
    r = recall_at_k(np.asarray(pg), np.asarray(si), np.asarray(sv),
                    tie_tol=1e-5, candidate_scores=np.asarray(pv, np.float32))
    assert r == 1.0


def test_sharded_s8s8_vs_row_variants_agree(data):
    """A/B of the two int8 scoring paths through shard_map: both must
    hit the fp32 oracle within int8 tolerance, and their score vectors
    differ only by the (small) query-quantization error."""
    from arxiv_rag_tpu.ops import quantize_int8

    index, queries = data
    mesh = data_mesh(8)
    vals8, scales = quantize_int8(jnp.asarray(index))
    sharded, n_valid = shard_index_rows(np.asarray(vals8), mesh)
    s_sharded, _ = shard_index_rows(np.asarray(scales).reshape(-1, 1), mesh)
    kw = dict(n_valid=n_valid, scales=s_sharded.reshape(-1))
    out = {}
    for variant in ("s8s8", "row"):
        v, g = sharded_topk(sharded, jnp.asarray(queries), K, mesh,
                            int8_variant=variant, **kw, **_pallas_kw())
        out[variant] = (np.asarray(v), np.asarray(g))
        ov, oi = cosine_topk_numpy(index, queries, K)
        r = recall_at_k(out[variant][1], oi, ov, tie_tol=5e-3,
                        candidate_scores=out[variant][0].astype(np.float32))
        assert r > 0.9, f"{variant} recall {r}"
    np.testing.assert_allclose(out["s8s8"][0], out["row"][0], atol=2e-2)


def test_sharded_pallas_int8_masked_matches_xla_sharded(data):
    """The full production layout: sharded + int8 + category-filtered,
    fused kernel vs the XLA sharded scan — identical ids."""
    from arxiv_rag_tpu.ops import quantize_int8

    index, queries = data
    rng = np.random.default_rng(5)
    categories = rng.integers(0, 4, N)
    row_masks = (1 << categories).astype(np.int32)
    want = 0b1001
    mesh = data_mesh(8)
    vals8, scales = quantize_int8(jnp.asarray(index))
    sharded, n_valid = shard_index_rows(vals8, mesh)
    s_sharded, _ = shard_index_rows(np.asarray(scales).reshape(-1, 1), mesh)
    rm_sharded, _ = shard_index_rows(row_masks.reshape(-1, 1), mesh)
    kw = dict(
        n_valid=n_valid, scales=s_sharded.reshape(-1),
        row_masks=rm_sharded.reshape(-1),
        query_mask=jnp.full((Q,), want, jnp.int32),
    )
    pv, pg = sharded_topk(sharded, jnp.asarray(queries), K, mesh,
                          **kw, **_pallas_kw())
    xv, xg = sharded_topk(sharded, jnp.asarray(queries), K, mesh,
                          **kw, use_pallas=False)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), atol=2e-2)
    got = np.asarray(pg)
    assert ((row_masks[got] & want) != 0)[got >= 0].all()


def test_engine_mesh_int8_with_categories():
    """SearchEngine end-to-end on a mesh-sharded int8 index with a
    category filter (round 1 raised NotImplementedError at to_device)."""
    from arxiv_rag_tpu.index.store import build_index
    from arxiv_rag_tpu.search.engine import SearchEngine

    rng = np.random.default_rng(6)
    embs = rng.standard_normal((96, 32)).astype(np.float32)
    cats = ["cs.LG" if i % 2 else "cs.AI" for i in range(96)]
    idx_mesh = build_index(embs, categories=cats, dtype="int8")
    idx_mesh.to_device(mesh=data_mesh(8))
    idx_single = build_index(embs, categories=cats, dtype="int8")
    q = embs[:8] / np.linalg.norm(embs[:8], axis=1, keepdims=True)
    meshed = SearchEngine(idx_mesh, use_pallas=False)
    single = SearchEngine(idx_single, use_pallas=False)
    v1, r1 = meshed.search_embeddings(q, k=5, categories=["cs.LG"])
    v2, r2 = single.search_embeddings(q, k=5, categories=["cs.LG"])
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, atol=1e-4)
    assert (np.asarray(r1) % 2 == 1).all()
