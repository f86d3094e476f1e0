"""bench.py IVF-phase helpers: the uniform cluster map must be exactly
consistent with its offsets (a misplaced boundary row would sit outside
its cluster's block range and silently cost recall), and the resulting
shapes/statics must be DETERMINISTIC at the 2M default (values
[2_002_944, 768] — the main int8 phase's padded shape, sharing its warm
flat-scan AOT payload — cb [4096, 2], dead 1955) so the ivf_topk_device
payload the first hardware run warms keeps matching on every later
driver run."""

import numpy as np
import pytest

from bench import uniform_cluster_ids, uniform_cluster_offsets


@pytest.mark.parametrize(
    "n_rows,n_clusters",
    [(100, 7), (1000, 8), (12_345, 97), (2_000_000, 4096), (1_000_000, 2048)],
)
def test_ids_match_offsets(n_rows, n_clusters):
    off = uniform_cluster_offsets(n_rows, n_clusters)
    assert off[0] == 0 and off[-1] == n_rows
    sizes = np.diff(off)
    assert sizes.min() >= 0 and sizes.max() - sizes.min() <= 1
    # spot-check every cluster boundary: the first row of cluster c and
    # the last row of cluster c-1 must map back to those clusters
    for c in range(1, n_clusters):
        b = int(off[c])
        if b >= n_rows:
            break
        assert uniform_cluster_ids(b, 1, n_rows, n_clusters)[0] == c
        assert uniform_cluster_ids(b - 1, 1, n_rows, n_clusters)[0] == c - 1


def test_full_map_matches_counts():
    n_rows, n_clusters = 10_000, 33
    cid = uniform_cluster_ids(0, n_rows, n_rows, n_clusters)
    assert np.array_equal(
        np.bincount(cid, minlength=n_clusters),
        np.diff(uniform_cluster_offsets(n_rows, n_clusters)),
    )
    # the map is sorted, so the layout is cluster-contiguous as-is
    # (perm identity): that is what lets the bench skip the argsort
    assert np.all(np.diff(cid) >= 0)


def test_no_int32_overflow_at_scale():
    # 2M * 4096 = 8.2e9 > int32 max — the helper must stay exact
    cid = uniform_cluster_ids(1_999_999, 1, 2_000_000, 4096)
    assert cid[0] == 4095


def test_phase_end_to_end_small():
    """Mini replica of bench.py's IVF phase (host-generated uniform
    blob corpus -> device-planned pruned search) on the CPU interpret
    path: recall vs the exact oracle must be 1.0 at nprobe covering the
    query blobs, and every returned id must be a valid corpus row."""
    import jax
    import numpy as np

    from arxiv_rag_tpu.ops.pallas_ivf import cluster_block_table, ivf_topk_device
    from arxiv_rag_tpu.ops.topk import flat_search, recall_at_k

    dim, n_rows, n_cl, block, k, qn, spread = 64, 3000, 12, 256, 5, 8, 0.025
    padded = n_rows + (-n_rows) % 1024  # bench pads to the 4096 shape;
    if padded - n_rows < block:         # shape algebra scaled down here
        padded += 1024
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((n_cl, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vals8 = np.zeros((padded, dim), np.int8)
    scales = np.zeros((padded,), np.float32)
    cid = uniform_cluster_ids(0, n_rows, n_rows, n_cl)
    x = centers[cid] + spread * rng.standard_normal((n_rows, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sc = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
    vals8[:n_rows] = np.clip(np.round(x / sc[:, None]), -127, 127).astype(np.int8)
    scales[:n_rows] = sc
    qcid = rng.integers(0, n_cl, qn)
    q = centers[qcid] + spread * rng.standard_normal((qn, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dead = padded // block - 1
    cb = cluster_block_table(uniform_cluster_offsets(n_rows, n_cl), block, dead)
    dq = jax.numpy.asarray(q)
    dv, dr = ivf_topk_device(
        jax.numpy.asarray(vals8), jax.numpy.asarray(cb),
        jax.numpy.asarray(centers), dq, k,
        nprobe=4, n_valid=n_rows, block_rows=block, scales=jax.numpy.asarray(scales),
        interpret=True,
    )
    dv, dr = np.asarray(dv), np.asarray(dr)
    assert dr.shape == (qn, k) and (dr >= 0).all() and (dr < n_rows).all()
    # oracle over the dequantized storage (both paths see identical int8)
    deq = vals8[:n_rows].astype(np.float32) * scales[:n_rows, None]
    ov, oi = flat_search(jax.numpy.asarray(deq), dq, k)
    rec = recall_at_k(dr, np.asarray(oi), np.asarray(ov), tie_tol=5e-3,
                      candidate_scores=dv)
    assert rec == 1.0, rec


def test_block_table_shape_is_aot_stable():
    from arxiv_rag_tpu.ops.pallas_ivf import cluster_block_table

    off = uniform_cluster_offsets(2_000_000, 4096)
    # bench.py's exact padding algebra: 4096-aligned (the main int8
    # phase's padded shape — its flat-scan AOT payload is shared), with
    # a bump when the tail can't hold a fully-dead 1024-row block
    padded = 2_000_000 + (-2_000_000) % 4096
    if padded - 2_000_000 < 1024:
        padded += 4096
    dead = padded // 1024 - 1
    cb = cluster_block_table(off, 1024, dead)
    # [4096, 2] int32 — maxb 2: every ~489-row uniform cluster straddles
    # at most one 1024-row block boundary. These exact shapes/statics key
    # the ivf_topk_device AOT payload the first hardware run warms.
    assert cb.shape == (4096, 2)
    assert cb.dtype == np.int32
    assert dead == 1955 and padded == 2_002_944
    # every listed block actually covers part of its cluster's range
    for c in (0, 1, 2047, 4095):
        lo, hi = off[c], off[c + 1]
        real = cb[c][cb[c] != dead]
        assert real[0] == lo // 1024
        assert real[-1] == (hi - 1) // 1024
