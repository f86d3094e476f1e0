"""Incremental index growth: append_index + IVFIndex.extend.

Reference parity: ChromaDB ``collection.add`` is the reference's
incremental path (``generate_embeddings_parallel.py:323-468``); its
``.npy`` fallback is itself batch-incremental
(``save_embeddings_to_disk.py:31-80``). Contract here: appending half a
corpus to the other half is indistinguishable from building the whole
thing at once (given the same category vocabulary), and the IVF delta
refreshes from its trained centroids without re-running k-means.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from arxiv_rag_tpu.index.ivf import IVFIndex
from arxiv_rag_tpu.index.store import DenseIndex, append_index, build_index
from arxiv_rag_tpu.ops.pallas_topk import fused_topk


def _emb(n: int, d: int = 64, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _vals_f32(idx: DenseIndex) -> np.ndarray:
    v = np.asarray(idx.values).astype(np.float32)
    if idx.dtype == "int8":
        v = v * np.asarray(idx.scales)[:, None]
    return v


@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "float32"])
def test_append_matches_full_build(tmp_path, dtype):
    full = _emb(100)
    cats = ["cs.LG"] * 40 + ["cs.CV"] * 20 + ["cs.AI"] * 40
    ids = [f"c{i:03d}" for i in range(100)]

    base = build_index(full[:60], categories=cats[:60], dtype=dtype,
                       chunk_ids=ids[:60])
    base.save(tmp_path, rows_per_shard=32)
    combined = append_index(tmp_path, full[60:], categories=cats[60:],
                            chunk_ids=ids[60:], rows_per_shard=32)

    # bit positions of pre-existing categories are preserved; the new
    # one appends
    assert combined.categories[: len(base.categories)] == base.categories
    assert set(combined.categories) == {"cs.LG", "cs.CV", "cs.AI"}

    oracle = build_index(full, categories=cats, dtype=dtype, chunk_ids=ids,
                         category_names=combined.categories)
    assert combined.num_rows == oracle.num_rows == 100
    if dtype == "bfloat16":
        np.testing.assert_array_equal(
            np.asarray(combined.values).view(np.uint16),
            np.asarray(oracle.values).view(np.uint16),
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(combined.values), np.asarray(oracle.values)
        )
    if dtype == "int8":
        np.testing.assert_array_equal(combined.scales, oracle.scales)
    np.testing.assert_array_equal(combined.row_masks, oracle.row_masks)
    assert combined.chunk_ids == ids

    # search parity through the fused kernel (interpret on CPU)
    q = _emb(8, seed=7)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    va, ia = fused_topk(_vals_f32(combined), q, 5, block_rows=32)
    vb, ib = fused_topk(_vals_f32(oracle), q, 5, block_rows=32)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_append_multiple_rounds(tmp_path):
    full = _emb(90, seed=3)
    base = build_index(full[:30], dtype="bfloat16")
    base.save(tmp_path, rows_per_shard=16)
    append_index(tmp_path, full[30:55], rows_per_shard=16)
    combined = append_index(tmp_path, full[55:], rows_per_shard=16)
    oracle = build_index(full, dtype="bfloat16")
    np.testing.assert_array_equal(
        np.asarray(combined.values).view(np.uint16),
        np.asarray(oracle.values).view(np.uint16),
    )
    manifest = json.loads((tmp_path / "index.json").read_text())
    offs = [s["row_offset"] for s in manifest["shards"]]
    assert offs == sorted(offs) and manifest["num_rows"] == 90


def test_append_validation_errors(tmp_path):
    base = build_index(_emb(20), categories=["cs.LG"] * 20, dtype="int8",
                       chunk_ids=[f"c{i}" for i in range(20)])
    base.save(tmp_path)
    with pytest.raises(ValueError, match="dim"):
        append_index(tmp_path, _emb(4, d=32), categories=["cs.LG"] * 4,
                     chunk_ids=list("abcd"))
    with pytest.raises(ValueError, match="category parity"):
        append_index(tmp_path, _emb(4), chunk_ids=list("abcd"))
    with pytest.raises(ValueError, match="chunk-id parity"):
        append_index(tmp_path, _emb(4), categories=["cs.LG"] * 4)
    with pytest.raises(ValueError, match="chunk_ids"):
        append_index(tmp_path, _emb(4), categories=["cs.LG"] * 4,
                     chunk_ids=list("ab"))

    plain = build_index(_emb(10), dtype="bfloat16")
    plain_dir = tmp_path / "plain"
    plain.save(plain_dir)
    with pytest.raises(ValueError, match="category parity"):
        append_index(plain_dir, _emb(4), categories=["cs.LG"] * 4)


def test_load_trims_oversized_sidecars(tmp_path):
    """Crash window: sidecars written, manifest not yet replaced — the
    base index must still load with its own row count."""
    base = build_index(_emb(24), categories=["cs.LG"] * 24, dtype="int8")
    base.save(tmp_path)
    np.save(tmp_path / "scales.npy",
            np.concatenate([base.scales, np.ones(8, np.float32)]))
    np.save(tmp_path / "row_masks.npy",
            np.concatenate([base.row_masks, np.zeros(8, np.uint32)]))
    loaded = DenseIndex.load(tmp_path)
    assert loaded.num_rows == 24
    assert loaded.scales.shape == (24,) and loaded.row_masks.shape == (24,)


def test_ivf_extend_matches_full_rebuild(tmp_path):
    full = _emb(400, d=32, seed=1)
    base = build_index(full[:250], dtype="bfloat16")
    base.save(tmp_path, rows_per_shard=128)
    ivf0 = IVFIndex.build(base, 8, block_rows=8, iters=4, seed=0)
    ivf0.save(tmp_path)

    combined = append_index(tmp_path, full[250:], rows_per_shard=128)
    ivf1 = IVFIndex.extend(tmp_path, combined)

    oracle = IVFIndex.build(combined, 8, block_rows=8,
                            centroids=ivf0.centroids)
    np.testing.assert_array_equal(ivf1.perm, oracle.perm)
    np.testing.assert_array_equal(ivf1.offsets, oracle.offsets)
    assert ivf1.n_valid == 400

    # the refreshed delta round-trips and serves the full corpus
    reloaded = IVFIndex.load(tmp_path, combined)
    q = _emb(8, d=32, seed=9)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vi, ri = reloaded.search(q, 5, nprobe=8)  # full probe == exact
    vo, ro = fused_topk(_vals_f32(combined), q, 5, block_rows=128)
    np.testing.assert_array_equal(np.sort(ri, axis=1),
                                  np.sort(np.asarray(ro), axis=1))


def test_ivf_extend_guards(tmp_path):
    base = build_index(_emb(64, d=32), dtype="bfloat16")
    base.save(tmp_path)
    ivf = IVFIndex.build(base, 4, block_rows=8, iters=2)
    ivf.save(tmp_path)
    shrunk = build_index(_emb(32, d=32), dtype="bfloat16")
    with pytest.raises(ValueError, match="shrank"):
        IVFIndex.extend(tmp_path, shrunk)
    other = build_index(_emb(64, d=32), dtype="int8")
    with pytest.raises(ValueError, match="dtype"):
        IVFIndex.extend(tmp_path, other)
