"""IVF index: cluster-pruned layout over the dense store.

The ANN tier the reference only hints at (faiss-cpu/qdrant-client in
``3-chunks/pipeline/requirements.txt:17,20,31``, never imported). The
flat fused scan stays the EXACT default; IVF is the opt-in
recall/throughput trade for corpora where streaming every row stops
being cheap (≫2M rows) and for small-batch/latency-bound serving.

Layout: rows are permuted cluster-contiguously (no per-cluster padding
— a probed cluster's covering blocks may include a neighbor's rows,
which only ever ADDS candidates, so recall is monotone in coverage).
``perm`` maps IVF row → original row, so engine metadata never changes.

Batched probing on TPU (why ``q_block`` is small): each query TILE
streams the UNION of its queries' probed clusters, so the win factor is
``N / (union_blocks x block_rows)``. With random queries the union
grows ~linearly in ``q_block x nprobe`` until it saturates the cluster
count — so IVF pays off at small tiles (default q_block=8) and large
cluster counts, and the flat kernel (which streams the index ONCE for
any Q) stays the right choice at big query batches. Serving workloads
with correlated queries (the realistic case) share probes much better
than random; the micro-batcher can also group queries by top-1 cluster
to tighten unions further (future work).

Persistence is delta-style: only ``centroids/perm/offsets`` + meta are
written next to the dense index; load re-permutes the dense store's
rows (seconds, host-side) instead of duplicating gigabytes on disk.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from arxiv_rag_tpu.logging_utils import get_logger
from arxiv_rag_tpu.ops.kmeans import assign_clusters, spherical_kmeans
from arxiv_rag_tpu.ops.pallas_ivf import (
    cluster_block_table,
    ivf_topk,
    ivf_topk_device,
    ivf_topk_int8,
    ivf_topk_int8_masked,
    ivf_topk_masked,
    pad_index_for_ivf,
)
from arxiv_rag_tpu.ops.topk import flat_search

log = get_logger("ivf")

IVF_DIR = "ivf"


def _dense_rows_f32(dense, sl: slice | np.ndarray) -> np.ndarray:
    """f32 rows of a DenseIndex slice (dequantizing int8 storage)."""
    chunk = np.asarray(dense.values[sl])
    if dense.dtype == "int8":
        return chunk.astype(np.float32) * np.asarray(dense.scales[sl])[:, None]
    return chunk.astype(np.float32)


@dataclass
class IVFIndex:
    centroids: np.ndarray  # [C, D] f32, L2-normalized
    perm: np.ndarray  # [N] int64: IVF row -> original dense row
    offsets: np.ndarray  # [C+1] int64 cluster row ranges (IVF order)
    block_rows: int
    dtype: str  # mirrors the dense index: float32 | bfloat16 | int8
    values: np.ndarray  # [N_pad, D] reordered + tail-aligned + dead block
    scales: np.ndarray | None  # [N_pad] for int8
    row_masks: np.ndarray | None  # [N_pad] uint32, reordered
    n_valid: int
    dead_block: int

    # device-side state
    _device_values: jax.Array | None = None
    _device_scales: jax.Array | None = None
    _device_masks: jax.Array | None = None
    _device_centroids: jax.Array | None = None
    _device_cb: jax.Array | None = None  # [C, maxb] cluster→block table

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_blocks(self) -> int:  # includes the dead block
        return self.values.shape[0] // self.block_rows

    # -- build -----------------------------------------------------------

    @classmethod
    def build(
        cls,
        dense,
        n_clusters: int,
        *,
        block_rows: int = 1024,
        iters: int = 10,
        seed: int = 0,
        sample_rows: int | None = 262144,
        assign_batch: int = 262144,
        centroids: np.ndarray | None = None,
        assignments: np.ndarray | None = None,
    ) -> "IVFIndex":
        """Train centroids, assign every row, permute cluster-contiguous.

        ``dense`` is a DenseIndex (any dtype); int8 rows are dequantized
        batch-wise for training/assignment, so the full f32 matrix never
        materializes. ``centroids``/``assignments`` can be supplied
        precomputed (e.g. when the corpus already lives on-device and
        round-tripping f32 rows through a tunneled host would dominate
        the build — tools/ivf_scale.py assigns at generation time).
        """
        n = dense.num_rows
        if n_clusters < 2 or n_clusters > n:
            raise ValueError(f"n_clusters {n_clusters} out of range for {n} rows")
        rng = np.random.default_rng(seed)
        if centroids is None:
            t_rows = min(n, sample_rows) if sample_rows else n
            t_idx = np.sort(rng.choice(n, size=t_rows, replace=False))
            centroids = spherical_kmeans(
                _dense_rows_f32(dense, t_idx), n_clusters,
                iters=iters, seed=seed, sample_rows=None,
            )
        else:
            centroids = np.asarray(centroids, np.float32)
            if centroids.shape[0] != n_clusters:
                raise ValueError(
                    f"supplied centroids have {centroids.shape[0]} rows, "
                    f"expected n_clusters={n_clusters}"
                )
        if assignments is None:
            assign = np.empty((n,), np.int32)
            for start in range(0, n, assign_batch):
                sl = slice(start, min(start + assign_batch, n))
                assign[sl] = assign_clusters(_dense_rows_f32(dense, sl), centroids)
        else:
            assign = np.asarray(assignments, np.int32)
            if assign.shape != (n,):
                raise ValueError(f"assignments shape {assign.shape} != ({n},)")
        order = np.argsort(assign, kind="stable").astype(np.int64)
        counts = np.bincount(assign, minlength=n_clusters)
        offsets = np.zeros((n_clusters + 1,), np.int64)
        np.cumsum(counts, out=offsets[1:])
        values = np.asarray(dense.values)[order]
        scales = (
            np.asarray(dense.scales)[order] if dense.scales is not None else None
        )
        row_masks = (
            np.asarray(dense.row_masks)[order]
            if dense.row_masks is not None
            else None
        )
        values, scales, row_masks, dead = pad_index_for_ivf(
            values, block_rows, scales=scales, row_masks=row_masks
        )
        log.info(
            "built IVF: %d rows, %d clusters (min/median/max %d/%d/%d rows), "
            "%d blocks of %d",
            n, n_clusters, counts.min(), int(np.median(counts)), counts.max(),
            values.shape[0] // block_rows, block_rows,
        )
        return cls(
            centroids=centroids, perm=order, offsets=offsets,
            block_rows=block_rows, dtype=dense.dtype, values=values,
            scales=scales, row_masks=row_masks, n_valid=n, dead_block=dead,
        )

    # -- persistence -----------------------------------------------------

    def save(self, directory: str | Path) -> None:
        """Write the delta (centroids/perm/offsets + meta) under
        ``<index dir>/ivf/``; the reordered matrix is rebuilt at load."""
        d = Path(directory) / IVF_DIR
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "centroids.npy", self.centroids)
        np.save(d / "perm.npy", self.perm)
        np.save(d / "offsets.npy", self.offsets)
        meta = {
            "block_rows": self.block_rows,
            "n_clusters": self.n_clusters,
            "dtype": self.dtype,
            "n_valid": self.n_valid,
        }
        tmp = d / "meta.json.tmp"
        tmp.write_text(json.dumps(meta, indent=1))
        tmp.replace(d / "meta.json")
        log.info("saved IVF delta (%d clusters) to %s", self.n_clusters, d)

    @classmethod
    def load(cls, directory: str | Path, dense) -> "IVFIndex":
        d = Path(directory) / IVF_DIR
        meta = json.loads((d / "meta.json").read_text())
        if meta["dtype"] != dense.dtype:
            raise ValueError(
                f"IVF delta was built for dtype {meta['dtype']}, dense index "
                f"is {dense.dtype} — rebuild with `arag index --ivf-clusters`"
            )
        if meta["n_valid"] != dense.num_rows:
            raise ValueError(
                f"IVF delta covers {meta['n_valid']} rows, dense index has "
                f"{dense.num_rows} — rebuild"
            )
        perm = np.load(d / "perm.npy")
        block_rows = int(meta["block_rows"])
        values = np.asarray(dense.values)[perm]
        scales = np.asarray(dense.scales)[perm] if dense.scales is not None else None
        row_masks = (
            np.asarray(dense.row_masks)[perm]
            if dense.row_masks is not None
            else None
        )
        values, scales, row_masks, dead = pad_index_for_ivf(
            values, block_rows, scales=scales, row_masks=row_masks
        )
        return cls(
            centroids=np.load(d / "centroids.npy"), perm=perm,
            offsets=np.load(d / "offsets.npy"), block_rows=block_rows,
            dtype=dense.dtype, values=values, scales=scales,
            row_masks=row_masks, n_valid=int(meta["n_valid"]), dead_block=dead,
        )

    @staticmethod
    def exists(directory: str | Path) -> bool:
        return (Path(directory) / IVF_DIR / "meta.json").exists()

    @classmethod
    def extend(
        cls, directory: str | Path, dense, *, assign_batch: int = 262144
    ) -> "IVFIndex":
        """Refresh a saved IVF delta after ``append_index`` grew the
        dense store: reuse the trained centroids, recover the old rows'
        assignments from ``perm``/``offsets`` (position p of ``perm``
        lies in cluster c iff offsets[c] <= p < offsets[c+1]), assign
        only the NEW rows, and rebuild + save the layout. The k-means
        training cost is never re-paid; the permutation matches a full
        ``build`` with the same centroids bit-for-bit (stable argsort
        over identical assignments)."""
        d = Path(directory) / IVF_DIR
        meta = json.loads((d / "meta.json").read_text())
        if meta["dtype"] != dense.dtype:
            raise ValueError(
                f"IVF delta was built for dtype {meta['dtype']}, dense index "
                f"is {dense.dtype} — rebuild with `arag index --ivf-clusters`"
            )
        old_n, new_n = int(meta["n_valid"]), dense.num_rows
        if new_n < old_n:
            raise ValueError(
                f"dense index shrank ({new_n} rows < IVF's {old_n}) — rebuild"
            )
        perm = np.load(d / "perm.npy")
        offsets = np.load(d / "offsets.npy")
        centroids = np.load(d / "centroids.npy")
        n_clusters = centroids.shape[0]
        assign = np.empty((new_n,), np.int32)
        assign[perm] = np.repeat(
            np.arange(n_clusters, dtype=np.int32), np.diff(offsets)
        )
        for start in range(old_n, new_n, assign_batch):
            sl = slice(start, min(start + assign_batch, new_n))
            assign[sl] = assign_clusters(_dense_rows_f32(dense, sl), centroids)
        ivf = cls.build(
            dense, n_clusters, block_rows=int(meta["block_rows"]),
            centroids=centroids, assignments=assign,
        )
        ivf.save(directory)
        log.info("extended IVF delta: %d -> %d rows (%d clusters)",
                 old_n, new_n, n_clusters)
        return ivf

    # -- device ----------------------------------------------------------

    def to_device(self) -> "IVFIndex":
        jt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "int8": jnp.int8}[
            self.dtype
        ]
        self._device_values = jax.device_put(jnp.asarray(self.values, jt))
        if self.scales is not None:
            self._device_scales = jax.device_put(
                jnp.asarray(self.scales, jnp.float32)
            )
        if self.row_masks is not None:
            self._device_masks = jax.device_put(
                jnp.asarray(self.row_masks.astype(np.int32))
            )
        self._device_centroids = jax.device_put(jnp.asarray(self.centroids))
        self._device_cb = jax.device_put(
            jnp.asarray(
                cluster_block_table(self.offsets, self.block_rows, self.dead_block)
            )
        )
        return self

    # -- probe planning --------------------------------------------------

    def _probe_dispatch(self, queries: jnp.ndarray, nprobe: int) -> jnp.ndarray:
        """Dispatch the centroid top-nprobe WITHOUT fetching (device
        matmul + top-k over the tiny centroid table)."""
        if self._device_centroids is None:
            self.to_device()
        nprobe = min(nprobe, self.n_clusters)
        _, cids = flat_search(self._device_centroids, queries, nprobe)
        return cids

    def probe(self, queries: jnp.ndarray, nprobe: int) -> np.ndarray:
        """[Q, nprobe] int32 nearest-centroid ids."""
        return np.asarray(self._probe_dispatch(queries, nprobe))

    def plan_blocks(self, cluster_ids: np.ndarray, q_block: int) -> np.ndarray:
        """Per-tile block table for the kernel: union of the tile's
        probed clusters' covering blocks, ascending (the merge's
        tie-break contract), dead-block padded, width bucketed to a
        power of two (bounds recompiles across calls)."""
        qn, _ = cluster_ids.shape
        if qn % q_block:
            raise ValueError(f"{qn} probe rows not a multiple of q_block {q_block}")
        tiles = qn // q_block
        br = self.block_rows
        off = self.offsets
        lists = []
        for t in range(tiles):
            cl = np.unique(cluster_ids[t * q_block : (t + 1) * q_block])
            cl = cl[(cl >= 0) & (cl < self.n_clusters)]
            cl = cl[off[cl + 1] > off[cl]]  # empty clusters cover nothing
            starts = off[cl] // br
            ends = -(-off[cl + 1] // br)  # ceil
            blocks = np.unique(
                np.concatenate(
                    [np.arange(s, e) for s, e in zip(starts, ends)]
                    or [np.zeros(0, np.int64)]
                )
            )
            lists.append(blocks.astype(np.int32))
        width = max(1, max(len(b) for b in lists))
        bucket = 8
        while bucket < width:
            bucket *= 2
        bucket = min(bucket, max(1, self.n_blocks - 1))
        bucket = max(bucket, width)  # never truncate real probes
        table = np.full((tiles, bucket), self.dead_block, np.int32)
        for t, blocks in enumerate(lists):
            table[t, : len(blocks)] = blocks
        return table

    # -- search ----------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        nprobe: int,
        q_block: int = 8,
        query_mask: np.ndarray | None = None,
        interpret: bool | None = None,
        plan: str = "host",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Cluster-pruned top-k. Returns (scores [Q,k], ORIGINAL dense
        row ids [Q,k]; unfilled slots -1). ``query_mask`` ([Q] uint32)
        enables exact category filtering inside the probed blocks.

        ``plan="device"`` fuses probe + block planning + the pruned scan
        into ONE dispatch (no host synchronization — the host path pays
        a full tunnel round trip fetching probe results before it can
        plan, IVF_r04.json). Covers the same candidate rows, so results
        match the host planner exactly."""
        if self._device_values is None:
            self.to_device()
        q = np.asarray(queries, np.float32)
        qn = q.shape[0]
        pad = (-qn) % q_block
        if pad:
            # replicate the last query: pad tiles then share its probe
            # set instead of dragging arbitrary clusters into the union
            q = np.concatenate([q, np.repeat(q[-1:], pad, axis=0)])
            if query_mask is not None:
                query_mask = np.concatenate(
                    [query_mask, np.repeat(query_mask[-1:], pad)]
                )
        qd = jnp.asarray(q)
        if plan == "device":
            vals, local = self._search_device(
                qd, k, nprobe=nprobe, q_block=q_block,
                query_mask=query_mask, interpret=interpret,
            )
        elif plan == "host":
            cids = self.probe(qd, nprobe)
            table = self.plan_blocks(cids, q_block)
            vals, local = self._search_table(
                qd, table, k, n_valid=self.n_valid, block_rows=self.block_rows,
                q_block=q_block, query_mask=query_mask, interpret=interpret,
            )
        else:
            raise ValueError(f"unknown plan mode {plan!r}")
        vals = np.asarray(vals)[:qn]
        local = np.asarray(local)[:qn]
        rows = np.where(
            local >= 0,
            self.perm[np.clip(local, 0, self.n_valid - 1)],
            np.int64(-1),
        )
        return vals, rows

    def search_dispatch(
        self,
        queries: np.ndarray,
        k: int,
        *,
        nprobe: int,
        q_block: int = 8,
        query_mask: np.ndarray | None = None,
        interpret: bool | None = None,
    ):
        """Device-planned search WITHOUT fetching: returns a
        ``finish() -> (scores, ORIGINAL rows)`` closure, so callers can
        pipeline dispatch/fetch exactly like the flat path (the serving
        micro-batcher's protocol — engine.search_embeddings_dispatch).

        ``queries`` may be a DEVICE array (the engine's device window
        handoff): it is never fetched to host here — an np.asarray
        would stall the dispatch thread behind the encoder for a full
        tunnel round trip, the exact sync this path exists to avoid."""
        if self._device_values is None:
            self.to_device()
        on_host = not isinstance(queries, jax.Array)
        q = np.asarray(queries, np.float32) if on_host else queries
        qn = q.shape[0]
        pad = (-qn) % q_block
        if pad:
            # replicate the last query so pad tiles share its probe set
            if on_host:
                q = np.concatenate([q, np.repeat(q[-1:], pad, axis=0)])
            else:
                q = jnp.concatenate(
                    [q, jnp.repeat(q[-1:], pad, axis=0)]).astype(jnp.float32)
            if query_mask is not None:
                query_mask = np.concatenate(
                    [query_mask, np.repeat(query_mask[-1:], pad)]
                )
        vals, local = self._search_device(
            jnp.asarray(q, jnp.float32), k, nprobe=nprobe, q_block=q_block,
            query_mask=query_mask, interpret=interpret,
        )

        def finish() -> tuple[np.ndarray, np.ndarray]:
            v = np.asarray(vals)[:qn]
            l = np.asarray(local)[:qn]
            rows = np.where(
                l >= 0, self.perm[np.clip(l, 0, self.n_valid - 1)], np.int64(-1)
            )
            return v, rows

        return finish

    def _search_device(
        self,
        qd: jnp.ndarray,
        k: int,
        *,
        nprobe: int,
        q_block: int,
        query_mask: np.ndarray | None = None,
        interpret: bool | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Single-dispatch device-planned search (device arrays
        returned un-fetched; LOCAL row ids)."""
        kw: dict = {}
        if query_mask is not None:
            if self._device_masks is None:
                raise ValueError("IVF index has no row masks; rebuild with categories")
            kw["row_masks"] = self._device_masks
            kw["query_mask"] = jnp.asarray(
                np.asarray(query_mask).astype(np.int32)
            )
        if self.dtype == "int8":
            kw["scales"] = self._device_scales
        return ivf_topk_device(
            self._device_values, self._device_cb, self._device_centroids,
            qd, k, nprobe=nprobe, n_valid=self.n_valid,
            block_rows=self.block_rows, q_block=q_block,
            interpret=interpret, **kw,
        )

    def _search_table(
        self,
        qd: jnp.ndarray,
        table: np.ndarray,
        k: int,
        *,
        n_valid: int,
        block_rows: int,
        q_block: int,
        query_mask: np.ndarray | None = None,
        interpret: bool | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Dispatch the pruned kernel for a prepared block table (device
        arrays returned un-fetched; LOCAL row ids). Split out so callers
        can pipeline probe/plan/kernel and time them separately."""
        kw = dict(
            n_valid=n_valid, block_rows=block_rows,
            q_block=q_block, interpret=interpret,
        )
        if query_mask is not None:
            if self._device_masks is None:
                raise ValueError("IVF index has no row masks; rebuild with categories")
            qm = jnp.asarray(np.asarray(query_mask).astype(np.int32))
            if self.dtype == "int8":
                return ivf_topk_int8_masked(
                    self._device_values, self._device_scales,
                    self._device_masks, qm, table, qd, k, **kw,
                )
            return ivf_topk_masked(
                self._device_values, self._device_masks, qm, table, qd, k, **kw
            )
        if self.dtype == "int8":
            return ivf_topk_int8(
                self._device_values, self._device_scales, table, qd, k, **kw
            )
        return ivf_topk(self._device_values, table, qd, k, **kw)
