"""Multi-chip IVF: cluster-partitioned shards + ICI all_gather merge.

The flat sharded route (``parallel/search.py``) streams every shard's
whole HBM slice per call; combining it with IVF multiplies the two
wins — each chip holds only its clusters' rows AND scans only the
probed blocks among them. Because ``IVFIndex`` lays rows out sorted by
cluster id, a shard is simply a CONTIGUOUS slice of the IVF row order:
partitioning clusters into ``nd`` contiguous ranges (balanced by row
count via prefix sums) needs no re-sorting or gather. ``build`` does
materialize one stacked, per-shard-padded host copy of the rows
([nd, rows_pad, D], ≈1x the corpus bytes) so the mesh placement is a
single rectangular device_put — budget for it next to the dense index
when serving multi-GB corpora.

Per call:

- probe runs against the replicated centroid table (tiny);
- the host plans one block table PER SHARD — the union of each query
  tile's probed clusters restricted to that shard's cluster range,
  expressed in shard-LOCAL block ids, dead-block padded to a width
  shared across shards (rectangular [nd, tiles, width] operand,
  row-sharded over the mesh);
- inside ``shard_map`` each chip runs the scalar-prefetch pruned kernel
  (``ops/pallas_ivf.py``) on its slice, offsets local hits into global
  IVF row ids, and the [nd, Q, k] candidates all_gather over ICI and
  merge losslessly (top-k of the union of shard top-ks).

A query tile whose probes all live on other shards scans that shard's
dead block once and contributes only -inf candidates — no special
casing, no host round-trip.

Capability anchor: the reference's unused faiss/qdrant deps
(``/root/reference/3-chunks/pipeline/requirements.txt:17,20,31``) plus
its process-pool-only scale story
(``4-embed/generation/generate_embeddings_parallel.py:205``); neither
composes filtering, quantization, pruning and multi-accelerator fan-out
the way this route does.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from arxiv_rag_tpu.index.ivf import IVFIndex
from arxiv_rag_tpu.ops.pallas_ivf import _build_ivf_call
from arxiv_rag_tpu.ops.pallas_topk import _interpret_default
from arxiv_rag_tpu.parallel.mesh import DATA_AXIS


def partition_clusters(offsets: np.ndarray, nd: int) -> np.ndarray:
    """[nd+1] cluster cut points splitting clusters into contiguous
    ranges with near-equal ROW counts (clusters are unequal; balancing
    on rows balances scan work). ``offsets`` is IVFIndex.offsets."""
    total = int(offsets[-1])
    # ideal boundary for shard s is at s/nd of the rows; searchsorted on
    # the cluster prefix sums snaps it to a cluster edge
    targets = (np.arange(1, nd) * total) // nd
    cuts = np.searchsorted(offsets, targets, side="left")
    cuts = np.concatenate([[0], cuts, [offsets.shape[0] - 1]])
    return np.maximum.accumulate(cuts).astype(np.int64)  # monotone


@dataclass
class ShardedIVF:
    """Cluster-partitioned IVF layout for an ``nd``-way mesh.

    Built from a single-chip :class:`~arxiv_rag_tpu.index.ivf.IVFIndex`
    (holding its own stacked per-shard host copy of the rows — see the
    module docstring for the memory budget); ``search`` returns
    ORIGINAL dense row ids like its single-chip counterpart, so results
    are directly comparable (and tested equal) across chip counts.
    """

    ivf: IVFIndex
    nd: int
    cluster_cuts: np.ndarray  # [nd+1] cluster ranges per shard
    row_starts: np.ndarray  # [nd+1] IVF-row boundaries per shard
    rows_pad: int  # per-shard padded rows (common across shards)
    dead_block: int  # shard-local dead block id (common)
    values: np.ndarray  # [nd, rows_pad, D]
    scales: np.ndarray | None  # [nd, rows_pad]
    row_masks: np.ndarray | None  # [nd, rows_pad]
    _device: dict = field(default_factory=dict, repr=False)

    @property
    def block_rows(self) -> int:
        return self.ivf.block_rows

    @property
    def blocks_per_shard(self) -> int:  # includes the dead block
        return self.rows_pad // self.block_rows

    @classmethod
    def build(cls, ivf: IVFIndex, nd: int) -> "ShardedIVF":
        br = ivf.block_rows
        cuts = partition_clusters(ivf.offsets, nd)
        row_starts = ivf.offsets[cuts].astype(np.int64)
        shard_rows = np.diff(row_starts)
        # tail-align the widest shard, plus one dead block for table pads
        rows_pad = int(-(-shard_rows.max() // br) * br + br)
        d = ivf.values.shape[1]
        values = np.zeros((nd, rows_pad, d), ivf.values.dtype)
        scales = (
            np.zeros((nd, rows_pad), ivf.scales.dtype)
            if ivf.scales is not None else None
        )
        row_masks = (
            np.zeros((nd, rows_pad), ivf.row_masks.dtype)
            if ivf.row_masks is not None else None
        )
        for s in range(nd):
            sl = slice(row_starts[s], row_starts[s + 1])
            m = int(shard_rows[s])
            values[s, :m] = ivf.values[sl]
            if scales is not None:
                scales[s, :m] = ivf.scales[sl]
            if row_masks is not None:
                row_masks[s, :m] = ivf.row_masks[sl]
        return cls(
            ivf=ivf, nd=nd, cluster_cuts=cuts, row_starts=row_starts,
            rows_pad=rows_pad, dead_block=rows_pad // br - 1,
            values=values, scales=scales, row_masks=row_masks,
        )

    # -- planning ---------------------------------------------------------

    def plan_blocks(self, cluster_ids: np.ndarray, q_block: int) -> np.ndarray:
        """[nd, tiles, width] shard-LOCAL block tables (ascending ids,
        dead-padded, width a power of two shared across shards)."""
        qn, _ = cluster_ids.shape
        if qn % q_block:
            raise ValueError(f"{qn} probe rows not a multiple of q_block {q_block}")
        tiles = qn // q_block
        br = self.block_rows
        off = self.ivf.offsets
        cuts, starts = self.cluster_cuts, self.row_starts
        lists: list[list[np.ndarray]] = [[] for _ in range(self.nd)]
        for t in range(tiles):
            cl = np.unique(cluster_ids[t * q_block : (t + 1) * q_block])
            cl = cl[(cl >= 0) & (cl < self.ivf.n_clusters)]
            cl = cl[off[cl + 1] > off[cl]]  # empty clusters cover nothing
            shard_of = np.searchsorted(cuts, cl, side="right") - 1
            for s in range(self.nd):
                cs = cl[shard_of == s]
                if cs.size:
                    lo = (off[cs] - starts[s]) // br
                    hi = -(-(off[cs + 1] - starts[s]) // br)
                    blocks = np.unique(
                        np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]
                                       or [np.zeros(0, np.int64)])
                    )
                else:
                    blocks = np.zeros(0, np.int64)
                lists[s].append(blocks.astype(np.int32))
        width = max(1, max(len(b) for per in lists for b in per))
        bucket = 8
        while bucket < width:
            bucket *= 2
        bucket = min(bucket, max(1, self.blocks_per_shard - 1))
        bucket = max(bucket, width)  # never truncate real probes
        table = np.full((self.nd, tiles, bucket), self.dead_block, np.int32)
        for s in range(self.nd):
            for t, blocks in enumerate(lists[s]):
                table[s, t, : len(blocks)] = blocks
        return table

    # -- device -----------------------------------------------------------

    def _shard_cluster_blocks(self) -> np.ndarray:
        """[nd, C, maxb] int32: cluster → covering SHARD-LOCAL block ids
        on the cluster's home shard, dead elsewhere/for empties — the
        device planner's expansion table (one gather per probed
        cluster, same role as ops.pallas_ivf.cluster_block_table)."""
        off, cuts, starts = self.ivf.offsets, self.cluster_cuts, self.row_starts
        br = self.block_rows
        C = self.ivf.n_clusters
        home = np.searchsorted(cuts, np.arange(C), side="right") - 1
        lo = (off[:-1] - starts[home]) // br
        hi = -(-(off[1:] - starts[home]) // br)
        counts = np.where(off[1:] > off[:-1], np.maximum(hi - lo, 0), 0)
        maxb = max(1, int(counts.max()))
        steps = np.arange(maxb, dtype=np.int64)[None, :]
        blocks = lo[:, None] + steps
        blocks = np.where(steps < counts[:, None], blocks, self.dead_block)
        table = np.full((self.nd, C, maxb), self.dead_block, np.int64)
        table[home, np.arange(C)] = blocks
        return table.astype(np.int32)

    def to_device(self, mesh: Mesh, axis_name: str = DATA_AXIS) -> None:
        """Place the stacked arrays row-sharded on the mesh (one shard
        slice per chip's HBM) and the centroids replicated."""
        key = (id(mesh), axis_name)
        if self._device.get("key") == key:
            return
        sh3 = NamedSharding(mesh, P(axis_name, None, None))
        sh2 = NamedSharding(mesh, P(axis_name, None))
        rep = NamedSharding(mesh, P())
        dev = {"key": key,
               "values": jax.device_put(jnp.asarray(self.values), sh3),
               "centroids": jax.device_put(jnp.asarray(self.ivf.centroids), rep),
               "cb": jax.device_put(
                   jnp.asarray(self._shard_cluster_blocks()), sh3),
               "starts": jax.device_put(
                   jnp.asarray(self.row_starts[:-1, None], jnp.int32), sh2),
               "nvalid": jax.device_put(
                   jnp.asarray(np.diff(self.row_starts)[:, None], jnp.int32),
                   sh2)}
        if self.scales is not None:
            dev["scales"] = jax.device_put(jnp.asarray(self.scales), sh2)
        if self.row_masks is not None:
            dev["masks"] = jax.device_put(
                jnp.asarray(self.row_masks.astype(np.int32)), sh2)
        self._device = dev

    def probe(self, queries: jnp.ndarray, nprobe: int) -> np.ndarray:
        from arxiv_rag_tpu.ops.topk import flat_search

        nprobe = min(nprobe, self.ivf.n_clusters)
        _, cids = flat_search(self._device["centroids"], queries, nprobe)
        return np.asarray(cids)

    # -- search -----------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int,
        mesh: Mesh,
        *,
        nprobe: int,
        q_block: int = 8,
        query_mask: np.ndarray | None = None,
        axis_name: str = DATA_AXIS,
        interpret: bool | None = None,
        plan: str = "host",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Mesh-wide cluster-pruned top-k. Returns (scores [Q,k],
        ORIGINAL dense row ids [Q,k]; unfilled slots -1).

        ``plan="device"`` traces the probe and each shard's block
        planning inside the shard_map (one collective dispatch, no host
        synchronization — the same rationale as the single-chip
        device-planned path, IVF_r04.json); covers the same candidate
        rows per shard, so results match the host planner exactly."""
        if interpret is None:
            interpret = _interpret_default()
        self.to_device(mesh, axis_name)
        # device-array queries (the engine's device window handoff) are
        # never fetched to host — re-placement onto the mesh is a
        # device-side transfer
        on_host = not isinstance(queries, jax.Array)
        q = np.asarray(queries, np.float32) if on_host else queries
        qn = q.shape[0]
        pad = (-qn) % q_block
        if pad:
            # replicate the last query so pad tiles share its probe set
            if on_host:
                q = np.concatenate([q, np.repeat(q[-1:], pad, axis=0)])
            else:
                q = jnp.concatenate([q, jnp.repeat(q[-1:], pad, axis=0)])
            if query_mask is not None:
                query_mask = np.concatenate(
                    [query_mask, np.repeat(query_mask[-1:], pad)])
        qd = jax.device_put(
            jnp.asarray(q, jnp.float32), NamedSharding(mesh, P()))
        if plan == "device":
            vals, gids = self._dispatch_device(
                qd, k, mesh, nprobe=nprobe, q_block=q_block,
                query_mask=query_mask, axis_name=axis_name,
                interpret=interpret,
            )
        elif plan == "host":
            cids = self.probe(qd, nprobe)
            table = self.plan_blocks(cids, q_block)
            table_d = jax.device_put(
                jnp.asarray(table),
                NamedSharding(mesh, P(axis_name, None, None)))
            vals, gids = self._dispatch(
                qd, table_d, k, mesh, q_block=q_block, query_mask=query_mask,
                axis_name=axis_name, interpret=interpret,
            )
        else:
            raise ValueError(f"unknown plan mode {plan!r}")
        vals = np.asarray(vals)[:qn]
        gids = np.asarray(gids)[:qn]
        rows = np.where(
            gids >= 0,
            self.ivf.perm[np.clip(gids, 0, self.ivf.n_valid - 1)],
            np.int64(-1),
        )
        return vals, rows

    def _dispatch_device(self, qd, k, mesh, *, nprobe, q_block, query_mask,
                         axis_name, interpret):
        """Device-planned shard_map dispatch: each shard probes (the
        replicated centroid top-nprobe — redundant per-chip compute,
        trivially small), expands its probed clusters through its
        shard-local [C, maxb] block table, sort/dup-kills into the
        static-width prefetch table, and runs the dead-gated kernel."""
        nprobe = min(nprobe, self.ivf.n_clusters)
        maxb = self._device["cb"].shape[2]
        width = max(1, min(q_block * nprobe * maxb, self.blocks_per_shard - 1))
        return self._shard_dispatch(
            qd, k, mesh, q_block=q_block, query_mask=query_mask,
            axis_name=axis_name, interpret=interpret, width=width,
            nprobe=nprobe,
        )

    def _dispatch(self, qd, table_d, k, mesh, *, q_block, query_mask,
                  axis_name, interpret):
        """Host-planned shard_map dispatch: the prepared [nd, tiles,
        width] block table rides as a sharded scalar-prefetch operand."""
        return self._shard_dispatch(
            qd, k, mesh, q_block=q_block, query_mask=query_mask,
            axis_name=axis_name, interpret=interpret,
            width=table_d.shape[2], table_d=table_d,
        )

    def _shard_dispatch(self, qd, k, mesh, *, q_block, query_mask, axis_name,
                        interpret, width, table_d=None, nprobe=None):
        """Common shard_map body for both planners: pruned kernel +
        global-id offset + ICI all_gather + lossless merge (device
        arrays returned un-fetched; GLOBAL IVF row ids). The planners
        differ only in where the block table comes from — a sharded
        operand (host plan) or a per-shard trace of probe + expansion
        (device plan, ``nprobe`` set)."""
        from arxiv_rag_tpu.ops.pallas_ivf import _device_plan
        from arxiv_rag_tpu.ops.topk import flat_search

        device_plan = table_d is None
        use_int8 = self.scales is not None
        use_mask = query_mask is not None
        if use_mask and self.row_masks is None:
            raise ValueError("IVF index has no row masks; rebuild with categories")
        dev = self._device
        qn, d = qd.shape
        br, rows_pad = self.block_rows, self.rows_pad
        dead = self.dead_block

        def local(q, starts, nvalid, *rest):
            rest = list(rest)
            if device_plan:
                cents, cb = rest.pop(0), rest.pop(0)[0]
            else:
                table = rest.pop(0)[0]
            values = rest.pop(0)[0]  # [rows_pad, D]
            scales = rest.pop(0)[0] if use_int8 else None
            masks = rest.pop(0)[0] if use_mask else None
            qm = rest.pop(0) if use_mask else None
            if device_plan:
                _, cids = flat_search(cents, q, nprobe)
                table = _device_plan(cids, cb, dead, q_block, width)
            call = _build_ivf_call(
                rows_pad, d, qn, k, br, values.dtype, use_mask, use_int8,
                interpret, q_block, width,
                dead_block=dead if device_plan else None,
            )
            args = [table, nvalid.reshape(1, 1), q, values]
            if use_int8:
                args.append(scales.reshape(1, -1))
            if use_mask:
                args.append(masks.reshape(1, -1).astype(jnp.int32))
                args.append(qm.reshape(-1, 1).astype(jnp.int32))
            vals, ids = call(*args)
            gids = jnp.where(ids >= 0, ids + starts.reshape(1, 1), -1)
            all_vals = jax.lax.all_gather(vals, axis_name)  # [nd, Q, k]
            all_gids = jax.lax.all_gather(gids, axis_name)
            cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, -1)
            cand_gids = jnp.transpose(all_gids, (1, 0, 2)).reshape(qn, -1)
            mvals, mpos = jax.lax.top_k(cand_vals, k)
            mgids = jnp.take_along_axis(cand_gids, mpos, axis=1)
            return mvals, mgids

        operands = [qd, dev["starts"], dev["nvalid"]]
        in_specs = [P(), P(axis_name, None), P(axis_name, None)]
        if device_plan:
            operands += [dev["centroids"], dev["cb"]]
            in_specs += [P(), P(axis_name, None, None)]
        else:
            operands.append(table_d)
            in_specs.append(P(axis_name, None, None))
        operands.append(dev["values"])
        in_specs.append(P(axis_name, None, None))
        if use_int8:
            operands.append(dev["scales"])
            in_specs.append(P(axis_name, None))
        if use_mask:
            operands.append(dev["masks"])
            in_specs.append(P(axis_name, None))
            qm = jnp.asarray(np.asarray(query_mask).astype(np.int32))
            operands.append(jax.device_put(qm, NamedSharding(mesh, P())))
            in_specs.append(P())
        fn = shard_map(
            local, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(P(), P()), check_rep=False,
        )
        return fn(*operands)
