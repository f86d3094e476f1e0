"""IVF (cluster-pruned) fused top-k: scan only the probed blocks.

The flat kernel (ops/pallas_topk.py) streams the whole index once per
call and already runs at ~90-100% of the device's HBM read rate — so
the remaining throughput axis is reading FEWER rows. This kernel keeps
the exact same score/merge machinery but makes the scanned block id
*data-dependent*: a prefetched per-query-tile block table (SMEM, via
``pltpu.PrefetchScalarGridSpec``) drives both the x BlockSpec index_map
(so the DMA pipeline fetches the right block ahead of compute) and the
in-kernel global row ids.

Grid = (query tile, probe step) — tile OUTER, because each tile streams
its own probed blocks. The table contract (enforced by
``index/ivf.py``'s planner):

- each row lists the tile's probed block ids sorted ASCENDING (the
  merge's tie-break — earlier-visited wins at equal score — then
  matches lax.top_k's lowest-index-wins over the probed rows);
- rows are padded to ``max_blocks`` with a designated "dead" block id
  whose rows all sit at global ids >= n_valid (they score -inf and can
  never merge), so duplicate pad visits are harmless no-ops.

Queries stay f32-resident (q_block=8 tiles slice on exact f32 sublane
boundaries) and are cast per-slice in-kernel; the int8 path uses the
"row" variant (bf16 compute on int8 storage) — IVF scans are
read/overhead-bound, not MXU-bound, so s8s8's double MAC rate buys
nothing here and its 32-row int8 sublane alignment would force wide
query tiles, destroying the per-tile probe-union sharing that makes
IVF win (see index/ivf.py for the batching analysis).

Capability anchor: the reference ships faiss-cpu/qdrant-client as
unused deps (/root/reference/3-chunks/pipeline/requirements.txt:17,20,
31) and implements no retrieval at all; this supplies the ANN tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arxiv_rag_tpu.ops.pallas_topk import (
    _aot_or_jit,
    _interpret_default,
    _pad_rows,
    _topk_kernel,
    _trim,
)

# the kernel body these jits trace lives in pallas_topk — AOT payloads
# must also be invalidated when THAT file changes
from arxiv_rag_tpu.ops import aot as _aot

_aot.register_source_deps(__name__, ("arxiv_rag_tpu.ops.pallas_topk",))


def _ivf_kernel(blkids_ref, nvalid_ref, q_ref, x_ref, *rest, **params):
    # PrefetchScalarGridSpec delivers the prefetch operand first; hand
    # it to the shared kernel as the IVF block table.
    _topk_kernel(
        nvalid_ref, q_ref, x_ref, *rest, _blkids_ref=blkids_ref,
        q_f32_cast=True, **params,
    )


def _build_ivf_call(
    n_rows: int,
    d: int,
    qn: int,
    k: int,
    block_rows: int,
    x_dtype,
    use_mask: bool,
    use_int8: bool,
    interpret: bool,
    q_block: int,
    max_blocks: int,
    merge_impl: str = "extract",
    dead_block: int | None = None,
):
    if k > 128:
        raise ValueError(
            f"fused top-k holds at most k=128 candidates per query in its "
            f"VMEM scratch (got k={k}); run the flat XLA scan for larger k "
            f"(the engine's k>128 route)"
        )
    if n_rows % block_rows:
        raise ValueError(
            f"IVF index must be pre-padded to a block multiple "
            f"(got {n_rows} rows, block_rows={block_rows}) — see "
            f"pad_index_for_ivf"
        )
    if not interpret:
        # Mosaic tiling: the values operand blocks (block_rows, d) on the
        # sublane dim (multiple of 8); the [1, n_padded] scale/mask
        # sidecars block (1, block_rows) on the LANE dim, which must be a
        # multiple of 128. Fail here with the layout constraint instead
        # of deep in the Mosaic lowering.
        need = 128 if (use_int8 or use_mask) else 8
        if block_rows % need:
            raise ValueError(
                f"block_rows={block_rows} cannot lower for TPU: the "
                f"{'int8/masked' if need == 128 else 'bf16'} IVF kernel "
                f"needs a multiple of {need} "
                f"({'lane-dim tiling of the [1, N] scale/mask operands' if need == 128 else 'sublane-dim tiling of the value blocks'}); "
                f"use block_rows>=128 (production sweeps favor 1024-4096, "
                f"IVF_r04.json) or interpret=True on CPU"
            )
    if qn % q_block:
        raise ValueError(f"query count {qn} not a multiple of q_block {q_block}")
    num_q_blocks = qn // q_block
    kernel = functools.partial(
        _ivf_kernel,
        k=k,
        block_rows=block_rows,
        q_block=q_block,
        use_mask=use_mask,
        use_int8=use_int8,
        int8_mode="row",
        merge_impl=merge_impl,
        dead_block=dead_block,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # nvalid (1,1)
        pl.BlockSpec((qn, d), lambda qb, i, blk: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (block_rows, d),
            lambda qb, i, blk: (blk[qb, i], 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if use_int8:
        in_specs += [
            pl.BlockSpec(
                (1, block_rows),
                lambda qb, i, blk: (0, blk[qb, i]),
                memory_space=pltpu.VMEM,
            ),
        ]
    if use_mask:
        in_specs += [
            pl.BlockSpec(
                (1, block_rows),
                lambda qb, i, blk: (0, blk[qb, i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((qn, 1), lambda qb, i, blk: (0, 0), memory_space=pltpu.VMEM),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_q_blocks, max_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((q_block, k), lambda qb, i, blk: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda qb, i, blk: (qb, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn, 128), jnp.float32),
            pltpu.VMEM((qn, 128), jnp.int32),
        ],
    )
    # probed traffic, not full-index traffic — tells XLA's scheduler the
    # truth about this call's cost
    touched = num_q_blocks * max_blocks * block_rows
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_block * d * touched,
            bytes_accessed=touched * d * np.dtype(x_dtype).itemsize + qn * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def pad_index_for_ivf(
    values: np.ndarray, block_rows: int, scales: np.ndarray | None = None,
    row_masks: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray | None, int]:
    """Pad rows to a block multiple PLUS one all-zero "dead" block (the
    block-table pad target — its rows sit past n_valid, score -inf, and
    never merge). Returns (values, scales, row_masks, dead_block_id)."""
    n = values.shape[0]
    pad = (-n) % block_rows + block_rows  # tail align + one dead block
    values = np.pad(values, ((0, pad), (0, 0)))
    if scales is not None:
        scales = np.pad(scales, (0, pad))
    if row_masks is not None:
        row_masks = np.pad(row_masks, (0, pad))
    n_blocks = values.shape[0] // block_rows
    return values, scales, row_masks, n_blocks - 1


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_block", "interpret", "merge")
)
def _ivf_topk_jit(index, blkids, queries, nvalid, k, block_rows, q_block,
                  interpret, merge="extract"):
    queries = _pad_rows(queries.astype(jnp.float32), q_block)
    qn, d = queries.shape
    assert blkids.shape[0] == qn // q_block, (
        f"block table rows {blkids.shape[0]} != query tiles {qn // q_block}"
    )
    call = _build_ivf_call(
        index.shape[0], d, qn, k, block_rows, index.dtype, False, False,
        interpret, q_block, blkids.shape[1], merge_impl=merge,
    )
    return call(blkids, nvalid, queries, index)


def ivf_topk(
    index: jnp.ndarray,
    blkids: np.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int,
    block_rows: int,
    q_block: int = 8,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster-pruned fused top-k over a pre-padded ``index`` (f32/bf16,
    see :func:`pad_index_for_ivf`). ``blkids`` [n_qtiles, max_blocks]
    int32 per-tile probed block ids (ascending, dead-block padded).
    Returns (values [Q,k], LOCAL row ids [Q,k]) — ids index the
    reordered IVF layout; callers map back through the permutation.
    Unfilled slots (fewer probed rows than k) are (-inf, -1)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    nvalid = np.full((1, 1), n_valid, np.int32)
    vals, ids = _aot_or_jit(
        "ivf_topk", _ivf_topk_jit,
        (index, jnp.asarray(blkids, jnp.int32), queries, nvalid),
        dict(k=k, block_rows=block_rows, q_block=q_block,
             interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_block", "interpret", "merge")
)
def _ivf_topk_int8_jit(values, scales, blkids, queries, nvalid, k, block_rows,
                       q_block, interpret, merge="extract"):
    queries = _pad_rows(queries.astype(jnp.float32), q_block)
    qn, d = queries.shape
    assert blkids.shape[0] == qn // q_block
    call = _build_ivf_call(
        values.shape[0], d, qn, k, block_rows, jnp.int8, False, True,
        interpret, q_block, blkids.shape[1], merge_impl=merge,
    )
    return call(blkids, nvalid, queries, values, scales.reshape(1, -1))


def ivf_topk_int8(
    values: jnp.ndarray,
    scales: jnp.ndarray,
    blkids: np.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int,
    block_rows: int,
    q_block: int = 8,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8-storage IVF scan ("row" variant: bf16 compute, per-row
    dequant scales — see module docstring for why not s8s8)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    nvalid = np.full((1, 1), n_valid, np.int32)
    vals, ids = _aot_or_jit(
        "ivf_topk_int8", _ivf_topk_int8_jit,
        (values, scales, jnp.asarray(blkids, jnp.int32), queries, nvalid),
        dict(k=k, block_rows=block_rows, q_block=q_block,
             interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_block", "interpret", "merge")
)
def _ivf_topk_int8_masked_jit(values, scales, row_masks, query_mask, blkids,
                              queries, nvalid, k, block_rows, q_block,
                              interpret, merge="extract"):
    queries = _pad_rows(queries.astype(jnp.float32), q_block)
    query_mask = _pad_rows(query_mask.reshape(-1, 1), q_block)  # pad: mask 0
    qn, d = queries.shape
    assert blkids.shape[0] == qn // q_block
    call = _build_ivf_call(
        values.shape[0], d, qn, k, block_rows, jnp.int8, True, True,
        interpret, q_block, blkids.shape[1], merge_impl=merge,
    )
    return call(
        blkids, nvalid, queries, values, scales.reshape(1, -1),
        row_masks.reshape(1, -1).astype(jnp.int32),
        query_mask.astype(jnp.int32),
    )


def ivf_topk_int8_masked(
    values: jnp.ndarray,
    scales: jnp.ndarray,
    row_masks: jnp.ndarray,
    query_mask: jnp.ndarray,
    blkids: np.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int,
    block_rows: int,
    q_block: int = 8,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8-storage + metadata-filtered IVF scan (both fused)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    nvalid = np.full((1, 1), n_valid, np.int32)
    vals, ids = _aot_or_jit(
        "ivf_topk_int8_masked", _ivf_topk_int8_masked_jit,
        (values, scales, row_masks, query_mask,
         jnp.asarray(blkids, jnp.int32), queries, nvalid),
        dict(k=k, block_rows=block_rows, q_block=q_block,
             interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "q_block", "interpret", "merge")
)
def _ivf_topk_masked_jit(index, row_masks, query_mask, blkids, queries, nvalid,
                         k, block_rows, q_block, interpret, merge="extract"):
    queries = _pad_rows(queries.astype(jnp.float32), q_block)
    query_mask = _pad_rows(query_mask.reshape(-1, 1), q_block)  # pad: mask 0
    qn, d = queries.shape
    assert blkids.shape[0] == qn // q_block
    call = _build_ivf_call(
        index.shape[0], d, qn, k, block_rows, index.dtype, True, False,
        interpret, q_block, blkids.shape[1], merge_impl=merge,
    )
    return call(
        blkids, nvalid, queries, index,
        row_masks.reshape(1, -1).astype(jnp.int32),
        query_mask.astype(jnp.int32),
    )


def ivf_topk_masked(
    index: jnp.ndarray,
    row_masks: jnp.ndarray,
    query_mask: jnp.ndarray,
    blkids: np.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int,
    block_rows: int,
    q_block: int = 8,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Metadata-filtered IVF scan (row bitmask & query bitmask != 0,
    same exact-filter semantics as fused_topk_masked). ``row_masks``
    must be in IVF (reordered, padded) row order."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    nvalid = np.full((1, 1), n_valid, np.int32)
    vals, ids = _aot_or_jit(
        "ivf_topk_masked", _ivf_topk_masked_jit,
        (index, row_masks, query_mask, jnp.asarray(blkids, jnp.int32),
         queries, nvalid),
        dict(k=k, block_rows=block_rows, q_block=q_block,
             interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


# -- device-planned IVF: probe + plan + pruned scan in ONE dispatch --------
#
# The host-planned path above pays a per-call synchronization the flat
# kernel never does: fetch the probe results ([Q, nprobe] ids), plan
# block tables in Python, dispatch. Through a remote-device tunnel that
# fetch is a full round trip (~30 ms healthy, measured seconds when the
# link degrades — IVF_r04.json), which swamps the pruned kernel's own
# 6-10 ms win at 2M rows. Moving the planning INTO the jit removes the
# sync entirely: centroid top-nprobe, cluster→block expansion through a
# precomputed [C, max_blocks_per_cluster] table, sort + duplicate-kill
# (duplicates → dead id, which sorts past every real block id), and the
# scalar-prefetch kernel all trace into one XLA computation — a single
# dispatch, pipelinable exactly like the flat scan. The static-width
# table is dead-padded ~2-4x wider than the host planner's exact union,
# but dead visits are gated in the kernel (see _topk_kernel's
# ``dead_block``) and their repeated dead-block DMA is elided by the
# pipeline's unchanged-block-index check, so padding costs grid
# bookkeeping only.


def cluster_block_table(
    offsets: np.ndarray, block_rows: int, dead_block: int
) -> np.ndarray:
    """[C, maxb] int32: each cluster's covering block ids (ascending),
    dead-padded. ``maxb`` is the widest cluster's block count — the
    static expansion factor of the device planner."""
    off = np.asarray(offsets, np.int64)
    lo = off[:-1] // block_rows
    hi = -(-off[1:] // block_rows)  # exclusive
    counts = np.where(off[1:] > off[:-1], np.maximum(hi - lo, 0), 0)
    maxb = max(1, int(counts.max()))
    steps = np.arange(maxb, dtype=np.int64)[None, :]
    table = lo[:, None] + steps
    table = np.where(steps < counts[:, None], table, dead_block)
    return table.astype(np.int32)


def _device_plan(cids, cb, dead: int, q_block: int, width: int):
    """[tiles, width] block table, traced: gather each tile's clusters'
    covering blocks, sort, kill duplicates (dup → dead id, re-sort —
    dead is the LARGEST block id so reals stay ascending up front,
    preserving the merge's earlier-visited-wins tie contract)."""
    qn = cids.shape[0]
    tiles = qn // q_block
    blocks = cb[cids.reshape(tiles, -1)]  # [tiles, q_block*nprobe, maxb]
    flat = jnp.sort(blocks.reshape(tiles, -1), axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((tiles, 1), bool), flat[:, 1:] == flat[:, :-1]], axis=1
    )
    flat = jnp.sort(jnp.where(dup, dead, flat), axis=1)
    return flat[:, :width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "block_rows", "q_block", "width", "dead",
        "interpret", "merge",
    ),
)
def _ivf_topk_device_jit(
    values, cb, centroids, queries, nvalid, scales, row_masks, query_mask,
    k, nprobe, block_rows, q_block, width, dead, interpret, merge="extract",
):
    from arxiv_rag_tpu.ops.topk import flat_search

    queries = queries.astype(jnp.float32)
    qn, d = queries.shape
    _, cids = flat_search(centroids, queries, nprobe)
    table = _device_plan(cids, cb, dead, q_block, width)
    use_int8 = scales is not None
    use_mask = row_masks is not None
    call = _build_ivf_call(
        values.shape[0], d, qn, k, block_rows, values.dtype, use_mask,
        use_int8, interpret, q_block, width, merge_impl=merge,
        dead_block=dead,
    )
    args = [table, nvalid, queries, values]
    if use_int8:
        args.append(scales.reshape(1, -1))
    if use_mask:
        args.append(row_masks.reshape(1, -1).astype(jnp.int32))
        args.append(query_mask.reshape(-1, 1).astype(jnp.int32))
    return call(*args)


def ivf_topk_device(
    values: jnp.ndarray,
    cb: jnp.ndarray,
    centroids: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    n_valid: int,
    block_rows: int,
    q_block: int = 8,
    scales: jnp.ndarray | None = None,
    row_masks: jnp.ndarray | None = None,
    query_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fully device-resident IVF top-k: one dispatch, no host planning.

    ``cb`` is :func:`cluster_block_table` on device; ``queries`` must
    already be padded to a ``q_block`` multiple (callers replicate the
    last query so pad tiles share its probe set). Covers exactly the
    same candidate rows as the host planner (the union of the probed
    clusters' covering blocks), so results match ``ivf_topk*`` exactly.
    Returns (values [Q,k], LOCAL row ids [Q,k]).
    """
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    if qn % q_block:
        raise ValueError(f"query count {qn} not a multiple of q_block {q_block}")
    n_blocks = values.shape[0] // block_rows
    dead = n_blocks - 1
    nprobe = min(nprobe, cb.shape[0])
    width = max(1, min(q_block * nprobe * cb.shape[1], n_blocks - 1))
    nvalid = np.full((1, 1), n_valid, np.int32)
    vals, ids = _aot_or_jit(
        "ivf_topk_device", _ivf_topk_device_jit,
        (values, cb, centroids, queries, nvalid, scales, row_masks,
         query_mask),
        dict(k=k, nprobe=nprobe, block_rows=block_rows, q_block=q_block,
             width=width, dead=dead, interpret=interpret, merge=_merge),
    )
    return vals, ids
