"""Multi-chip sharded search: shard-local top-k + ICI all_gather merge.

BASELINE configs[5]: the index lives row-sharded across the mesh; each
chip scans only its HBM shard (optionally with the Pallas fused kernel),
produces k local candidates per query, and the tiny [nd, Q, k] candidate
tensor is all_gathered over ICI and merged — per query the global top-k
is exactly the top-k of the union of shard-local top-ks, so the merge is
lossless. Communication is O(nd·Q·k), independent of corpus size.

Implemented with ``shard_map`` so the collective placement is explicit;
the same function runs on the 8-device CPU simulation mesh in tests and
on a real v5e-8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from arxiv_rag_tpu.parallel.mesh import DATA_AXIS


def _local_scan_xla(shard, queries, row_offset, n_valid, k,
                    row_masks=None, query_mask=None):
    """Per-shard exact scan with padding-row + category masking (XLA)."""
    from arxiv_rag_tpu.ops.topk import matmul_precision

    scores = jnp.dot(
        queries.astype(shard.dtype),
        shard.T,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(shard.dtype),
    )
    n_rows = shard.shape[0]
    gids = row_offset + jnp.arange(n_rows, dtype=jnp.int32)
    valid = (gids < n_valid)[None, :]
    if row_masks is not None and query_mask is not None:
        eligible = (row_masks[None, :] & query_mask[:, None]) != 0
        valid = jnp.logical_and(valid, eligible)
    scores = jnp.where(valid, scores, -jnp.inf)
    vals, ids = jax.lax.top_k(scores, min(k, n_rows))
    if k > n_rows:
        pad = ((0, 0), (0, k - n_rows))
        vals = jnp.pad(vals, pad, constant_values=-jnp.inf)
        ids = jnp.pad(ids, pad, constant_values=0)
    out_ids = jnp.where(jnp.isfinite(vals), gids[ids], -1)
    return vals, out_ids


def sharded_topk(
    index_sharded: jax.Array,
    queries: jax.Array,
    k: int,
    mesh: Mesh,
    *,
    n_valid: int | None = None,
    axis_name: str = DATA_AXIS,
    use_pallas: bool | None = None,
    block_rows: int | None = None,
    row_masks: jax.Array | None = None,
    query_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded index. Returns replicated
    (values [Q,k], global ids [Q,k]).

    ``row_masks`` ([N] int32 bitmask, row-sharded like the index) with
    ``query_mask`` ([Q] int32, replicated) enables per-category
    filtering on the sharded path (XLA scan; the fused masked kernel
    inside shard_map is a later optimization).
    """
    total_rows = index_sharded.shape[0]
    if n_valid is None:
        n_valid = total_rows
    nd = mesh.shape[axis_name]
    shard_rows = total_rows // nd
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if block_rows is None:
        from arxiv_rag_tpu.ops.pallas_topk import _auto_block_rows

        block_rows = _auto_block_rows(queries.shape[0], None)
    masked = row_masks is not None and query_mask is not None
    if masked:
        use_pallas = False  # masked sharded path: XLA scan

    def local(shard, q, *mask_args):
        me = jax.lax.axis_index(axis_name)
        offset = (me * shard_rows).astype(jnp.int32)
        if use_pallas:
            # fused kernel masks rows >= local_valid inside the scan
            local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
            vals, ids = _pallas_local(shard, q, k, local_valid, block_rows)
            gids = jnp.where(ids >= 0, ids + offset, -1)
        else:
            rm = mask_args[0] if mask_args else None
            qm = mask_args[1] if mask_args else None
            vals, gids = _local_scan_xla(shard, q, offset, n_valid, k,
                                         row_masks=rm, query_mask=qm)

        # ---- ICI candidate exchange + lossless merge ----
        all_vals = jax.lax.all_gather(vals, axis_name)  # [nd, Q, k]
        all_gids = jax.lax.all_gather(gids, axis_name)
        qn = q.shape[0]
        cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, nd * k)
        cand_gids = jnp.transpose(all_gids, (1, 0, 2)).reshape(qn, nd * k)
        mvals, mpos = jax.lax.top_k(cand_vals, k)
        mgids = jnp.take_along_axis(cand_gids, mpos, axis=1)
        return mvals, mgids

    if masked:
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(), P(axis_name), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return fn(index_sharded, queries, row_masks, query_mask)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return fn(index_sharded, queries)


def _pallas_local(shard, q, k, local_valid, block_rows):
    """Invoke the fused kernel inside shard_map with a traced n_valid."""
    from arxiv_rag_tpu.ops.pallas_topk import _build_call

    qn, d = q.shape
    n_rows = shard.shape[0]
    if n_rows % block_rows:
        pad = (-n_rows) % block_rows
        shard = jnp.pad(shard, ((0, pad), (0, 0)))
    call = _build_call(
        shard.shape[0], d, qn, k, block_rows, shard.dtype, False, False, False
    )
    nvalid = jnp.reshape(local_valid.astype(jnp.int32), (1, 1))
    return call(nvalid, q.astype(shard.dtype), shard)
