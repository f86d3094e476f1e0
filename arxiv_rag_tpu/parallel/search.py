"""Multi-chip sharded search: shard-local top-k + ICI all_gather merge.

BASELINE configs[5]: the index lives row-sharded across the mesh; each
chip scans only its HBM shard — with the Pallas fused kernel in every
variant (plain / masked / int8 / int8+masked), falling back to the XLA
scan off-TPU — produces k local candidates per query, and the tiny
[nd, Q, k] candidate tensor is all_gathered over ICI and merged — per
query the global top-k is exactly the top-k of the union of shard-local
top-ks, so the merge is lossless. Communication is O(nd·Q·k),
independent of corpus size.

Implemented with ``shard_map`` so the collective placement is explicit;
the same function runs on the 8-device CPU simulation mesh in tests
(kernels in interpret mode) and compiled on a real v5e.

Reference anchor: the retrieval config the reference never implemented
(``3-chunks/pipeline/config.yaml:62-69``) combined with its per-category
metadata (BASELINE configs[4]+[5]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from arxiv_rag_tpu.parallel.mesh import DATA_AXIS


def _local_scan_xla(shard, queries, row_offset, n_valid, k,
                    row_masks=None, query_mask=None, scales=None):
    """Per-shard exact scan with padding-row + category masking (XLA)."""
    from arxiv_rag_tpu.ops.topk import matmul_precision

    if scales is not None:
        # int8 storage, bf16 compute (same recipe as the fused kernel)
        raw = jnp.dot(
            queries.astype(jnp.bfloat16),
            shard.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        scores = raw * scales[None, :]
    else:
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


def _pallas_local(shard, q, k, local_valid, block_rows,
                  row_masks=None, query_mask=None, scales=None,
                  interpret=False, int8_variant="s8s8"):
    """Invoke the fused kernel inside shard_map with a traced n_valid.

    Handles all four variants; shard-local row padding to a block
    multiple pads masks with 0 (ineligible) and scales with 0.

    The int8 path defaults to the "s8s8" scoring mode (queries quantized
    per-row to int8, native s8xs8->s32 MXU matmul at double MAC rate —
    the single-chip default since round 3, +15% @Q=512). The per-query
    dequant scale is computed here, inside shard_map, from the
    replicated query tile, so every chip derives identical scales with
    no extra operand crossing the shard_map boundary.
    ``int8_variant="row"`` keeps the bf16-compute path (no query
    quantization) for A/B parity.
    """
    from arxiv_rag_tpu.ops.pallas_topk import _build_call

    qn, d = q.shape
    n_rows = shard.shape[0]
    pad = (-n_rows) % block_rows
    if pad:
        shard = jnp.pad(shard, ((0, pad), (0, 0)))
        if row_masks is not None:
            row_masks = jnp.pad(row_masks, (0, pad))
        if scales is not None:
            scales = jnp.pad(scales, (0, pad))
    use_int8 = scales is not None
    use_mask = row_masks is not None and query_mask is not None
    nvalid = jnp.reshape(local_valid.astype(jnp.int32), (1, 1))
    if use_int8 and int8_variant == "s8s8":
        qf = q.astype(jnp.float32)
        qs = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        call = _build_call(
            shard.shape[0], d, qn, k, block_rows, jnp.int8,
            use_mask, True, interpret, int8_mode="s8s8",
        )
        args = [nvalid, q8, shard, scales.reshape(1, -1), qs]
    else:
        call = _build_call(
            shard.shape[0], d, qn, k, block_rows, shard.dtype,
            use_mask, use_int8, interpret,
        )
        args = [nvalid, q.astype(jnp.bfloat16 if use_int8 else shard.dtype),
                shard]
        if use_int8:
            args.append(scales.reshape(1, -1))
    if use_mask:
        args.append(row_masks.reshape(1, -1).astype(jnp.int32))
        args.append(query_mask.reshape(-1, 1).astype(jnp.int32))
    return call(*args)


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
    scales: jax.Array | None = None,
    interpret: bool | None = None,
    int8_variant: str = "s8s8",
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded index. Returns replicated
    (values [Q,k], global ids [Q,k]).

    ``row_masks`` ([N] int32 bitmask, row-sharded like the index) with
    ``query_mask`` ([Q] int32, replicated) enables per-category
    filtering; ``scales`` ([N] f32, row-sharded) marks an int8-storage
    index. Every combination runs the fused Pallas kernel when
    ``use_pallas`` (default: on TPU backends).

    ``int8_variant`` ("s8s8" default, matching the single-chip
    :func:`~arxiv_rag_tpu.ops.pallas_topk.fused_topk_int8` default since
    round 3) selects the int8 scoring path on the Pallas route; "row"
    keeps bf16 compute. The XLA fallback always scores in "row" mode
    (bf16 compute) — scores there may differ from s8s8 by the query
    quantization error (well under the index's own int8 error).
    """
    total_rows = index_sharded.shape[0]
    if n_valid is None:
        n_valid = total_rows
    nd = mesh.shape[axis_name]
    shard_rows = total_rows // nd
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if interpret is None:
        interpret = not on_tpu

    masked = row_masks is not None and query_mask is not None
    int8 = scales is not None
    qn_real = queries.shape[0]
    # sublane-aligned query tiles for the fused kernel: int8 (s8s8)
    # queries need 32-row alignment, bf16/f32 need 8
    q_align = 32 if (int8 and int8_variant == "s8s8" and use_pallas) else 8
    if qn_real % q_align:
        pad = (-qn_real) % q_align
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        if masked:
            query_mask = jnp.pad(query_mask, (0, pad))  # pad rows ineligible
    if block_rows is None and use_pallas:
        from arxiv_rag_tpu.ops.pallas_topk import _auto_block_rows

        block_rows = _auto_block_rows(
            queries.shape[0], None, queries.shape[1],
            1 if int8 else jnp.dtype(index_sharded.dtype).itemsize,
        )

    def local(shard, q, *rest):
        rest = list(rest)
        shard_scales = rest.pop(0) if int8 else None
        rm = rest.pop(0) if masked else None
        qm = rest.pop(0) if masked else None
        me = jax.lax.axis_index(axis_name)
        offset = (me * shard_rows).astype(jnp.int32)
        if use_pallas:
            # fused kernel masks rows >= local_valid inside the scan
            local_valid = jnp.clip(n_valid - offset, 0, shard_rows)
            vals, ids = _pallas_local(
                shard, q, k, local_valid, block_rows,
                row_masks=rm, query_mask=qm, scales=shard_scales,
                interpret=interpret, int8_variant=int8_variant,
            )
            gids = jnp.where(ids >= 0, ids + offset, -1)
        else:
            vals, gids = _local_scan_xla(
                shard, q, offset, n_valid, k,
                row_masks=rm, query_mask=qm, scales=shard_scales,
            )

        # ---- ICI candidate exchange + lossless merge ----
        all_vals = jax.lax.all_gather(vals, axis_name)  # [nd, Q, k]
        all_gids = jax.lax.all_gather(gids, axis_name)
        qn = q.shape[0]
        cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, nd * k)
        cand_gids = jnp.transpose(all_gids, (1, 0, 2)).reshape(qn, nd * k)
        mvals, mpos = jax.lax.top_k(cand_vals, k)
        mgids = jnp.take_along_axis(cand_gids, mpos, axis=1)
        return mvals, mgids

    operands = [index_sharded, queries]
    in_specs = [P(axis_name, None), P()]
    if int8:
        operands.append(scales)
        in_specs.append(P(axis_name))
    if masked:
        operands += [row_masks, query_mask]
        in_specs += [P(axis_name), P()]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_rep=False,
    )
    vals, gids = fn(*operands)
    return vals[:qn_real], gids[:qn_real]
