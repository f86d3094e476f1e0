"""Pallas TPU kernel: fused matmul + streaming top-k flat search.

The QPS-defining kernel (BASELINE configs[3]): scores a query batch
against an HBM-resident index shard block-by-block and maintains a
running top-k in VMEM — the [Q, N] score matrix is never materialized
in HBM (XLA's ``flat_search`` writes it before ``lax.top_k`` reads it
back; at ~2M rows that's the whole bandwidth budget spent twice).

Design:
- 2-D grid: row blocks of ``block_rows`` on the outer axis, query tiles
  of ``q_block`` on the inner (fastest) axis. The index block's
  BlockSpec is constant across the inner axis, so each HBM block is
  fetched ONCE and scored against every query tile while resident in
  VMEM — the index streams exactly once per call regardless of Q, and
  the VMEM merge arrays scale with the query TILE, so ``block_rows``
  no longer shrinks as the query batch grows (the round-1 large-Q
  ceiling: at Q=512 the single-level kernel fell to 512-row blocks and
  lost ~2× to XLA);
- scratch holds per-query-tile top-k values/global-indices padded to
  128 lanes, dynamic-sliced by the query-tile id;
- per (block, tile), a single max-reduction finds the block's best
  score per query; the (VPU-expensive) merge loop runs under
  ``@pl.when`` only if some query's block max beats its current k-th
  score — after warm-up almost every block skips the merge, so steady
  state is HBM-bandwidth-bound: matmul + one reduction per block;
- merge = K max-extraction passes over [QB, block+128] with min-column
  tie-breaking, matching ``lax.top_k``'s lowest-index-wins order
  (scratch columns sit left of the block, and earlier blocks have
  smaller global indices, so ties resolve identically);
- optional per-row uint32 metadata masks (per-cs.*-category filtering,
  BASELINE configs[4]) and an int8-storage variant (bf16 compute, per-
  row scales applied after the matmul) are fused into the same scan;
- rows past ``n_valid`` (shard padding) are forced to -inf, so callers
  can pad shards to a block multiple without recall loss.

Equal-memory recall parity vs the numpy oracle is tested in
tests/test_pallas_topk.py (interpret mode on CPU; compiled on TPU).

Measured regimes (round 3, amortized — see CLAUDE.md on the tunnel
RTT): at small Q the scan is read-bound (bf16 at ~100% of the ones-
matmul read probe; int8 at ~90% of ITS probe — int8 streams ~1.4x
elements/s on this device, not 2x bytes). At serving batch (Q=512) the
kernel is compute-bound (merge VPU + MXU), where the s8xs8->s32 MXU
path ("s8s8", the int8 default) buys +79% over bf16.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # scratch top-k padded to one lane tile
NEG_INF = float(-jnp.inf)
_HUGE_COL = np.int32(2**30)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _topk_kernel(
    # refs (order: scalar-prefetch–like SMEM scalars first, then tensors)
    nvalid_ref,  # SMEM (1,1) int32 — actual row count of this shard
    q_ref,  # VMEM [Q, D] FULL query batch (resident; tiles sliced in-kernel)
    x_ref,  # VMEM [BN, D] index block (bf16/f32) or int8
    *rest,
    k: int,
    block_rows: int,
    q_block: int,
    use_mask: bool,
    use_int8: bool,
    int8_mode: str = "row",
    merge_impl: str = "extract",
    _blkids_ref=None,  # IVF mode: SMEM [n_qtiles, max_blocks] block-id table
    q_f32_cast: bool = False,  # queries resident as f32, cast per-slice
    dead_block: int | None = None,  # device-planned IVF: gate dead visits
):
    if use_int8:
        scales_ref = rest[0]  # [1, BN] f32 row scales
        rest = rest[1:]
        if int8_mode == "s8s8":
            qscale_ref = rest[0]  # [Q, 1] f32 per-query dequant scales
            rest = rest[1:]
    if use_mask:
        rowmask_ref = rest[0]  # [1, BN] int32 bitmask
        qmask_ref = rest[1]  # [Q, 1] int32 bitmask (resident, like q)
        rest = rest[2:]
    out_vals_ref, out_idx_ref, svals_ref, sidx_ref = rest

    if _blkids_ref is not None:
        # IVF mode (ops/pallas_ivf.py): the grid is (q tile, probe
        # step) — tile OUTER, because each tile streams its OWN probed
        # blocks; the scanned block id is data-dependent, read from the
        # prefetched per-tile table (which also drives the x BlockSpec
        # index_map, so the DMA pipeline fetches the right block).
        qb = pl.program_id(0)
        step = pl.program_id(1)
        num_steps = pl.num_programs(1)
        blk = _blkids_ref[qb, step]
    else:
        step = pl.program_id(0)  # row block (outer, slow)
        qb = pl.program_id(1)  # query tile (inner, fast — x block resident)
        num_steps = pl.num_programs(0)
        blk = step
    qn = q_block
    srows = pl.dslice(qb * qn, qn)  # this tile's scratch/query rows
    # the FULL query batch sits in VMEM with a constant BlockSpec (it is
    # tiny — Q=512 x 768 bf16 = 786 KB) and tiles are sliced here: a
    # per-tile BlockSpec re-DMAs the same 4 tiles from HBM on every row
    # block (~770 MB of redundant query traffic per 2M-row call at
    # Q=512, ~26% of the index stream)
    q = q_ref[srows, :]
    if q_f32_cast and (use_int8 or x_ref.dtype == jnp.bfloat16):
        # IVF paths keep the resident queries f32 so q_block=8 tiles
        # slice on exact f32 sublane boundaries; cast the slice here
        q = q.astype(jnp.bfloat16)

    @pl.when(step == 0)
    def _init():
        svals_ref[srows, :] = jnp.full((qn, LANES), NEG_INF, jnp.float32)
        sidx_ref[srows, :] = jnp.full((qn, LANES), -1, jnp.int32)

    # Device-planned IVF tables are dead-padded to a static width;
    # a dead visit's rows all sit past n_valid (scores would be
    # -inf and the merge self-skips), but the matmul + masking
    # passes are NOT free at thousands of pad visits per call —
    # gate the whole scoring body so a dead step costs only the
    # grid bookkeeping (its repeated dead-block DMA is elided by
    # the pipeline's unchanged-block-index check).
    def _visit():
        # ---- row-validity folded into [1, BN] operands (round 4) ----
        # ``gidx < nvalid`` is a row-axis property, so the shard-padding
        # mask never needs its own [QB, BN] select pass: int8 paths fold
        # it into the per-row dequant scale (scale 0 + bias -inf), plain
        # paths add a [1, BN]-broadcast bias, and masked paths zero the
        # row bitmask — each replaces the former full-tile
        # ``where(valid, scores, -inf)`` with [1, BN]-cheap ops (the
        # Q=512 regime is VPU-pass-bound; see the cost decomposition in
        # CLAUDE.md). Valid rows add +0.0 (IEEE-exact); invalid rows are
        # finite*0 + -inf = -inf, identical to the old select.
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
        gidx = cols + blk * block_rows  # global row ids of this block
        rowvalid = gidx < nvalid_ref[0, 0]  # [1, BN]
        bias = jnp.where(rowvalid, 0.0, NEG_INF).astype(jnp.float32)

        # ---- score the block on the MXU (fp32 accumulation) ----
        if use_int8 and int8_mode == "s8s8":
            # both operands int8: the MXU's native s8xs8->s32 path (double
            # MAC rate on v5e). Only the per-ROW scale applies here: the
            # per-QUERY scale is constant along the row axis, so it is a
            # monotonic per-query transform that cannot change any ranking —
            # it moves OUT of the per-block hot loop and multiplies the
            # [Q, k] scratch once at finalize (round 4: one fewer [QB, BN]
            # elementwise operand in the 489-blocks-per-call stream).
            raw = jax.lax.dot_general(
                q,
                x_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if use_mask:
                scores = raw.astype(jnp.float32) * scales_ref[:]
            else:
                mscales = jnp.where(rowvalid, scales_ref[:], 0.0)
                scores = raw.astype(jnp.float32) * mscales + bias
        elif use_int8 and int8_mode == "nodequant":
            # PERF PROBE ONLY (recall-broken): same stream, no [QB,BN] scale
            # pass — isolates the VPU dequant cost from the HBM stream
            scores = (
                jax.lax.dot_general(
                    q.astype(jnp.bfloat16),
                    x_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias  # keep n_valid semantics (and the probe's traffic shape)
            )
        elif use_int8:
            # int8 STORAGE, bf16 COMPUTE: the index streams at half the
            # bytes; int8 values are exact in bf16 (8 significand bits),
            # queries stay bf16 (no query quantization error). The s8
            # operand goes to dot_general UNCONVERTED — Mosaic folds the
            # widening into the MXU feed; an explicit .astype(bf16) ran a
            # separate VPU pass over every block (A/B on 2M rows: 920 vs
            # 860 qps, identical results). Still faster than int8×int8→s32
            # with its post-hoc double rescale (round-1 measurement).
            raw = jax.lax.dot_general(
                q.astype(jnp.bfloat16),
                x_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if use_mask:
                scores = raw * scales_ref[:]  # [1,BN] per-row dequant
            else:
                mscales = jnp.where(rowvalid, scales_ref[:], 0.0)
                scores = raw * mscales + bias
        else:
            from arxiv_rag_tpu.ops.topk import matmul_precision

            scores = jax.lax.dot_general(
                q,
                x_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=matmul_precision(x_ref.dtype),
            )
            if not use_mask:
                scores = scores + bias

        if use_mask:
            # fold row validity into the row bitmask ([1, BN], cheap) so
            # shard padding and category filtering share ONE select pass
            rmask = jnp.where(rowvalid, rowmask_ref[:], 0)
            eligible = (rmask & qmask_ref[srows, :]) != 0  # [1,BN]&[QB,1]→[QB,BN]
            scores = jnp.where(eligible, scores, NEG_INF)

        # ---- fast path: skip merge when no query in this tile improves ----
        block_max = jnp.max(scores, axis=1, keepdims=True)  # [QB,1]
        kth = svals_ref[srows, k - 1 : k]  # [QB,1] current k-th best
        if merge_impl == "none":
            # PERF PROBE ONLY (output is the init scratch, recall broken):
            # isolates scan+score+reduce cost from the merge entirely
            needs_merge = block_max[0, 0] < kth[0, 0]
        else:
            needs_merge = jnp.any(block_max > kth)

        @pl.when(needs_merge)
        def _merge():
            # Early-exit extract/insert merge. The scratch is kept SORTED
            # (descending; init satisfies this), so merging a block is:
            # while any query's remaining block max beats its current k-th
            # score, extract that max (lowest column wins ties → matches
            # lax.top_k order) and shift-insert it into the sorted scratch.
            # A query inserts at most k times per block, and on random data
            # the expected trip count is 1-3.
            # MEASURED DEAD END (2026-08-16): gating per 8-query subgroup
            # (scores staged to VMEM scratch, fori_loop of scalar-gated [8,BN]
            # merges) to exploit the ~2% steady-state per-query improve odds
            # was ~14% SLOWER at Q=512 (7035 vs 8186 qps) — the scratch
            # round-trip plus 16 sequential scalar branches cost more than
            # the [QB,BN] VPU passes they avoided. Keep the tile-level merge.
            lane = jax.lax.broadcasted_iota(jnp.int32, (qn, LANES), 1)

            def insert(sv, si, m, g, improve):
                # insertion rank: after existing >= entries (earlier blocks /
                # earlier extractions have smaller global ids, so ties keep
                # lax.top_k's lowest-index-first order)
                pos = jnp.sum((sv >= m).astype(jnp.int32), axis=1, keepdims=True)
                shifted_v = jnp.concatenate([sv[:, :1], sv[:, :-1]], axis=1)
                shifted_i = jnp.concatenate([si[:, :1], si[:, :-1]], axis=1)
                nv = jnp.where(lane < pos, sv, jnp.where(lane == pos, m, shifted_v))
                ni = jnp.where(lane < pos, si, jnp.where(lane == pos, g, shifted_i))
                return (
                    jnp.where(improve, nv, sv),
                    jnp.where(improve, ni, si),
                )

            if merge_impl == "staged":
                # STAGED extraction — MEASURED NEUTRAL (round 3, amortized
                # A/B on 2M rows): int8@Q=512 18.36 ms BOTH impls, bf16
                # 32.6 extract vs 34.0 staged. The hypothesis (merge's ~5
                # full [QB,BN] passes per extraction dominate Q=512) was
                # WRONG — Mosaic evidently keeps the extract loop cheap, so
                # the Q=512 gap over the read floor is matmul + scoring
                # passes + grid overhead, not the merge. Kept selectable +
                # tested (tie-exact vs extract) as the experiment record;
                # do not flip the default without new evidence.
                # Design: stage per-128-lane-group maxes once ([QB, G], one
                # full pass), run the extraction loop on that small array,
                # and gather only the winning group's lanes per iteration
                # (one full pass). Tie-break parity: groups cover ascending
                # column ranges, so min-group-then-min-lane == min-column.
                n_groups = block_rows // LANES
                qn_ = scores.shape[0]
                gcols = jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
                llane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                segs = [
                    scores[:, g * LANES : (g + 1) * LANES] for g in range(n_groups)
                ]
                gmax = jnp.concatenate(
                    [jnp.max(s, axis=1, keepdims=True) for s in segs], axis=1
                )  # [QB, G]

                def cond(state):
                    gmax, cur_g, cur_gathered, sv, si, m = state
                    return jnp.any(m > sv[:, k - 1 : k])

                def body(state):
                    gmax, cur_g, cur_gathered, sv, si, m = state
                    at_g = gmax == m
                    sel_g = jnp.min(
                        jnp.where(at_g, gcols, _HUGE_COL), axis=1, keepdims=True
                    )  # [QB,1]
                    # gather the selected group's lanes: G row-wise selects
                    # of [QB, 128] = one full [QB, BN]-equivalent pass
                    fresh = jnp.full((qn_, LANES), NEG_INF, jnp.float32)
                    for g in range(n_groups):
                        fresh = jnp.where(sel_g == g, segs[g], fresh)
                    # duplicate-safe reuse: a re-gathered ORIGINAL segment
                    # still holds previously extracted lanes, so an in-group
                    # duplicate of the current max would be re-extracted
                    # forever. The only way a group can be re-selected while
                    # an extracted value still EQUALS its remaining max is
                    # consecutively (leaving a group requires its remaining
                    # max to drop strictly below the extracted value) — so
                    # carrying the masked copy per query and reusing it when
                    # sel_g == cur_g covers every duplicate case.
                    gathered = jnp.where(sel_g == cur_g, cur_gathered, fresh)
                    # a FRESH re-gather of a previously visited group still
                    # holds stale extracted lanes; those are strictly > m
                    # (we only leave a group when its remaining max drops
                    # strictly below every value extracted from it), so
                    # clamping >m to -inf removes exactly the stale lanes —
                    # ==m lanes are genuine duplicates (the consecutive-
                    # reuse case above keeps those correct)
                    gathered = jnp.where(gathered > m, NEG_INF, gathered)
                    hit_l = gathered == m
                    sel_l = jnp.min(
                        jnp.where(hit_l, llane, _HUGE_COL), axis=1, keepdims=True
                    )
                    col = sel_g * LANES + sel_l
                    gid = col + blk * block_rows
                    improve = m > sv[:, k - 1 : k]
                    sv, si = insert(sv, si, m, gid, improve)
                    # mask the extracted lane, refresh that group's max
                    masked = jnp.where(llane == sel_l, NEG_INF, gathered)
                    new_gmax = jnp.max(masked, axis=1, keepdims=True)
                    gmax = jnp.where((gcols == sel_g) & improve, new_gmax, gmax)
                    cur_gathered = jnp.where(improve, masked, gathered)
                    return (gmax, sel_g, cur_gathered, sv, si,
                            jnp.max(gmax, axis=1, keepdims=True))

                qn_ = scores.shape[0]
                _, _, _, sv, si, _ = jax.lax.while_loop(
                    cond, body,
                    (
                        gmax,
                        jnp.full((qn_, 1), -1, jnp.int32),
                        jnp.full((qn_, LANES), NEG_INF, jnp.float32),
                        svals_ref[srows, :],
                        sidx_ref[srows, :],
                        block_max,
                    ),
                )
            elif merge_impl in ("group1", "group2"):
                # GROUP-CACHED extraction. MEASURED DEAD END (2026-08-18,
                # v5e, 2M rows, Q=512, amortized, values EXACT vs extract):
                # bf16 74.7 ms group1 vs 32.9 extract; int8-s8s8 63.3
                # group1 / 95.3 group2 vs 18.9 extract — 2-5x SLOWER, and
                # bf16_group2 failed remote compile outright (tpu_compile_
                # helper exit 1). The premise below (per-trip cost tracks
                # per-trip VPU traffic) is refuted for this family too:
                # the lax.cond scalar-gated refill + [QB, G] bookkeeping
                # dominate. "extract" stays the default everywhere; do not
                # re-attempt group caching without a Mosaic change that
                # gives per-row dynamic addressing.
                # Premise, from the round-3 cost decomposition: the merge
                # costs ~1 us per while-trip ≈ one [QB, BN] VPU pass, and
                # "staged" stayed neutral because its per-trip group
                # GATHER touched the same [QB, BN] traffic. This impl
                # removes the per-trip gather: cache each 128-lane group's
                # top-1 (group1) or top-1+top-2 (group2) once, then run
                # the extraction loop on [QB, G] arrays (G = BN/128, 32x
                # narrower). A group whose cache is consumed goes STALE,
                # carrying an upper BOUND on its remaining lanes (the last
                # value extracted from it — per-group extractions are
                # non-increasing), so winner selection stays sound; only
                # when a stale group actually WINS selection for an
                # improving query does one scalar-gated gather pass
                # refill it. Already-extracted lanes are re-masked
                # exactly: they are precisely the lanes valued > vlast
                # plus the ne lowest-index lanes valued == vlast (global
                # min-column tie-breaking extracts equal values lowest
                # lane first within a group).
                # Tie parity with lax.top_k: groups cover ascending
                # column ranges and l1 is the min lane achieving the
                # group max, so min-group-then-min-lane == min-column.
                if block_rows % LANES:
                    raise ValueError(
                        f"group merges need block_rows % {LANES} == 0 "
                        f"(got {block_rows}); use merge_impl='extract'"
                    )
                n_groups = block_rows // LANES
                qn_ = scores.shape[0]
                gcols = jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
                llane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                segs = [
                    scores[:, g * LANES : (g + 1) * LANES] for g in range(n_groups)
                ]

                def top2_of(seg, want_second):
                    m1 = jnp.max(seg, axis=1, keepdims=True)
                    l1_ = jnp.min(
                        jnp.where(seg == m1, llane, _HUGE_COL), axis=1, keepdims=True
                    )
                    # an all(-inf) group is FRESH with value -inf (lane 0):
                    # it can never win while any finite candidate remains,
                    # and the cond gate keeps it from extracting at all
                    l1_ = jnp.where(m1 == NEG_INF, 0, l1_)
                    if not want_second:
                        return m1, l1_, None, None
                    rest = jnp.where(llane == l1_, NEG_INF, seg)
                    m2 = jnp.max(rest, axis=1, keepdims=True)
                    l2_ = jnp.min(
                        jnp.where(rest == m2, llane, _HUGE_COL), axis=1, keepdims=True
                    )
                    l2_ = jnp.where(m2 == NEG_INF, -1, l2_)  # -1 = no cache
                    return m1, l1_, m2, l2_

                want2 = merge_impl == "group2"
                tops = [top2_of(s, want2) for s in segs]
                v1 = jnp.concatenate([t[0] for t in tops], axis=1)  # [QB,G]
                l1 = jnp.concatenate([t[1] for t in tops], axis=1)
                if want2:
                    v2 = jnp.concatenate([t[2] for t in tops], axis=1)
                    l2 = jnp.concatenate([t[3] for t in tops], axis=1)
                else:
                    v2 = jnp.full((qn_, n_groups), NEG_INF, jnp.float32)
                    l2 = jnp.full((qn_, n_groups), -1, jnp.int32)
                vlast = jnp.full((qn_, n_groups), jnp.inf, jnp.float32)
                ne = jnp.zeros((qn_, n_groups), jnp.int32)
                # strict lower-triangular lane matrix: (eq @ LT)[q, j] =
                # #equal lanes left of j — one tiny MXU matmul per refill
                lt_r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                lt_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                lt = (lt_r < lt_c).astype(jnp.float32)

                def gcond(state):
                    v1, l1, v2, l2, vlast, ne, sv, si = state
                    return jnp.any(
                        jnp.max(v1, axis=1, keepdims=True) > sv[:, k - 1 : k]
                    )

                def gbody(state):
                    v1, l1, v2, l2, vlast, ne, sv, si = state
                    m = jnp.max(v1, axis=1, keepdims=True)  # [QB,1]
                    sel_g = jnp.min(
                        jnp.where(v1 == m, gcols, _HUGE_COL), axis=1, keepdims=True
                    )  # [QB,1]
                    winner = gcols == sel_g  # [QB,G]
                    sel_l1 = jnp.sum(
                        jnp.where(winner, l1, 0), axis=1, keepdims=True
                    )  # [QB,1]
                    stale = sel_l1 < 0
                    improve = m > sv[:, k - 1 : k]  # [QB,1]

                    def refill(caches):
                        v1, l1, v2, l2 = caches
                        fresh = jnp.full((qn_, LANES), NEG_INF, jnp.float32)
                        for g in range(n_groups):
                            fresh = jnp.where(sel_g == g, segs[g], fresh)
                        selv = jnp.max(
                            jnp.where(winner, vlast, NEG_INF), axis=1, keepdims=True
                        )
                        seln = jnp.sum(
                            jnp.where(winner, ne, 0), axis=1, keepdims=True
                        )
                        eq = fresh == selv
                        exc = jax.lax.dot_general(
                            eq.astype(jnp.float32), lt,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        gone = (fresh > selv) | (
                            eq & (exc < seln.astype(jnp.float32))
                        )
                        masked = jnp.where(gone, NEG_INF, fresh)
                        nm1 = jnp.max(masked, axis=1, keepdims=True)
                        nl1 = jnp.min(
                            jnp.where(masked == nm1, llane, _HUGE_COL),
                            axis=1, keepdims=True,
                        )
                        nl1 = jnp.where(nm1 == NEG_INF, 0, nl1)
                        rest = jnp.where(llane == nl1, NEG_INF, masked)
                        nm2 = jnp.max(rest, axis=1, keepdims=True)
                        nl2 = jnp.min(
                            jnp.where(rest == nm2, llane, _HUGE_COL),
                            axis=1, keepdims=True,
                        )
                        nl2 = jnp.where(nm2 == NEG_INF, -1, nl2)
                        upd = winner & stale & improve
                        return (
                            jnp.where(upd, nm1, v1),
                            jnp.where(upd, nl1, l1),
                            jnp.where(upd, nm2, v2),
                            jnp.where(upd, nl2, l2),
                        )

                    v1, l1, v2, l2 = jax.lax.cond(
                        jnp.any(stale & improve),
                        refill,
                        lambda caches: caches,
                        (v1, l1, v2, l2),
                    )
                    # refilled winners extract on the NEXT trip (their v1
                    # may have dropped below another group's); this trip
                    # extracts only queries whose winner was already fresh
                    ext = improve & jnp.logical_not(stale)  # [QB,1]
                    col = sel_g * LANES + sel_l1
                    gid = col + blk * block_rows
                    sv, si = insert(sv, si, m, gid, ext)
                    selv = jnp.max(
                        jnp.where(winner, vlast, NEG_INF), axis=1, keepdims=True
                    )
                    seln = jnp.sum(jnp.where(winner, ne, 0), axis=1, keepdims=True)
                    nne = jnp.where(m == selv, seln + 1, 1)
                    cons = winner & ext  # [QB,G]
                    vlast = jnp.where(cons, m, vlast)
                    ne = jnp.where(cons, nne, ne)
                    # promote the cached second (or go stale with bound m)
                    v1 = jnp.where(cons, jnp.where(l2 >= 0, v2, m), v1)
                    l1 = jnp.where(cons, l2, l1)
                    v2 = jnp.where(cons, NEG_INF, v2)
                    l2 = jnp.where(cons, -1, l2)
                    return (v1, l1, v2, l2, vlast, ne, sv, si)

                _, _, _, _, _, _, sv, si = jax.lax.while_loop(
                    gcond, gbody,
                    (v1, l1, v2, l2, vlast, ne,
                     svals_ref[srows, :], sidx_ref[srows, :]),
                )
            else:
                # "extract" or "extractN": N max-extractions per while-loop
                # trip (bitwise-exact: the body is a fixed point once every
                # query is done — ``improve`` gates the insert and mv masking,
                # so extra trips are vector no-ops). MEASURED DEAD END
                # (2026-08-17, amortized Q=512 on 2M): monotonically WORSE —
                # int8 19.2 (x1) → 25.5 (x4) → 35.9 ms (x8). The merge cost
                # is per-BODY VPU traffic (~1 us ≈ one [QB,BN] sweep per
                # iteration), NOT the cond's scalar sync, so over-stepping
                # pays full price for no-op bodies. x1 (= "extract") is the
                # minimum-body-count member of this family; keep it the
                # default. See CLAUDE.md "Q=512 fused-kernel cost
                # decomposition" for the full model.
                if not merge_impl.startswith("extract"):
                    raise ValueError(f"unknown merge_impl {merge_impl!r}")
                unroll = int(merge_impl[7:] or "1")

                def cond(state):
                    mv, sv, si, m = state
                    return jnp.any(m > sv[:, k - 1 : k])

                def body(state):
                    mv, sv, si, m = state
                    at_max = mv == m
                    sel_col = jnp.min(
                        jnp.where(at_max, cols, _HUGE_COL), axis=1, keepdims=True
                    )
                    hit = cols == sel_col  # [1,BN]==[QB,1] → [QB,BN]
                    g = jnp.sum(jnp.where(hit, gidx, 0), axis=1, keepdims=True)
                    improve = m > sv[:, k - 1 : k]  # [QB,1] per-query gate
                    sv, si = insert(sv, si, m, g, improve)
                    mv = jnp.where(hit & improve, NEG_INF, mv)
                    return mv, sv, si, jnp.max(mv, axis=1, keepdims=True)

                def body_n(state):
                    for _ in range(unroll):
                        state = body(state)
                    return state

                _, sv, si, _ = jax.lax.while_loop(
                    cond, body_n,
                    (scores, svals_ref[srows, :], sidx_ref[srows, :], block_max),
                )
            svals_ref[srows, :] = sv
            sidx_ref[srows, :] = si

    if dead_block is None:
        _visit()
    else:
        pl.when(blk != dead_block)(_visit)

    @pl.when(step == num_steps - 1)
    def _finalize():
        vals = svals_ref[srows, :k]
        if use_int8 and int8_mode == "s8s8":
            # deferred per-query dequant (see the s8s8 score path): the
            # scratch ranks in the qscale-free domain; scale the k
            # survivors only. NEG_INF sentinels stay NEG_INF (qs > 0).
            vals = vals * qscale_ref[srows, :]
        out_vals_ref[:] = vals
        out_idx_ref[:] = sidx_ref[srows, :k]


def _build_call(
    n_rows: int,
    d: int,
    qn: int,
    k: int,
    block_rows: int,
    x_dtype: Any,
    use_mask: bool,
    use_int8: bool,
    interpret: bool,
    q_block: int | None = None,
    int8_mode: str = "row",
    merge_impl: str = "extract",
):
    if k > LANES:
        raise ValueError(
            f"fused top-k holds at most k={LANES} candidates per query "
            f"(got k={k}); use the XLA flat_search path for larger k"
        )
    if q_block is None:
        q_block = _auto_q_block(
            qn, block_rows, d, np.dtype(jnp.dtype(x_dtype)).itemsize
        )
    if qn % q_block:
        raise ValueError(f"query count {qn} not a multiple of q_block {q_block}")
    num_blocks = pl.cdiv(n_rows, block_rows)
    num_q_blocks = qn // q_block
    kernel = functools.partial(
        _topk_kernel,
        k=k,
        block_rows=block_rows,
        q_block=q_block,
        use_mask=use_mask,
        use_int8=use_int8,
        int8_mode=int8_mode,
        merge_impl=merge_impl,
    )
    # inner (fast) grid axis = query tiles: the x block index is constant
    # across it, so Pallas keeps the block resident and the index streams
    # from HBM exactly once per call, independent of Q. The query batch
    # (and query mask) use constant BlockSpecs — fetched ONCE, resident
    # for the whole call, tiles sliced in-kernel (see _topk_kernel note).
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # nvalid (1,1)
        pl.BlockSpec((qn, d), lambda i, qb: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, d), lambda i, qb: (i, 0), memory_space=pltpu.VMEM),
    ]
    if use_int8:
        in_specs += [
            pl.BlockSpec((1, block_rows), lambda i, qb: (0, i), memory_space=pltpu.VMEM),
        ]
        if int8_mode == "s8s8":
            in_specs += [
                pl.BlockSpec((qn, 1), lambda i, qb: (0, 0), memory_space=pltpu.VMEM),
            ]
    if use_mask:
        in_specs += [
            pl.BlockSpec((1, block_rows), lambda i, qb: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, 1), lambda i, qb: (0, 0), memory_space=pltpu.VMEM),
        ]
    flops = 2 * qn * d * n_rows
    return pl.pallas_call(
        kernel,
        grid=(num_blocks, num_q_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((q_block, k), lambda i, qb: (qb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, k), lambda i, qb: (qb, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn, LANES), jnp.float32),
            pltpu.VMEM((qn, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_rows * d * np.dtype(x_dtype).itemsize + qn * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _vmem_need(
    q_block: int, block_rows: int, d: int, itemsize: int, qn: int | None = None
) -> int:
    """Rough scoped-VMEM bytes for one (block, tile) step: the [BN, D]
    input tile plus the merge/score arrays that scale with QB·BN, plus
    the FULL resident query batch and scratch (which scale with Q).

    ``max(itemsize, 2)`` charges the resident queries: every wrapper
    hands the kernel queries at ``max(index_itemsize, 2)`` bytes — the
    int8 path casts them to bf16 before the call
    (``_fused_topk_int8_jit``), f32 paths pass f32 — so the query term
    is exact, not an undercount (round-2 advisor note checked: wrong).
    """
    if qn is None:
        qn = q_block
    return block_rows * (16 * q_block + d * itemsize) + qn * (
        LANES * 16 + d * max(itemsize, 2)
    )


_VMEM_BUDGET = 10_700_000  # bytes of scoped VMEM left for our tensors


def _auto_q_block(
    qn: int, block_rows: int | None = None, d: int = 768, itemsize: int = 2
) -> int:
    """Query-tile height: whole batch up to 64 queries, else the widest
    aligned tile that fits the VMEM budget for the given row block
    (callers may force block_rows — e.g. 128-tile × 4096-block bf16
    overflows and must shrink to 64). Measured on 2M×768 bf16 @ Q=512
    (early-exit merge): 128/2048 10419 qps ≈ 64/4096 10302 > 32/4096
    8622, so wider tiles win once the batch splits."""
    if qn <= 64 and (
        block_rows is None
        or _vmem_need(qn, block_rows, d, itemsize, qn) <= _VMEM_BUDGET
    ):
        # whole batch as one tile — but a caller-FORCED block_rows still
        # goes through the budget check (e.g. f32 index at 4096-row
        # blocks overflows with a 64-query tile; shrink below)
        return qn
    for qb in (128, 64, 32, 16, 8):
        if qn % qb:
            continue
        if (
            block_rows is None
            or _vmem_need(qb, block_rows, d, itemsize, qn) <= _VMEM_BUDGET
        ):
            return qb
    return 1


def _auto_block_rows(
    qn: int, requested: int | None, d: int = 768, itemsize: int = 2
) -> int:
    """Largest power-of-two row block for which SOME aligned query tile
    fits the scoped-VMEM budget (the tile itself is then picked by
    ``_auto_q_block`` given this block).

    Round-3 measurement (amortized, 2M rows): block size beats query-
    tile width when they compete for VMEM. The int8 path at Q=512 runs
    18.7 ms with 4096-row blocks x 64-query tiles vs 46.8 ms with
    2048 x 128 (the old tile-first choice); bf16 is neutral (33.6 vs
    33.2 ms). So prefer the largest block any tile fits, not the widest
    tile.
    """
    if requested is not None:
        return requested
    qbs = ([qn] if qn <= 64 else []) + [
        qb for qb in (128, 64, 32, 16, 8) if qb <= qn and qn % qb == 0
    ]
    if not qbs:
        qbs = [8]
    for b in (4096, 2048, 1024, 512):
        if any(_vmem_need(qb, b, d, itemsize, qn) <= _VMEM_BUDGET for qb in qbs):
            return b
    return 512


def _pad_rows(x: np.ndarray | jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return jnp.asarray(x)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _trim(vals, ids, qn):
    # avoid an eager device slice when the caller's count already
    # matches (every eager op through the remote tunnel is a round trip)
    if vals.shape[0] != qn:
        return vals[:qn], ids[:qn]
    return vals, ids


def _aot_or_jit(name, jit_fn, args, static_kwargs):
    """Route through the AOT executable disk cache on TPU (a warm-start
    payload loads in ~0.1 s vs 10 s-10 min Mosaic compiles through the
    shared pool — and the plain-bf16 Q=32 shape NEVER persists in XLA's
    own compile cache here, CLAUDE.md QUIRK). Interpret mode and
    non-TPU backends use the plain jit."""
    if not static_kwargs.get("interpret", False) and not any(
        isinstance(a, jax.core.Tracer) for a in args
    ):
        from arxiv_rag_tpu.ops import aot

        if aot.enabled():
            return aot.call(name, jit_fn, args, static_kwargs)
    return jit_fn(*args, **static_kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "interpret", "merge"),
)
def _fused_topk_jit(index, queries, nvalid, k, block_rows, interpret,
                    merge="extract"):
    # query pad to sublane alignment happens INSIDE the jit: traced,
    # fused, and — unlike an eager jnp.pad in the wrapper — not a
    # separate device dispatch per call
    queries = _pad_rows(queries, 8)
    qn, d = queries.shape
    call = _build_call(
        index.shape[0], d, qn, k, block_rows, index.dtype, False, False,
        interpret, merge_impl=merge,
    )
    return call(nvalid, queries.astype(index.dtype), index)


def fused_topk(
    index: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused flat-scan top-k. ``index`` [N, D] (f32/bf16), rows
    L2-normalized; ``queries`` [Q, D]. Returns (values [Q,k], ids [Q,k]).
    ``_merge`` picks the in-kernel merge implementation ("extract" |
    "extractN" | "staged" | "group1" | "group2" — all bit-identical,
    see _topk_kernel; "extract" stays the measured default)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    block_rows = _auto_block_rows(
        _round8(qn), block_rows, queries.shape[1],
        jnp.dtype(index.dtype).itemsize,
    )
    n = index.shape[0] if n_valid is None else n_valid
    index = _pad_rows(index, block_rows)
    nvalid = np.full((1, 1), n, np.int32)
    vals, ids = _aot_or_jit(
        "fused_topk", _fused_topk_jit, (index, queries, nvalid),
        dict(k=k, block_rows=block_rows, interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "interpret", "merge"),
)
def _fused_topk_masked_jit(index, row_masks, query_mask, queries, nvalid, k, block_rows, interpret,
                           merge="extract"):
    queries = _pad_rows(queries, 8)
    query_mask = _pad_rows(query_mask.reshape(-1, 1), 8)  # pad rows: mask 0
    qn, d = queries.shape
    call = _build_call(
        index.shape[0], d, qn, k, block_rows, index.dtype, True, False, interpret,
        merge_impl=merge,
    )
    return call(
        nvalid,
        queries.astype(index.dtype),
        index,
        row_masks.reshape(1, -1).astype(jnp.int32),
        query_mask.astype(jnp.int32),
    )


def fused_topk_masked(
    index: jnp.ndarray,
    row_masks: jnp.ndarray,
    query_mask: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Metadata-filtered fused top-k (row bitmask & query bitmask != 0)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    block_rows = _auto_block_rows(
        _round8(qn), block_rows, queries.shape[1],
        jnp.dtype(index.dtype).itemsize,
    )
    n = index.shape[0] if n_valid is None else n_valid
    index = _pad_rows(index, block_rows)
    row_masks = _pad_rows(row_masks.reshape(-1, 1), block_rows).reshape(-1)
    nvalid = np.full((1, 1), n, np.int32)
    vals, ids = _aot_or_jit(
        "fused_topk_masked", _fused_topk_masked_jit,
        (index, row_masks, query_mask, queries, nvalid),
        dict(k=k, block_rows=block_rows, interpret=interpret, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "interpret", "variant", "merge"),
)
def _fused_topk_int8_jit(values, scales, queries, nvalid, k, block_rows, interpret,
                         variant="row", merge="extract"):
    # int8 queries need 32-row sublane alignment; bf16 needs 16 — pad to
    # 32 in the s8s8 variant, 8 (f32 pad, cast later) otherwise
    if variant == "s8s8":
        qf = _pad_rows(queries.astype(jnp.float32), 32)
        qn, d = qf.shape
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        call = _build_call(
            values.shape[0], d, qn, k, block_rows, jnp.int8, False, True,
            interpret, int8_mode="s8s8", merge_impl=merge,
        )
        return call(nvalid, q8, values, scales.reshape(1, -1), qs)
    queries = _pad_rows(queries.astype(jnp.float32), 8)
    qn, d = queries.shape
    call = _build_call(
        values.shape[0], d, qn, k, block_rows, jnp.int8, False, True, interpret,
        int8_mode=variant, merge_impl=merge,
    )
    return call(
        nvalid,
        queries.astype(jnp.bfloat16),
        values,
        scales.reshape(1, -1),
    )


def fused_topk_int8(
    values: jnp.ndarray,
    scales: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
    _variant: str = "s8s8",
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8-stored index scan: half the HBM bytes, per-row scales
    recover cosine scores.

    ``_variant`` selects the scoring path:
    - "s8s8" (DEFAULT since round 3): queries quantized per-row to int8,
      native s8xs8->s32 MXU matmul (double MAC rate on v5e), dequant =
      query scale x row scale on the s32 accumulator. Measured 27,319
      qps vs row's 23,687 @Q=512 on 2M rows (amortized, +15%; +79% over
      the bf16 kernel), recall@10 = 1.0 at 2M with tie_tol 2e-2 — the
      index's own int8 quantization error dominates the query's.
    - "row": bf16 compute — s8 index operand widened in the MXU feed,
      queries stay bf16 (no query quantization at all).
    - "nodequant": perf probe with broken recall (profiling only, see
      tools/profile_int8.py).
    """
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    block_rows = _auto_block_rows(_round8(qn), block_rows, queries.shape[1], 1)
    n = values.shape[0] if n_valid is None else n_valid
    values = _pad_rows(values, block_rows)
    scales = _pad_rows(scales.reshape(-1, 1), block_rows).reshape(-1)
    nvalid = np.full((1, 1), n, np.int32)
    vals, ids = _aot_or_jit(
        "fused_topk_int8", _fused_topk_int8_jit,
        (values, scales, queries, nvalid),
        dict(k=k, block_rows=block_rows, interpret=interpret,
             variant=_variant, merge=_merge),
    )
    return _trim(vals, ids, qn)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_rows", "interpret", "variant", "merge"),
)
def _fused_topk_int8_masked_jit(values, scales, row_masks, query_mask, queries,
                                nvalid, k, block_rows, interpret,
                                variant="row", merge="extract"):
    if variant == "s8s8":
        qf = _pad_rows(queries.astype(jnp.float32), 32)
        query_mask = _pad_rows(query_mask.reshape(-1, 1), 32)
        qn, d = qf.shape
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        call = _build_call(
            values.shape[0], d, qn, k, block_rows, jnp.int8, True, True,
            interpret, int8_mode="s8s8", merge_impl=merge,
        )
        return call(
            nvalid, q8, values, scales.reshape(1, -1), qs,
            row_masks.reshape(1, -1).astype(jnp.int32),
            query_mask.astype(jnp.int32),
        )
    queries = _pad_rows(queries.astype(jnp.float32), 8)
    query_mask = _pad_rows(query_mask.reshape(-1, 1), 8)
    qn, d = queries.shape
    call = _build_call(
        values.shape[0], d, qn, k, block_rows, jnp.int8, True, True, interpret,
        int8_mode=variant, merge_impl=merge,
    )
    return call(
        nvalid,
        queries.astype(jnp.bfloat16),
        values,
        scales.reshape(1, -1),
        row_masks.reshape(1, -1).astype(jnp.int32),
        query_mask.astype(jnp.int32),
    )


def fused_topk_int8_masked(
    values: jnp.ndarray,
    scales: jnp.ndarray,
    row_masks: jnp.ndarray,
    query_mask: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    *,
    n_valid: int | None = None,
    block_rows: int | None = None,
    interpret: bool | None = None,
    _variant: str = "s8s8",
    _merge: str = "extract",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Metadata-filtered int8-storage scan, fully fused: half the HBM
    bytes AND exact category filtering in one kernel pass (BASELINE
    configs[4] combined with configs[3]). ``_variant`` as in
    :func:`fused_topk_int8` ("s8s8" default since round 3)."""
    if interpret is None:
        interpret = _interpret_default()
    qn = queries.shape[0]
    block_rows = _auto_block_rows(_round8(qn), block_rows, queries.shape[1], 1)
    n = values.shape[0] if n_valid is None else n_valid
    values = _pad_rows(values, block_rows)
    scales = _pad_rows(scales.reshape(-1, 1), block_rows).reshape(-1)
    row_masks = _pad_rows(row_masks.reshape(-1, 1), block_rows).reshape(-1)
    nvalid = np.full((1, 1), n, np.int32)
    vals, ids = _aot_or_jit(
        "fused_topk_int8_masked", _fused_topk_int8_masked_jit,
        (values, scales, row_masks, query_mask, queries, nvalid),
        dict(k=k, block_rows=block_rows, interpret=interpret,
             variant=_variant, merge=_merge),
    )
    return _trim(vals, ids, qn)
