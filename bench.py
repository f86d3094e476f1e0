"""Benchmark harness — prints ONE JSON line for the driver, ALWAYS.

Headline metric (BASELINE.json): flat-scan search QPS/chip at recall@10
parity on a ~2M×768 corpus, via the Pallas fused matmul + streaming
top-k kernel over an HBM-resident bf16 index. ``vs_baseline`` is the
speedup over the reference-equivalent CPU exact scan (numpy fp32 — the
only search the reference corpus could support, and the recall oracle).

Crash-proofing (round 4, after BENCH_r03 died rc=1 on a transient
RESOURCE_EXHAUSTED with no JSON):
- ``main`` owns a result dict that every phase fills in; the JSON line
  prints in a ``finally`` with an ``"error"`` field listing whatever
  failed. A phase failure never kills the run.
- No full fp32 index ever exists on device. The corpus is generated in
  8 fp32 slices; each slice feeds the fp32 recall oracles (plain +
  masked), the bf16 copy and the int8 quantization, then is freed —
  sustained HBM is ~4.6 GB (bf16 3.07 + int8 1.54) instead of the
  round-3 9.2-10.7 GB that left no headroom for pool co-tenants.
- The fused headline goes through ``ops.aot``: a stale/unlucky AOT
  payload failing at RUN time is dropped and a fresh fused compile is
  attempted before any XLA surrender (round-3 failure mode: AOT run
  died and the code fell straight to the XLA scan, which then also
  died, unprotected).
- Any RESOURCE_EXHAUSTED classified during setup/headline retries ONCE
  at half the row count, with ``"rows_reduced": true`` reported.

Protocol notes (sized for a tunneled single chip + 1-core host):
- the index is generated and normalized ON DEVICE (no multi-GB
  host→device transfer distorting the measurement);
- recall parity is checked against an fp32 exact scan with
  HIGHEST-precision matmul (slice-wise, lossless top-k merge — a
  shard-local-topk union contains the global top-k), plus a host numpy
  cross-check over a row slice;
- ``block_until_ready`` through the tunnel returns before execution
  finishes; fetching the (tiny) result forces a true roundtrip and is
  the only honest clock here (CLAUDE.md);
- the CPU baseline is timed on ``ARAG_BENCH_CPU_ROWS`` rows and scaled
  linearly to the full row count (a flat scan is bandwidth/flops-bound,
  so QPS ∝ 1/rows; the scaling is reported, not hidden).

Env knobs: ARAG_BENCH_ROWS (default 2_000_000 on TPU), ARAG_BENCH_CPU_ROWS
(default 200_000), ARAG_BENCH_SKIP_ENCODER=1, ARAG_BENCH_DEADLINE,
ARAG_BENCH_COMPILE_TIMEOUT, ARAG_BENCH_SKIP_IVF=1, ARAG_BENCH_IVF_NPROBE,
ARAG_BENCH_IVF_BUDGET.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()


class _Oom(RuntimeError):
    """Device memory exhaustion — worth retrying at reduced scale."""


def _is_oom(exc: BaseException) -> bool:
    return "RESOURCE_EXHAUSTED" in repr(exc)


def uniform_cluster_ids(start: int, rows: int, n_rows: int,
                        n_clusters: int) -> np.ndarray:
    """Exact cluster ids for rows [start, start+rows) under the
    proportional map cid(i) = i*C // N (cluster sizes differ by <= 1).
    int64 host math — a traced int32 i*C overflows at 2M x 4096, and an
    f32 divide can misplace boundary rows relative to the offsets."""
    return (
        (np.arange(start, start + rows, dtype=np.int64) * n_clusters)
        // n_rows
    ).astype(np.int32)


def uniform_cluster_offsets(n_rows: int, n_clusters: int) -> np.ndarray:
    """offsets[c] = #rows with cid(i) < c = ceil(c*N/C) — consistent
    with :func:`uniform_cluster_ids` by construction (i*C//N < c iff
    i < ceil(c*N/C))."""
    c = np.arange(n_clusters + 1, dtype=np.int64)
    return (c * n_rows + n_clusters - 1) // n_clusters


def run_bench(result: dict, errors: list, n_rows: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import ModelConfig, encode, init_params
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk
    from arxiv_rag_tpu.ops.quant import quantize_int8
    from arxiv_rag_tpu.ops.topk import (
        cosine_topk_numpy,
        flat_search,
        masked_flat_search,
        recall_at_k,
    )

    on_tpu = jax.default_backend() == "tpu"
    cpu_rows = min(n_rows, int(os.environ.get("ARAG_BENCH_CPU_ROWS", 200_000)))
    dim, q_batch, k = 768, 32, 10
    result["backend"] = jax.default_backend()
    result["rows"] = n_rows
    result["metric"] = f"flat_scan_qps_per_chip_{n_rows}x{dim}_bf16_recall_parity"
    log(f"backend={jax.default_backend()} rows={n_rows} cpu_rows={cpu_rows}")

    deadline = float(os.environ.get("ARAG_BENCH_DEADLINE", 700.0))

    def past_deadline(phase: str) -> bool:
        if time.perf_counter() - T0 > deadline:
            log(f"soft deadline ({deadline:.0f}s) hit; skipping {phase} "
                "(remote compiles on the shared pool vary 2-10 min)")
            return True
        return False

    # --- corpus + queries generated on device, SLICE-WISE -------------------
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def make_normal(key, shape_rows):
        x = jax.random.normal(key, (shape_rows, dim), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x

    key = jax.random.PRNGKey(0)
    kq, ki = jax.random.split(key)
    queries_dev = make_normal(kq, q_batch)
    _ = np.asarray(queries_dev)
    log("queries ready")

    BLOCK_ROWS = 4096
    pad = (-n_rows) % BLOCK_ROWS
    padded_rows = n_rows + pad

    # synthetic 8-category masks for the masked variants (generated up
    # front so the masked fp32 oracle can run slice-wise too)
    kmask = jax.random.PRNGKey(3)
    row_masks_dev = (
        1 << jax.random.randint(kmask, (padded_rows,), 0, 8)
    ).astype(jnp.int32)
    want = 0b00000111  # 3 of 8 categories eligible (~37% of rows)
    qmask_dev = jnp.full((q_batch,), want, jnp.int32)

    # slice-wise build: fp32 slice -> (oracle partials, bf16 write, int8
    # write) -> free. Donated dynamic_update_slice keeps one resident
    # bf16 + int8 buffer instead of list-concat doubling.
    @partial(jax.jit, donate_argnums=(0,))
    def _write(buf, sl, offset):
        return jax.lax.dynamic_update_slice(buf, sl, (offset, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def _write1(buf, sl, offset):
        return jax.lax.dynamic_update_slice(buf, sl, (offset,))

    slice_oracle = jax.jit(lambda sl, q: flat_search(sl, q, k))
    slice_oracle_masked = jax.jit(
        lambda sl, rm, qm, q: masked_flat_search(sl, rm, qm, q, k)
    )
    quantize_jit = jax.jit(quantize_int8)

    index = jnp.zeros((padded_rows, dim), jnp.bfloat16)
    i8_vals = jnp.zeros((padded_rows, dim), jnp.int8)
    i8_scales = jnp.zeros((padded_rows,), jnp.float32)
    n_slices = 8
    step = -(-n_rows // n_slices)
    o_v, o_i, mo_v, mo_i = [], [], [], []
    for s in range(0, n_rows, step):
        rows = min(step, n_rows - s)
        sl = make_normal(jax.random.fold_in(ki, s), rows)
        sv, si = slice_oracle(sl, queries_dev)
        o_v.append(np.asarray(sv))
        o_i.append(np.asarray(si).astype(np.int64) + s)
        msv, msi = slice_oracle_masked(
            sl,
            jax.lax.dynamic_slice(row_masks_dev, (s,), (rows,)).astype(jnp.uint32),
            qmask_dev.astype(jnp.uint32),
            queries_dev,
        )
        mo_v.append(np.asarray(msv))
        # masked oracle marks empty slots with -inf/-1; keep ids valid
        msi_np = np.asarray(msi).astype(np.int64)
        mo_i.append(np.where(msi_np >= 0, msi_np + s, -1))
        qv, qsc = quantize_jit(sl)
        index = _write(index, sl.astype(jnp.bfloat16), s)
        i8_vals = _write(i8_vals, qv, s)
        i8_scales = _write1(i8_scales, qsc, s)
        sl.delete()
    _ = np.asarray(i8_scales[:8])  # sync the build chain
    log(f"index built slice-wise: bf16 + int8 resident, fp32 freed "
        f"(+{pad} pad rows); oracles merged on host")

    # lossless merge of the slice-local top-ks (union contains global top-k)
    def _merge_oracle(vs, is_):
        cv = np.concatenate(vs, axis=1)
        ci = np.concatenate(is_, axis=1)
        order = np.argsort(-cv, axis=1)[:, :k]
        return np.take_along_axis(cv, order, 1), np.take_along_axis(ci, order, 1)

    ov, oi = _merge_oracle(o_v, o_i)
    momv, momi = _merge_oracle(mo_v, mo_i)

    # CPU baseline data prep in a thread (overlaps remote compiles; the
    # TIMING runs synchronously later on an uncontended host)
    import threading

    cpu_result: dict = {}

    def cpu_baseline():
        rng = np.random.default_rng(0)
        host_slice = rng.standard_normal((cpu_rows, dim), dtype=np.float32)
        host_slice /= np.linalg.norm(host_slice, axis=1, keepdims=True)
        cpu_result["host_slice"] = host_slice
        cpu_result["host_q"] = np.asarray(queries_dev, np.float32)
        log("cpu baseline data ready (threaded)")

    cpu_thread = threading.Thread(target=cpu_baseline, daemon=True)
    cpu_thread.start()

    kernel_impl = "pallas_fused"
    qbf_dev = queries_dev.astype(jnp.bfloat16)

    def run_fused():
        # routes through ops.aot: payload load in ~0.1 s when warm; a
        # payload failing at RUN time is dropped and the jit compiles
        # fresh (the round-3 crash fell straight to XLA instead)
        return fused_topk(index, qbf_dev, k, n_valid=n_rows, block_rows=BLOCK_ROWS)

    def run_xla():
        return flat_search(index, queries_dev, k)

    run_search = run_fused if on_tpu else run_xla

    # compile watchdog: the shared pool's remote compile takes 10s-10min;
    # the plain-bf16 Q=32 shape never persists in XLA's own compile cache
    # through this tunnel (CLAUDE.md QUIRK) — but the ops.aot executable
    # payload does, so only the FIRST process pays the Mosaic compile.
    compile_timeout = float(os.environ.get("ARAG_BENCH_COMPILE_TIMEOUT", 600.0))
    warm: dict = {}

    def _warm():
        try:
            v, i = run_search()
            _ = np.asarray(v)
            warm["out"] = (v, i)
            warm["ok"] = True
        except Exception as exc:  # noqa: BLE001 — fall back, don't die
            warm["err"] = exc

    wt = threading.Thread(target=_warm, daemon=True)
    wt.start()
    wt.join(compile_timeout if on_tpu else None)
    vals = ids = None
    if warm.get("ok"):
        vals, ids = warm["out"]
    else:
        if "err" in warm:
            if _is_oom(warm["err"]):
                raise _Oom(str(warm["err"])[:300])
            log(f"fused kernel failed ({warm['err']}); using the XLA scan")
            errors.append(f"fused: {str(warm['err'])[:200]}")
        else:
            log(f"fused kernel not compiled after {compile_timeout:.0f}s; "
                "using the XLA scan for the headline")
            errors.append(f"fused: compile watchdog {compile_timeout:.0f}s")
        kernel_impl = "xla_fallback"
        run_search = run_xla
        try:
            vals, ids = run_search()
            _ = np.asarray(vals)
        except Exception as exc:  # noqa: BLE001
            if _is_oom(exc):
                raise _Oom(str(exc)[:300]) from exc
            errors.append(f"xla_fallback: {str(exc)[:200]}")
            kernel_impl = "none"
            run_search = None
    result["kernel"] = kernel_impl
    log(f"search kernel ready ({kernel_impl})")

    # --- headline timing: result FETCH per iteration (honest clock) ---------
    iters = 10 if on_tpu else 3
    qps = 0.0
    gbps = 0.0
    if run_search is not None:
        try:
            lat = []
            for _ in range(iters):
                t0 = time.perf_counter()
                vals, ids = run_search()
                _ = np.asarray(vals)
                lat.append(time.perf_counter() - t0)
            tpu_s = sorted(lat)[len(lat) // 2]  # median fetched latency
            qps = q_batch / tpu_s
            gbps = n_rows * dim * (2 if on_tpu else 4) / tpu_s / 1e9
            result["value"] = round(qps, 2)
            log(f"timed search (fetched): {tpu_s*1e3:.2f} ms/batch -> "
                f"{qps:.1f} qps, {gbps:.0f} GB/s index stream")
        except Exception as exc:  # noqa: BLE001
            if _is_oom(exc):
                raise _Oom(str(exc)[:300]) from exc
            errors.append(f"headline timing: {str(exc)[:200]}")

    # recall vs the slice-merged fp32 oracle
    if ids is not None:
        try:
            recall = recall_at_k(
                np.asarray(ids), oi, ov, tie_tol=5e-3,
                candidate_scores=np.asarray(vals, np.float32),
            )
            result["recall_at_10"] = round(float(recall), 4)
            log(f"fp32 oracle recall@{k} = {recall:.4f}")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"recall: {str(exc)[:200]}")

    # achievable-bandwidth reference: best of a 1-pass reduction and an
    # MXU-driven ones-matmul with the kernel's own access pattern.
    sol_gbps = 0.0
    sol_amort_gbps = 0.0
    try:
        red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
        ones8 = jnp.ones((dim, 8), index.dtype)
        mm = jax.jit(
            lambda x, o: jnp.sum(
                jax.lax.dot_general(
                    x, o, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        )
        for name, fn in (("reduce", lambda: red(index)),
                         ("ones-matmul", lambda: mm(index, ones8))):
            _ = np.asarray(fn())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(fn())
                ts.append(time.perf_counter() - t0)
            g = index.shape[0] * dim * (2 if on_tpu else 4) / sorted(ts)[1] / 1e9
            # amortized: 6 dispatches, one fetch — removes the ~30 ms
            # tunnel RTT that pollutes the per-call number
            t0 = time.perf_counter()
            outs = [fn() for _ in range(6)]
            _ = np.asarray(outs[-1])
            ga = 6 * index.shape[0] * dim * (2 if on_tpu else 4) / (
                time.perf_counter() - t0) / 1e9
            log(f"pure-read reference ({name}): {g:.0f} GB/s fetched, "
                f"{ga:.0f} GB/s amortized")
            sol_gbps = max(sol_gbps, g)
            sol_amort_gbps = max(sol_amort_gbps, ga)
        frac_sol = min(1.0, gbps / max(sol_gbps, 1e-9))
        result["fraction_of_read_bw"] = round(float(frac_sol), 3)
        result["read_bw_amortized_gbps"] = round(float(sol_amort_gbps), 1)
        log(f"kernel at {100*frac_sol:.0f}% of measured read bandwidth (fetched basis)")
    except Exception as exc:  # noqa: BLE001
        errors.append(f"read-bw probe: {str(exc)[:200]}")

    # Q=32 pipelined: dispatch 6 batches, one fetch at the end — the
    # device's actual scan throughput (the single-call number above
    # carries a full ~30 ms tunnel RTT per batch).
    if on_tpu and kernel_impl.startswith("pallas_fused"):
        try:
            t0 = time.perf_counter()
            outs = [run_search() for _ in range(6)]
            _ = np.asarray(outs[-1][0])  # in-order stream: last bounds all
            q32_piped_qps = 6 * q_batch / (time.perf_counter() - t0)
            dev_gbps = n_rows * dim * 2 * q32_piped_qps / q_batch / 1e9
            frac_sol_dev = min(1.0, dev_gbps / max(sol_amort_gbps, 1e-9))
            result["qps_at_q32_pipelined"] = round(q32_piped_qps, 1)
            result["fraction_of_read_bw_device"] = round(float(frac_sol_dev), 3)
            log(f"search @Q=32 pipelined x6: {q32_piped_qps:.1f} qps "
                f"({dev_gbps:.0f} GB/s = {100 * frac_sol_dev:.0f}% of amortized read BW)")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"q32 pipelined: {str(exc)[:200]}")

    # --- serving throughput at a large query batch --------------------------
    q512 = None
    if on_tpu and not past_deadline("Q=512 phases"):
        try:
            q512 = make_normal(jax.random.PRNGKey(7), 512)
            f512 = jax.jit(lambda i, qq: flat_search(i, qq, k))
            _ = np.asarray(f512(index, q512)[0])
            lat512 = []
            for _ in range(5):
                t0 = time.perf_counter()
                _ = np.asarray(f512(index, q512)[0])
                lat512.append(time.perf_counter() - t0)
            result["qps_at_q512_xla"] = round(512 / sorted(lat512)[len(lat512) // 2], 1)
            log(f"serving throughput @Q=512 (xla): {result['qps_at_q512_xla']:.0f} qps")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"q512 xla: {str(exc)[:200]}")
        try:
            # auto tiling (the kernel picks its own block/tile at Q=512)
            q512b = q512.astype(jnp.bfloat16)
            _ = np.asarray(fused_topk(index, q512b, k, n_valid=n_rows)[0])
            latf = []
            for _ in range(5):
                t0 = time.perf_counter()
                _ = np.asarray(fused_topk(index, q512b, k, n_valid=n_rows)[0])
                latf.append(time.perf_counter() - t0)
            result["qps_at_q512_fused"] = round(512 / sorted(latf)[len(latf) // 2], 1)
            log(f"serving throughput @Q=512 (fused, q-tiled): "
                f"{result['qps_at_q512_fused']:.0f} qps")
            # pipelined: dispatch K batches, fetch last — the production
            # number (the micro-batcher pipelines the same way)
            t0 = time.perf_counter()
            outs = [fused_topk(index, q512b, k, n_valid=n_rows) for _ in range(6)]
            _ = np.asarray(outs[-1][0])
            result["qps_at_q512_fused_pipelined"] = round(
                6 * 512 / (time.perf_counter() - t0), 1)
            log(f"serving throughput @Q=512 (fused, pipelined x6): "
                f"{result['qps_at_q512_fused_pipelined']:.0f} qps")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"q512 fused: {str(exc)[:200]}")

    # --- masked (category-filtered) fused variant (BASELINE configs[4]) -----
    if on_tpu and not past_deadline("masked variant"):
        from arxiv_rag_tpu.ops.pallas_topk import fused_topk_masked

        try:
            mv, mi = fused_topk_masked(index, row_masks_dev, qmask_dev,
                                       qbf_dev, k,
                                       n_valid=n_rows, block_rows=BLOCK_ROWS)
            _ = np.asarray(mv)
            latm = []
            for _ in range(iters):
                t0 = time.perf_counter()
                mv, mi = fused_topk_masked(index, row_masks_dev, qmask_dev,
                                           qbf_dev, k,
                                           n_valid=n_rows, block_rows=BLOCK_ROWS)
                _ = np.asarray(mv)
                latm.append(time.perf_counter() - t0)
            result["masked_qps"] = round(q_batch / sorted(latm)[len(latm) // 2], 2)
            masked_recall = recall_at_k(
                np.asarray(mi), momi, momv, tie_tol=5e-3,
                candidate_scores=np.asarray(mv, np.float32),
            )
            result["masked_recall_at_10"] = round(float(masked_recall), 4)
            log(f"masked fused: {result['masked_qps']:.1f} qps, "
                f"recall@{k} = {masked_recall:.4f}")
            if q512 is not None and not past_deadline("masked @Q=512"):
                q512b = q512.astype(jnp.bfloat16)
                qmask512 = jnp.full((512,), want, jnp.int32)
                _ = np.asarray(fused_topk_masked(
                    index, row_masks_dev, qmask512, q512b, k, n_valid=n_rows)[0])
                latm5 = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = np.asarray(fused_topk_masked(
                        index, row_masks_dev, qmask512, q512b, k, n_valid=n_rows)[0])
                    latm5.append(time.perf_counter() - t0)
                result["qps_at_q512_masked"] = round(
                    512 / sorted(latm5)[len(latm5) // 2], 1)
                log(f"masked fused @Q=512: {result['qps_at_q512_masked']:.0f} qps")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"masked: {str(exc)[:200]}")
            log(f"masked fused failed: {exc}")

    # --- int8 index variant (BASELINE configs[4]): half the bytes -----------
    # (i8_vals/i8_scales were quantized slice-wise from fp32 during setup)
    if on_tpu and not past_deadline("int8 variant"):
        from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8

        try:
            iv, ii = fused_topk_int8(i8_vals, i8_scales, queries_dev, k,
                                     n_valid=n_rows, block_rows=BLOCK_ROWS)
            _ = np.asarray(iv)
            lat8 = []
            for _ in range(iters):
                t0 = time.perf_counter()
                iv, ii = fused_topk_int8(i8_vals, i8_scales, queries_dev, k,
                                         n_valid=n_rows, block_rows=BLOCK_ROWS)
                _ = np.asarray(iv)
                lat8.append(time.perf_counter() - t0)
            int8_s = sorted(lat8)[len(lat8) // 2]
            result["int8_qps"] = round(q_batch / int8_s, 2)
            log(f"int8 search (fetched): {int8_s*1e3:.2f} ms/batch -> "
                f"{result['int8_qps']:.1f} qps")
            int8_recall = recall_at_k(
                np.asarray(ii), oi, ov, tie_tol=2e-2,
                candidate_scores=np.asarray(iv, np.float32),
            )
            result["int8_recall_at_10"] = round(float(int8_recall), 4)
            log(f"int8 recall@{k} = {int8_recall:.4f}")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"int8: {str(exc)[:200]}")
            log(f"int8 failed: {exc}")

        if q512 is not None and not past_deadline("int8 @Q=512"):
            try:
                _ = np.asarray(fused_topk_int8(
                    i8_vals, i8_scales, q512, k, n_valid=n_rows)[0])
                lat85 = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = np.asarray(fused_topk_int8(
                        i8_vals, i8_scales, q512, k, n_valid=n_rows)[0])
                    lat85.append(time.perf_counter() - t0)
                result["qps_at_q512_int8"] = round(
                    512 / sorted(lat85)[len(lat85) // 2], 1)
                log(f"int8 fused @Q=512: {result['qps_at_q512_int8']:.0f} qps")
                t0 = time.perf_counter()
                outs = [fused_topk_int8(i8_vals, i8_scales, q512, k,
                                        n_valid=n_rows) for _ in range(6)]
                _ = np.asarray(outs[-1][0])
                result["qps_at_q512_int8_pipelined"] = round(
                    6 * 512 / (time.perf_counter() - t0), 1)
                log(f"int8 fused @Q=512 pipelined x6: "
                    f"{result['qps_at_q512_int8_pipelined']:.0f} qps")
            except Exception as exc:  # noqa: BLE001
                errors.append(f"int8 q512: {str(exc)[:200]}")
                log(f"int8 @Q=512 failed: {exc}")

        # --- int8 + masked: the full production layout in one kernel ----
        if not past_deadline("int8+masked variant"):
            from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8_masked

            try:
                imv, imi = fused_topk_int8_masked(
                    i8_vals, i8_scales, row_masks_dev, qmask_dev,
                    queries_dev, k, n_valid=n_rows, block_rows=BLOCK_ROWS,
                )
                _ = np.asarray(imv)
                lat8m = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    imv, imi = fused_topk_int8_masked(
                        i8_vals, i8_scales, row_masks_dev, qmask_dev,
                        queries_dev, k, n_valid=n_rows, block_rows=BLOCK_ROWS,
                    )
                    _ = np.asarray(imv)
                    lat8m.append(time.perf_counter() - t0)
                result["int8_masked_qps"] = round(
                    q_batch / sorted(lat8m)[len(lat8m) // 2], 2)
                int8m_recall = recall_at_k(
                    np.asarray(imi), momi, momv,
                    tie_tol=2e-2, candidate_scores=np.asarray(imv, np.float32),
                )
                result["int8_masked_recall_at_10"] = round(float(int8m_recall), 4)
                log(f"int8+masked fused: {result['int8_masked_qps']:.1f} qps, "
                    f"recall@{k} = {int8m_recall:.4f}")
                if q512 is not None and not past_deadline("int8+masked @Q=512"):
                    qmask512 = jnp.full((512,), want, jnp.int32)
                    _ = np.asarray(fused_topk_int8_masked(
                        i8_vals, i8_scales, row_masks_dev, qmask512, q512, k,
                        n_valid=n_rows)[0])
                    lat8m5 = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        _ = np.asarray(fused_topk_int8_masked(
                            i8_vals, i8_scales, row_masks_dev, qmask512, q512,
                            k, n_valid=n_rows)[0])
                        lat8m5.append(time.perf_counter() - t0)
                    result["qps_at_q512_int8_masked"] = round(
                        512 / sorted(lat8m5)[len(lat8m5) // 2], 1)
                    log(f"int8+masked fused @Q=512: "
                        f"{result['qps_at_q512_int8_masked']:.0f} qps")
            except Exception as exc:  # noqa: BLE001
                errors.append(f"int8+masked: {str(exc)[:200]}")
                log(f"int8+masked fused failed: {exc}")

    # --- CPU baseline: timed synchronously on the idle host. Best of 3 ------
    try:
        cpu_thread.join()
        host_slice, host_q = cpu_result["host_slice"], cpu_result["host_q"]
        cpu_slice_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            hv, hi = cosine_topk_numpy(host_slice, host_q, k)
            cpu_slice_s = min(cpu_slice_s, time.perf_counter() - t0)
        cpu_qps = q_batch / (cpu_slice_s * (n_rows / cpu_rows))
        result["cpu_exact_qps_scaled"] = round(cpu_qps, 3)
        if qps:
            result["vs_baseline"] = round(qps / cpu_qps, 2)
        log(f"cpu scan {cpu_rows} rows: best {cpu_slice_s:.2f}s -> "
            f"scaled {cpu_qps:.2f} qps @{n_rows}")

        # host numpy cross-check of the device oracle on the same slice
        if not past_deadline("host/device oracle cross-check"):
            sv_dev, si_dev = jax.jit(lambda idx, q: flat_search(idx, q, k))(
                jnp.asarray(host_slice), jnp.asarray(host_q)
            )
            xcheck = recall_at_k(np.asarray(si_dev), hi, hv, tie_tol=5e-3,
                                 candidate_scores=np.asarray(sv_dev, np.float32))
            result["oracle_xcheck"] = round(float(xcheck), 4)
            log(f"host/device oracle cross-check recall = {xcheck:.4f}")
    except Exception as exc:  # noqa: BLE001
        errors.append(f"cpu baseline: {str(exc)[:200]}")

    # --- encoder throughput -------------------------------------------------
    chunks_per_s = 0.0
    out = None
    cfg = params = ids_in = mask_in = None
    enc_batch = seq = enc_iters = 0
    if os.environ.get("ARAG_BENCH_SKIP_ENCODER") != "1" and not past_deadline("encoder"):
        try:
            cfg = ModelConfig()
            params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
            enc_batch, seq = (512, 128) if on_tpu else (16, 64)
            ids_in = jnp.asarray(
                np.random.default_rng(1).integers(4, cfg.vocab_size, (enc_batch, seq)),
                jnp.int32,
            )
            mask_in = jnp.ones((enc_batch, seq), jnp.int32)
            enc_fn = jax.jit(
                lambda p, i, m: encode(p, i, m, cfg, compute_dtype=jnp.bfloat16))
            _ = np.asarray(enc_fn(params, ids_in, mask_in))
            log("encoder compiled")
            enc_iters = 5 if on_tpu else 2
            t0 = time.perf_counter()
            for _ in range(enc_iters):
                out = enc_fn(params, ids_in, mask_in)
                _ = np.asarray(out)  # honest sync
            chunks_per_s = enc_batch * enc_iters / (time.perf_counter() - t0)
            result["embed_chunks_per_sec"] = round(chunks_per_s, 1)
            log(f"encoder: {chunks_per_s:.1f} chunks/s")
            # MFU vs the chip's bf16 peak — tracked so libtpu/XLA flips
            # show up against the measured XLA-lowering-limited ceiling
            L, h, ff = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
            flops_per_token = L * (8 * h * h + 4 * seq * h + 4 * h * ff)
            peak = float(os.environ.get("ARAG_TPU_PEAK_TFLOPS", 197.0)) * 1e12
            encoder_mfu = chunks_per_s * seq * flops_per_token / peak
            result["encoder_mfu"] = round(float(encoder_mfu), 4)
            log(f"encoder MFU: {100 * encoder_mfu:.1f}% of {peak / 1e12:.0f} TF/s peak "
                f"({chunks_per_s * seq * flops_per_token / 1e12:.1f} TF/s)")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"encoder: {str(exc)[:200]}")
            log(f"encoder failed: {exc}")

    # --- W8A8 encoder via the Pallas s8s8 MXU kernel (measured negative in
    # round 2; kept deadline-gated so a future libtpu flip shows up) ---------
    if (on_tpu and chunks_per_s > 0 and out is not None
            and os.environ.get("ARAG_BENCH_SKIP_W8A8") != "1"
            and not past_deadline("w8a8 encoder")):
        from arxiv_rag_tpu.models import quantize_params_int8

        os.environ["ARAG_W8A8_PALLAS"] = "1"
        try:
            qparams = quantize_params_int8(params)
            qenc_fn = jax.jit(
                lambda p, i, m: encode(p, i, m, cfg, compute_dtype=jnp.bfloat16)
            )
            qwarm: dict = {}

            def _qwarm():
                try:
                    qwarm["out"] = np.asarray(qenc_fn(qparams, ids_in, mask_in))
                    qwarm["ok"] = True
                except Exception as exc:  # noqa: BLE001
                    qwarm["err"] = exc

            qt = threading.Thread(target=_qwarm, daemon=True)
            qt.start()
            qt.join(compile_timeout)
            if not qwarm.get("ok"):
                log(f"w8a8 encoder not up ({qwarm.get('err', 'compile timeout')}); skipped")
            else:
                log("w8a8 encoder compiled")
                qout = qwarm["out"]
                w8a8_cos = float(np.mean(np.sum(qout * np.asarray(out), axis=-1)))
                t0 = time.perf_counter()
                for _ in range(enc_iters):
                    _ = np.asarray(qenc_fn(qparams, ids_in, mask_in))
                w8a8 = enc_batch * enc_iters / (time.perf_counter() - t0)
                result["embed_w8a8_chunks_per_sec"] = round(w8a8, 1)
                result["w8a8_cos_vs_bf16"] = round(w8a8_cos, 5)
                log(f"w8a8 encoder (pallas): {w8a8:.1f} chunks/s, "
                    f"cos vs bf16 = {w8a8_cos:.5f}")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"w8a8: {str(exc)[:200]}")
        finally:
            os.environ.pop("ARAG_W8A8_PALLAS", None)

    # --- CPU encoder baseline: the reference's actual stack (torch CPU) -----
    if (os.environ.get("ARAG_BENCH_SKIP_ENCODER") != "1"
            and not past_deadline("cpu encoder baseline")):
        try:
            import torch
            from transformers import MPNetConfig, MPNetModel

            torch.set_num_threads(os.cpu_count() or 1)
            with torch.no_grad():
                tm = MPNetModel(MPNetConfig())  # random init — offline, same arch
                tm.eval()
                tb, tseq = 8, 128
                tids = torch.randint(4, 30000, (tb, tseq))
                tmask = torch.ones((tb, tseq), dtype=torch.long)
                tm(input_ids=tids, attention_mask=tmask)  # warm
                t0 = time.perf_counter()
                titers = 3
                for _ in range(titers):
                    tm(input_ids=tids, attention_mask=tmask)
                cpu_chunks_per_s = tb * titers / (time.perf_counter() - t0)
            result["cpu_encoder_chunks_per_sec"] = round(cpu_chunks_per_s, 2)
            if chunks_per_s and cpu_chunks_per_s:
                result["encoder_vs_cpu"] = round(chunks_per_s / cpu_chunks_per_s, 1)
            log(f"cpu encoder (torch, {os.cpu_count()} threads): "
                f"{cpu_chunks_per_s:.2f} chunks/s")
        except Exception as exc:  # noqa: BLE001
            errors.append(f"cpu encoder: {str(exc)[:200]}")
            log(f"cpu encoder baseline failed: {exc}")

    # --- IVF (cluster-pruned ANN tier): probe + block-plan + pruned scan
    # fused into ONE device dispatch (index/ivf.py plan="device") -------------
    # The device-planned configuration IVF_r04.json validated at 2M
    # (4096 clusters, 1024-row blocks, int8, nprobe 8), folded into the
    # driver's evidence chain. The kernel's AOT payload persists across
    # runs (ops/aot.py), so only the FIRST run after a /tmp wipe or a
    # kernel edit pays the Mosaic compile. Runs LAST in a watchdogged
    # daemon thread: that compile can take minutes on the shared pool,
    # and by then every other field is already recorded.
    if on_tpu and os.environ.get("ARAG_BENCH_SKIP_IVF") != "1":
        hard = float(os.environ.get("ARAG_BENCH_HARD_DEADLINE", 1800.0))
        ivf_budget = min(
            float(os.environ.get("ARAG_BENCH_IVF_BUDGET",
                                 compile_timeout + 180.0)),
            hard - 120.0 - (time.perf_counter() - T0),
        )

        def _ivf_phase() -> dict:
            from arxiv_rag_tpu.ops.pallas_ivf import (
                cluster_block_table,
                ivf_topk_device,
            )
            from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8

            # the flat phases are done — free their buffers so the
            # clustered corpus (1.5 GB int8) never stacks on the 4.6 GB
            for buf in (index, i8_vals, i8_scales, row_masks_dev, qbf_dev):
                try:
                    buf.delete()
                except Exception:  # noqa: BLE001 — already deleted
                    pass
            cpu_result.clear()  # and the 600 MB host baseline slice
            ivf_block = 1024
            n_cl = max(8, min(4096, n_rows * 4096 // 2_000_000))
            # pad to the MAIN index's 4096-aligned shape: the flat scan
            # below then shares the int8 phase's already-warm AOT payload
            # (4096 % 1024 == 0 keeps the IVF kernel block-aligned too);
            # the last 1024-block must sit entirely past n_valid — it is
            # the block table's designated dead pad target. NOTE the bump:
            # when (-n_rows) % 4096 < 1024 (n_rows near a 4096 multiple)
            # the shapes diverge from the int8 phase and the flat scan
            # pays its own compile — true at some ARAG_BENCH_ROWS
            # overrides, never at the 2M default (pad there is 2944)
            padded = n_rows + (-n_rows) % BLOCK_ROWS
            if padded - n_rows < ivf_block:
                padded += BLOCK_ROWS
            spread = 0.025  # blob tightness, as tools/ivf_scale.py
            # HOST-generated corpus (~1.5 GB int8 upload): a device-side
            # build would need 4-5 fresh XLA compiles, and the shared
            # pool's compile queue runs minutes-deep on bad days
            # (2026-08-17 evening: a TINY fresh compile sat >300 s) — the
            # only compile this phase may ever wait on is the IVF kernel
            # itself, and only while its AOT payload is cold
            rng = np.random.default_rng(11)
            centers_h = rng.standard_normal((n_cl, dim)).astype(np.float32)
            centers_h /= np.linalg.norm(centers_h, axis=1, keepdims=True)
            vals8_h = np.zeros((padded, dim), np.int8)
            scales_h = np.zeros((padded,), np.float32)
            for s in range(0, n_rows, step):
                rows = min(step, n_rows - s)
                cid = uniform_cluster_ids(s, rows, n_rows, n_cl)
                x = centers_h[cid]
                x += spread * rng.standard_normal((rows, dim)).astype(np.float32)
                x /= np.linalg.norm(x, axis=1, keepdims=True)
                sc = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
                vals8_h[s:s + rows] = np.clip(
                    np.round(x / sc[:, None]), -127, 127).astype(np.int8)
                scales_h[s:s + rows] = sc
            # queries are blob members — a real workload queries near the
            # corpus (real MPNet embeddings are cluster-dense, RECALL_r04:
            # mean pairwise cosine 0.9882; isotropic Gaussians would be an
            # unfairly HARD case for IVF, blobs are the representative one)
            qcid = np.random.default_rng(5).integers(0, n_cl, q_batch)
            q = centers_h[qcid] + spread * rng.standard_normal(
                (q_batch, dim)).astype(np.float32)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            dead = padded // ivf_block - 1
            vals8 = jax.device_put(vals8_h)
            sc8 = jax.device_put(scales_h)
            centers = jax.device_put(centers_h)
            cb = jax.device_put(cluster_block_table(
                uniform_cluster_offsets(n_rows, n_cl), ivf_block, dead))
            ivf_q = jax.device_put(q.astype(np.float32))
            _ = np.asarray(ivf_q)  # sync the uploads (tiny fetch)
            del vals8_h, scales_h
            log(f"ivf corpus resident: {n_rows} rows, {n_cl} uniform "
                f"clusters, {padded // ivf_block} blocks of {ivf_block} (int8)")

            # flat int8 scan over the SAME corpus: the recall oracle AND
            # the amortized baseline the speedup is measured against
            # (both paths see identical int8 storage, so recall isolates
            # PRUNING loss from quantization loss)
            fkw = dict(n_valid=n_rows, block_rows=BLOCK_ROWS)
            fv, fr = fused_topk_int8(vals8, sc8, ivf_q, k, **fkw)
            fv, fr = np.asarray(fv), np.asarray(fr)
            t0 = time.perf_counter()
            outs = [fused_topk_int8(vals8, sc8, ivf_q, k, **fkw)
                    for _ in range(6)]
            _ = np.asarray(outs[-1][0])
            flat_s = (time.perf_counter() - t0) / 6
            log(f"ivf-corpus flat int8 scan: {flat_s * 1e3:.2f} ms amortized "
                f"({q_batch / flat_s:.0f} qps)")

            nprobe = int(os.environ.get("ARAG_BENCH_IVF_NPROBE", 8))
            ikw = dict(nprobe=nprobe, n_valid=n_rows, block_rows=ivf_block,
                       scales=sc8)
            dv, dr = ivf_topk_device(vals8, cb, centers, ivf_q, k, **ikw)
            dv, dr = np.asarray(dv), np.asarray(dr)
            rec = recall_at_k(dr, fr, fv, tie_tol=5e-3,
                              candidate_scores=np.where(dr >= 0, dv, -np.inf))
            t0 = time.perf_counter()
            outs = [ivf_topk_device(vals8, cb, centers, ivf_q, k, **ikw)
                    for _ in range(6)]
            _ = np.asarray(outs[-1][0])
            ivf_s = (time.perf_counter() - t0) / 6
            log(f"ivf device-planned nprobe={nprobe}: {ivf_s * 1e3:.2f} ms "
                f"amortized -> {q_batch / ivf_s:.0f} qps "
                f"({flat_s / ivf_s:.2f}x flat), recall@{k} vs flat = {rec:.4f}")
            # returned (not written to `result` directly): an abandoned
            # watchdogged thread mutating the shared dict could tear the
            # emitted JSON line — fields merge only after a clean join
            return {
                "ivf_qps_at_q32_pipelined": round(q_batch / ivf_s, 1),
                "ivf_flat_qps_int8": round(q_batch / flat_s, 1),
                "ivf_speedup_vs_flat": round(flat_s / ivf_s, 2),
                "ivf_recall_at_10_vs_flat": round(float(rec), 4),
                "ivf_nprobe": nprobe,
                "ivf_clusters": n_cl,
            }

        if ivf_budget < 60:
            errors.append("ivf: skipped, no time budget")
            log(f"ivf phase skipped ({ivf_budget:.0f}s budget left)")
        else:
            ivf_box: dict = {}

            def _ivf_run() -> None:
                try:
                    ivf_box["fields"] = _ivf_phase()
                    ivf_box["ok"] = True
                except Exception as exc:  # noqa: BLE001
                    ivf_box["err"] = exc

            it = threading.Thread(target=_ivf_run, daemon=True)
            it.start()
            it.join(ivf_budget)
            if ivf_box.get("ok"):
                result.update(ivf_box["fields"])
            elif "err" in ivf_box:
                errors.append(f"ivf: {str(ivf_box['err'])[:200]}")
                log(f"ivf phase failed: {ivf_box['err']}")
            else:
                errors.append(f"ivf: watchdog {ivf_budget:.0f}s")
                log(f"ivf phase still running after {ivf_budget:.0f}s; "
                    "abandoned (every other field is already recorded)")


def main() -> None:
    result: dict = {
        "metric": "flat_scan_qps_per_chip_bf16_recall_parity",
        "value": 0.0,
        "unit": "qps",
        "vs_baseline": 0.0,
        "kernel": "none",
        "backend": "unknown",
    }
    errors: list = []

    # the JSON line prints EXACTLY once, whichever path gets there first
    import threading

    emit_lock = threading.Lock()
    emitted: list = []

    def emit() -> None:
        with emit_lock:
            if emitted:
                return
            emitted.append(True)
        if errors:
            result["error"] = "; ".join(str(e) for e in errors)[:1200]
        print(json.dumps(result), flush=True)

    # hard-deadline watchdog: a DEAD tunnel hangs inside a C call — no
    # exception, so the finally never runs (observed 2026-08-17: even a
    # tiny fetched matmul blocked indefinitely for ~1 h). The watchdog
    # prints whatever partial result exists and force-exits; stdout is
    # flushed by emit(), and os._exit skips the hung runtime threads.
    hard_deadline = float(os.environ.get("ARAG_BENCH_HARD_DEADLINE", 1800.0))

    def _watchdog() -> None:
        time.sleep(max(1.0, hard_deadline - (time.perf_counter() - T0)))
        errors.append(f"hard deadline {hard_deadline:.0f}s — device call "
                      "hung (dead tunnel?); partial results")
        log(errors[-1])
        emit()
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # tunnel preflight (round 4): during an outage even jax.devices()
    # hangs inside the plugin's RPC — the 1800 s watchdog would save the
    # JSON line but burn the driver's whole budget first. Probe device
    # discovery in a SUBPROCESS (this process must not touch the plugin
    # until the verdict); on failure fall back to a LABELED CPU run at
    # the CPU row default instead of an empty result.
    # ARAG_BENCH_PROBE_TIMEOUT=0 disables.
    force_cpu = os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
    probe_timeout = float(os.environ.get("ARAG_BENCH_PROBE_TIMEOUT", 150.0))
    if not force_cpu and probe_timeout > 0:
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('up')"],
                timeout=probe_timeout, capture_output=True,
            )
            tunnel_up = probe.returncode == 0 and b"up" in probe.stdout
        except Exception:  # noqa: BLE001 — timeout or spawn failure
            tunnel_up = False
        if not tunnel_up:
            errors.append(
                f"tunnel preflight failed ({probe_timeout:.0f}s); "
                "falling back to CPU backend at reduced rows"
            )
            log(errors[-1])
            force_cpu = True
            result["tunnel_dead"] = True

    try:
        import jax

        # honor an explicit CPU request: the env var alone does not stop
        # the axon PJRT plugin from initializing (and HANGING during a
        # tunnel outage) — the config update post-import does, exactly
        # like tests/conftest.py
        if force_cpu:
            jax.config.update("jax_platforms", "cpu")

        on_tpu_default = 2_000_000
        try:
            on_tpu_default = 2_000_000 if jax.default_backend() == "tpu" else 100_000
        except Exception:  # noqa: BLE001
            pass
        n_rows = int(os.environ.get("ARAG_BENCH_ROWS", on_tpu_default))
        # transient co-tenant pressure on the shared pool: retry ONCE at
        # half scale, reported. ANY phase's RESOURCE_EXHAUSTED qualifies
        # (the slice-wise build is the allocation-heaviest part), and the
        # retry runs OUTSIDE the except block — inside it, the handled
        # exception's traceback pins the first attempt's frames and with
        # them ~4.6 GB of device buffers, so a nested retry re-OOMs.
        retry_rows = 0
        try:
            run_bench(result, errors, n_rows)
        except Exception as exc:  # noqa: BLE001
            if not (isinstance(exc, _Oom) or _is_oom(exc)):
                raise
            errors.append(f"oom@{n_rows}: {str(exc)[:300]}")
            log(f"RESOURCE_EXHAUSTED at {n_rows} rows; retrying at {n_rows // 2}")
            retry_rows = n_rows // 2
        if retry_rows:
            gc.collect()  # attempt-1 frames are free now; drop their buffers
            result["rows_reduced"] = True
            run_bench(result, errors, retry_rows)
    except Exception as exc:  # noqa: BLE001 — the JSON line still prints
        errors.append(f"fatal: {exc!r}"[:300])
        log(f"fatal: {exc!r}")
    finally:
        emit()


if __name__ == "__main__":
    main()
