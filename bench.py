"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): flat-scan search QPS/chip at recall@10
parity on a ~2M×768 corpus, via the Pallas fused matmul + streaming
top-k kernel over an HBM-resident bf16 index. ``vs_baseline`` is the
speedup over the reference-equivalent CPU exact scan (numpy fp32 — the
only search the reference corpus could support, and the recall oracle).

Protocol notes (sized for a tunneled single chip + 1-core host):
- the index is generated and normalized ON DEVICE (no multi-GB
  host→device transfer distorting the measurement);
- recall parity is checked against an on-device fp32 exact scan with
  HIGHEST-precision matmul (bitwise-stable ranking reference), on top
  of a host numpy cross-check over a row slice;
- the CPU baseline is timed on ``ARAG_BENCH_CPU_ROWS`` rows and scaled
  linearly to the full row count (a flat scan is bandwidth/flops-bound,
  so QPS ∝ 1/rows; the scaling is reported, not hidden).

Extra fields report recall@10 and encoder throughput (chunks/sec/chip
on the full-size all-mpnet-base-v2 forward, bf16, batch 512×seq128).

Env knobs: ARAG_BENCH_ROWS (default 2_000_000 on TPU), ARAG_BENCH_CPU_ROWS
(default 200_000), ARAG_BENCH_SKIP_ENCODER=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main() -> None:
    import jax

    # persistent compile cache: tunneled-TPU compiles cost minutes;
    # amortize across bench runs/rounds
    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import ModelConfig, encode, init_params
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk
    from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, flat_search, recall_at_k

    on_tpu = jax.default_backend() == "tpu"
    n_rows = int(os.environ.get("ARAG_BENCH_ROWS", 2_000_000 if on_tpu else 100_000))
    cpu_rows = min(n_rows, int(os.environ.get("ARAG_BENCH_CPU_ROWS", 200_000)))
    dim, q_batch, k = 768, 32, 10
    log(f"backend={jax.default_backend()} rows={n_rows} cpu_rows={cpu_rows}")

    # --- corpus + queries generated on device --------------------------------
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def make_normal(key, shape_rows):
        x = jax.random.normal(key, (shape_rows, dim), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x

    key = jax.random.PRNGKey(0)
    kq, ki = jax.random.split(key)
    queries_dev = make_normal(kq, q_batch)
    queries_dev.block_until_ready()
    log("queries ready")

    BLOCK_ROWS = 4096
    index_f32 = make_normal(ki, n_rows)
    index_f32.block_until_ready()
    log("index generated on device (fp32)")
    # pad ONCE to the kernel block multiple — an unaligned index makes
    # fused_topk pad per call (a full index copy inside the timed loop)
    pad = (-n_rows) % BLOCK_ROWS
    index = index_f32.astype(jnp.bfloat16)
    if pad:
        index = jnp.pad(index, ((0, pad), (0, 0)))
    index.block_until_ready()
    log(f"index cast to bf16 (+{pad} pad rows)")

    # CPU baseline runs in a thread while the device compiles the kernel
    # (the Pallas remote compile takes 2-10 min on the shared pool and
    # releases the GIL; the 1-core host is otherwise idle)
    import threading

    cpu_result: dict = {}

    def cpu_baseline():
        # data prep only in the thread (overlaps the remote compile);
        # the TIMING runs synchronously later on an uncontended host —
        # a threaded measurement gets inflated by fetch/decode CPU work
        rng = np.random.default_rng(0)
        host_slice = rng.standard_normal((cpu_rows, dim), dtype=np.float32)
        host_slice /= np.linalg.norm(host_slice, axis=1, keepdims=True)
        cpu_result["host_slice"] = host_slice
        cpu_result["host_q"] = np.asarray(queries_dev, np.float32)
        log("cpu baseline data ready (threaded)")

    cpu_thread = threading.Thread(target=cpu_baseline, daemon=True)
    cpu_thread.start()

    kernel_impl = "pallas_fused"

    def run_fused():
        return fused_topk(index, queries_dev.astype(jnp.bfloat16), k,
                          n_valid=n_rows, block_rows=BLOCK_ROWS)

    def run_xla():
        return flat_search(index, queries_dev, k)

    run_search = run_fused if on_tpu else run_xla

    # AOT fast path (round-3, tools/aot_fused.py proof): the plain-bf16
    # Q=32 compile historically never landed in the persistent cache
    # through this tunnel (95-320s per process, CLAUDE.md QUIRK), but a
    # serialized COMPILED executable deserializes in ~0.1s. Try the
    # payload first; after a successful normal compile, write it.
    import pickle
    from pathlib import Path as _Path

    aot_path = _Path(f"/tmp/arag_aot_fused_q{q_batch}_{index.shape[0]}x{dim}"
                     f"_b{BLOCK_ROWS}.pkl")
    nvalid_arr = jnp.asarray(np.full((1, 1), n_rows, np.int32))
    qbf_dev = queries_dev.astype(jnp.bfloat16)
    if on_tpu and aot_path.exists():
        try:
            from jax.experimental import serialize_executable as se

            with open(aot_path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            aot_compiled = se.deserialize_and_load(payload, in_tree, out_tree)

            def run_fused_aot():
                return aot_compiled(index, qbf_dev, nvalid_arr)

            run_search = run_fused_aot
            kernel_impl = "pallas_fused_aot"
            log("fused kernel loaded from AOT payload (no compile)")
        except Exception as exc:  # noqa: BLE001 — fall back to compiling
            log(f"AOT load failed ({exc}); compiling normally")

    # compile watchdog: the shared pool's remote compile takes 10s-10min;
    # if the fused kernel doesn't come up within the window, fall back to
    # the XLA scan so the driver always gets its JSON line. The compile
    # thread keeps running; if it finishes in time we still use it.
    # NOTE (2026-08-17): the plain-bf16 Q=32 kernel's compile never
    # persists to the local compile cache through this tunnel (the
    # masked/int8/Q=512 variants cache fine — repeatedly verified), so
    # every bench process pays a fresh 95-320s Mosaic compile for the
    # headline depending on pool load. 600s covers the worst observed;
    # the XLA fallback still guarantees the JSON line.
    compile_timeout = float(os.environ.get("ARAG_BENCH_COMPILE_TIMEOUT", 600.0))
    warm: dict = {}

    def _warm():
        try:
            v, i = run_search()
            warm["out"] = (v, i)
            _ = np.asarray(v)
            warm["ok"] = True
        except Exception as exc:  # noqa: BLE001 — fall back, don't die
            warm["err"] = exc

    wt = threading.Thread(target=_warm, daemon=True)
    wt.start()
    wt.join(compile_timeout if on_tpu else None)
    if not warm.get("ok"):
        if "err" in warm:
            log(f"fused kernel failed ({warm['err']}); using the XLA scan")
        else:
            log(f"fused kernel not compiled after {compile_timeout:.0f}s; "
                "using the XLA scan for the headline")
        kernel_impl = "xla_fallback"
        run_search = run_xla
        vals, ids = run_search()
        _ = np.asarray(vals)
    else:
        vals, ids = warm["out"]
    log(f"search kernel ready ({kernel_impl})")

    if on_tpu and kernel_impl == "pallas_fused" and not aot_path.exists():
        # persist the compiled executable for the next process (the jit
        # cache makes this lower+compile cheap now that it's warm)
        try:
            from jax.experimental import serialize_executable as se

            from arxiv_rag_tpu.ops.pallas_topk import _fused_topk_jit

            comp = _fused_topk_jit.lower(
                jax.ShapeDtypeStruct(index.shape, jnp.bfloat16),
                jax.ShapeDtypeStruct((q_batch, dim), jnp.bfloat16),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                k=k, block_rows=BLOCK_ROWS, interpret=False,
            ).compile()
            with open(aot_path, "wb") as f:
                pickle.dump(se.serialize(comp), f)
            log(f"AOT payload saved -> {aot_path}")
        except Exception as exc:  # noqa: BLE001
            log(f"AOT save failed: {exc}")

    # timing: result FETCH per iteration. block_until_ready through the
    # remote-device tunnel returns before execution completes (measured:
    # a 3 GB reduction "finishing" at 40 TB/s); fetching the (tiny)
    # result array forces a true roundtrip and is the only honest clock
    # in this environment.
    iters = 10 if on_tpu else 3
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        vals, ids = run_search()
        _ = np.asarray(vals)
        lat.append(time.perf_counter() - t0)
    tpu_s = sorted(lat)[len(lat) // 2]  # median fetched latency
    qps = q_batch / tpu_s
    gbps = n_rows * dim * (2 if on_tpu else 4) / tpu_s / 1e9
    log(f"timed search (fetched): {tpu_s*1e3:.2f} ms/batch -> {qps:.1f} qps, {gbps:.0f} GB/s index stream")
    # achievable-bandwidth reference: best of (a) a 1-pass reduction and
    # (b) an MXU-driven ones-matmul with the kernel's own access pattern.
    # Round 1 used only (a), which measured BELOW the kernel's streaming
    # rate (57 vs 75 GB/s — a ">100% of speed-of-light" absurdity); the
    # matmul reference reads the index the way the kernel does.
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    ones8 = jnp.ones((dim, 8), index.dtype)
    mm = jax.jit(
        lambda x, o: jnp.sum(
            jax.lax.dot_general(
                x, o, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    )
    sol_gbps = 0.0
    sol_amort_gbps = 0.0
    for name, fn in (("reduce", lambda: red(index)), ("ones-matmul", lambda: mm(index, ones8))):
        _ = np.asarray(fn())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        g = index.shape[0] * dim * (2 if on_tpu else 4) / sorted(ts)[1] / 1e9
        # amortized: 6 dispatches, one fetch — removes the ~30 ms tunnel
        # RTT that pollutes the per-call number (round-3 finding)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(6)]
        _ = np.asarray(outs[-1])
        ga = 6 * index.shape[0] * dim * (2 if on_tpu else 4) / (time.perf_counter() - t0) / 1e9
        log(f"pure-read reference ({name}): {g:.0f} GB/s fetched, {ga:.0f} GB/s amortized")
        sol_gbps = max(sol_gbps, g)
        sol_amort_gbps = max(sol_amort_gbps, ga)
    frac_sol = min(1.0, gbps / max(sol_gbps, 1e-9))
    log(f"kernel at {100*gbps/max(sol_gbps,1e-9):.0f}% of measured read bandwidth (fetched basis)")

    # Q=32 pipelined: dispatch 6 batches, one fetch each at the end. The
    # single-call number above includes a full tunnel RTT (~30 ms) per
    # batch — at Q=32 that RTT, not the device, is the dominant term
    # (round-3 finding, tools/profile_int8.py), so the pipelined figure
    # is the device's actual scan throughput.
    q32_piped_qps = 0.0
    frac_sol_dev = 0.0
    if on_tpu and kernel_impl.startswith("pallas_fused"):
        t0 = time.perf_counter()
        outs = [run_search() for _ in range(6)]
        _ = np.asarray(outs[-1][0])  # in-order stream: last bounds all
        q32_piped_qps = 6 * q_batch / (time.perf_counter() - t0)
        dev_gbps = n_rows * dim * 2 * q32_piped_qps / q_batch / 1e9
        frac_sol_dev = min(1.0, dev_gbps / max(sol_amort_gbps, 1e-9))
        log(f"search @Q=32 pipelined x6: {q32_piped_qps:.1f} qps "
            f"({dev_gbps:.0f} GB/s = {100 * frac_sol_dev:.0f}% of amortized read BW)")

    # --- serving throughput at a large query batch: q-tiled fused kernel
    # vs XLA's fused matmul+reduce (round 1: XLA won ~2x here because the
    # single-level kernel's row block shrank with Q) ------------------------
    q512_qps = 0.0
    q512_fused_qps = 0.0
    q512_piped_qps = 0.0
    q512 = None
    if on_tpu:
        q512 = make_normal(jax.random.PRNGKey(7), 512)
        f512 = jax.jit(lambda i, qq: flat_search(i, qq, k))
        _ = np.asarray(f512(index, q512)[0])
        lat512 = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f512(index, q512)[0])
            lat512.append(time.perf_counter() - t0)
        q512_qps = 512 / sorted(lat512)[len(lat512) // 2]
        log(f"serving throughput @Q=512 (xla): {q512_qps:.0f} qps")
        try:
            # auto tiling (q_block=128 / block_rows=2048 at this shape);
            # forcing BLOCK_ROWS=4096 here would shrink the query tile
            q512b = q512.astype(jnp.bfloat16)
            _ = np.asarray(fused_topk(index, q512b, k, n_valid=n_rows)[0])
            latf = []
            for _ in range(5):
                t0 = time.perf_counter()
                _ = np.asarray(fused_topk(index, q512b, k, n_valid=n_rows)[0])
                latf.append(time.perf_counter() - t0)
            q512_fused_qps = 512 / sorted(latf)[len(latf) // 2]
            log(f"serving throughput @Q=512 (fused, q-tiled): {q512_fused_qps:.0f} qps")
            # pipelined: dispatch K batches, fetch all — the production
            # number (the micro-batcher dispatches window t+1 while
            # window t's results are in flight; through the tunnel the
            # per-call fetch RTT otherwise dominates)
            t0 = time.perf_counter()
            outs = [fused_topk(index, q512b, k, n_valid=n_rows) for _ in range(6)]
            _ = np.asarray(outs[-1][0])  # fetch last only (6 fetches = 6 RTTs)
            q512_piped_qps = 6 * 512 / (time.perf_counter() - t0)
            log(f"serving throughput @Q=512 (fused, pipelined x6): "
                f"{q512_piped_qps:.0f} qps")
        except Exception as exc:  # noqa: BLE001
            log(f"fused @Q=512 failed: {exc}")

    # --- recall oracle: on-device fp32 exact scan ----------------------------
    ov_dev, oi_dev = jax.jit(
        lambda idx, q: flat_search(idx, q, k)
    )(index_f32, queries_dev)
    ov, oi = np.asarray(ov_dev), np.asarray(oi_dev)
    recall = recall_at_k(
        np.asarray(ids), oi, ov, tie_tol=5e-3,
        candidate_scores=np.asarray(vals, np.float32),
    )
    log(f"device fp32 oracle recall@{k} = {recall:.4f}")

    deadline = float(os.environ.get("ARAG_BENCH_DEADLINE", 700.0))

    def past_deadline(phase: str) -> bool:
        if time.perf_counter() - T0 > deadline:
            log(f"soft deadline ({deadline:.0f}s) hit; skipping {phase} "
                "(remote compiles on the shared pool vary 2-10 min)")
            return True
        return False

    # --- masked (category-filtered) fused variant (BASELINE configs[4]) ------
    # synthetic 8-category masks; recall vs the masked fp32 oracle. Round 1
    # never ran the masked kernels compiled on hardware.
    masked_qps = 0.0
    masked_recall = 0.0
    masked_q512_qps = 0.0
    int8m_q512_qps = 0.0
    int8_q512_qps = 0.0
    int8_q512_piped_qps = 0.0
    row_masks_dev = None
    qmask_dev = None
    if on_tpu and not past_deadline("masked variant"):
        from arxiv_rag_tpu.ops.pallas_topk import fused_topk_masked
        from arxiv_rag_tpu.ops.topk import masked_flat_search

        kmask = jax.random.PRNGKey(3)
        row_masks_dev = (
            1 << jax.random.randint(kmask, (index.shape[0],), 0, 8)
        ).astype(jnp.int32)
        want = 0b00000111  # 3 of 8 categories eligible (~37% of rows)
        qmask_dev = jnp.full((q_batch,), want, jnp.int32)
        # masked fp32 oracle FIRST (XLA scan, reliable): both masked
        # phases score against it, so it must exist even if the fused
        # kernel below fails (round-2 bug: a fused failure left momi
        # undefined and the int8+masked phase died on the NameError)
        momv, momi = jax.jit(
            lambda x, rm, qm, q: masked_flat_search(x, rm, qm, q, k)
        )(
            index_f32,
            row_masks_dev[:n_rows].astype(jnp.uint32),
            qmask_dev.astype(jnp.uint32),
            queries_dev,
        )
        momv, momi = np.asarray(momv), np.asarray(momi)
        try:
            mv, mi = fused_topk_masked(index, row_masks_dev, qmask_dev,
                                       queries_dev.astype(jnp.bfloat16), k,
                                       n_valid=n_rows, block_rows=BLOCK_ROWS)
            _ = np.asarray(mv)
            latm = []
            for _ in range(iters):
                t0 = time.perf_counter()
                mv, mi = fused_topk_masked(index, row_masks_dev, qmask_dev,
                                           queries_dev.astype(jnp.bfloat16), k,
                                           n_valid=n_rows, block_rows=BLOCK_ROWS)
                _ = np.asarray(mv)
                latm.append(time.perf_counter() - t0)
            masked_qps = q_batch / sorted(latm)[len(latm) // 2]
            masked_recall = recall_at_k(
                np.asarray(mi), momi, momv, tie_tol=5e-3,
                candidate_scores=np.asarray(mv, np.float32),
            )
            log(f"masked fused: {masked_qps:.1f} qps, recall@{k} = {masked_recall:.4f}")
            # serving shape: masked @Q=512 (round-2 weak #2 — the bench
            # never isolated the masked kernel at serving batch)
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
                masked_q512_qps = 512 / sorted(latm5)[len(latm5) // 2]
                log(f"masked fused @Q=512: {masked_q512_qps:.0f} qps")
        except Exception as exc:  # noqa: BLE001
            log(f"masked fused failed: {exc}")

    # --- int8 index variant (BASELINE configs[4]): half the bytes -------------
    # quantize in row slices (a whole-matrix quantize temporarily doubles
    # the fp32 footprint -> HBM OOM next to the bf16 copy), then free fp32
    int8_qps = 0.0
    int8_recall = 0.0
    int8m_qps = 0.0
    int8m_recall = 0.0
    if on_tpu and not past_deadline("int8 variant"):
        from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8
        from arxiv_rag_tpu.ops.quant import quantize_int8

        slices_v, slices_s = [], []
        step = max(1, n_rows // 8)
        for s in range(0, n_rows, step):
            v, sc = quantize_int8(index_f32[s : s + step])
            slices_v.append(v)
            slices_s.append(sc)
        i8_vals = jnp.concatenate(slices_v, axis=0)
        i8_scales = jnp.concatenate(slices_s, axis=0)
        if pad:
            i8_vals = jnp.pad(i8_vals, ((0, pad), (0, 0)))
            i8_scales = jnp.pad(i8_scales, (0, pad))
        del slices_v, slices_s
        index_f32.delete()  # fp32 no longer needed; free 4 bytes/elt of HBM
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
        int8_qps = q_batch / int8_s
        log(f"int8 search (fetched): {int8_s*1e3:.2f} ms/batch -> {int8_qps:.1f} qps")
        int8_recall = recall_at_k(
            np.asarray(ii), oi, ov, tie_tol=2e-2,
            candidate_scores=np.asarray(iv, np.float32),
        )
        log(f"int8 recall@{k} = {int8_recall:.4f}")

        # serving shape: int8 @Q=512 — the service's hot configuration
        # (int8 index, large coalesced windows) finally isolated in the
        # bench (round-2 weak #2)
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
                int8_q512_qps = 512 / sorted(lat85)[len(lat85) // 2]
                log(f"int8 fused @Q=512: {int8_q512_qps:.0f} qps")
                t0 = time.perf_counter()
                outs = [fused_topk_int8(i8_vals, i8_scales, q512, k,
                                        n_valid=n_rows) for _ in range(6)]
                _ = np.asarray(outs[-1][0])
                int8_q512_piped_qps = 6 * 512 / (time.perf_counter() - t0)
                log(f"int8 fused @Q=512 pipelined x6: {int8_q512_piped_qps:.0f} qps")
            except Exception as exc:  # noqa: BLE001
                log(f"int8 @Q=512 failed: {exc}")

        # --- int8 + masked: the full production layout in one kernel ------
        if row_masks_dev is not None and not past_deadline("int8+masked variant"):
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
                int8m_qps = q_batch / sorted(lat8m)[len(lat8m) // 2]
                int8m_recall = recall_at_k(
                    np.asarray(imi), np.asarray(momi), np.asarray(momv),
                    tie_tol=2e-2, candidate_scores=np.asarray(imv, np.float32),
                )
                log(f"int8+masked fused: {int8m_qps:.1f} qps, "
                    f"recall@{k} = {int8m_recall:.4f}")
                # category-filtered serving shape (int8 + masks @Q=512)
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
                    int8m_q512_qps = 512 / sorted(lat8m5)[len(lat8m5) // 2]
                    log(f"int8+masked fused @Q=512: {int8m_q512_qps:.0f} qps")
            except Exception as exc:  # noqa: BLE001
                log(f"int8+masked fused failed: {exc}")

    # --- CPU baseline: timed synchronously on the idle host. Best of 3
    # runs — a single run is hostage to transient load on this 1-core
    # host and has produced 0.28-1.8 qps for the same work across rounds
    cpu_thread.join()
    host_slice, host_q = cpu_result["host_slice"], cpu_result["host_q"]
    cpu_slice_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        hv, hi = cosine_topk_numpy(host_slice, host_q, k)
        cpu_slice_s = min(cpu_slice_s, time.perf_counter() - t0)
    cpu_qps = q_batch / (cpu_slice_s * (n_rows / cpu_rows))
    log(f"cpu scan {cpu_rows} rows: best {cpu_slice_s:.2f}s -> scaled {cpu_qps:.2f} qps @{n_rows}")

    # host numpy cross-check of the device oracle on the same slice
    xcheck = -1.0
    if not past_deadline("host/device oracle cross-check"):
        sv_dev, si_dev = jax.jit(lambda idx, q: flat_search(idx, q, k))(
            jnp.asarray(host_slice), jnp.asarray(host_q)
        )
        xcheck = recall_at_k(np.asarray(si_dev), hi, hv, tie_tol=5e-3,
                             candidate_scores=np.asarray(sv_dev, np.float32))
        log(f"host/device oracle cross-check recall = {xcheck:.4f}")

    # --- encoder throughput ---------------------------------------------------
    chunks_per_s = 0.0
    encoder_mfu = 0.0
    if os.environ.get("ARAG_BENCH_SKIP_ENCODER") != "1" and not past_deadline("encoder"):
        cfg = ModelConfig()
        params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        enc_batch, seq = (512, 128) if on_tpu else (16, 64)
        ids_in = jnp.asarray(
            np.random.default_rng(1).integers(4, cfg.vocab_size, (enc_batch, seq)),
            jnp.int32,
        )
        mask_in = jnp.ones((enc_batch, seq), jnp.int32)
        enc_fn = jax.jit(lambda p, i, m: encode(p, i, m, cfg, compute_dtype=jnp.bfloat16))
        _ = np.asarray(enc_fn(params, ids_in, mask_in))
        log("encoder compiled")
        enc_iters = 5 if on_tpu else 2
        t0 = time.perf_counter()
        for _ in range(enc_iters):
            out = enc_fn(params, ids_in, mask_in)
            _ = np.asarray(out)  # honest sync (see note above)
        chunks_per_s = enc_batch * enc_iters / (time.perf_counter() - t0)
        log(f"encoder: {chunks_per_s:.1f} chunks/s")
        # MFU: model FLOPs over the chip's bf16 peak — tracked so future
        # libtpu/XLA flips show up against the measured "XLA-lowering-
        # limited" ceiling (round-2 weak #7). Per token per layer:
        # 8h^2 (QKV+out) + 4*seq*h (scores+apply) + 4*h*ff (FFN) FLOPs.
        L, h, ff = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
        flops_per_token = L * (8 * h * h + 4 * seq * h + 4 * h * ff)
        peak = float(os.environ.get("ARAG_TPU_PEAK_TFLOPS", 197.0)) * 1e12
        encoder_mfu = chunks_per_s * seq * flops_per_token / peak
        log(f"encoder MFU: {100 * encoder_mfu:.1f}% of {peak / 1e12:.0f} TF/s peak "
            f"({chunks_per_s * seq * flops_per_token / 1e12:.1f} TF/s)")

    # --- W8A8 encoder via the Pallas s8s8 MXU kernel (ops/pallas_matmul.py):
    # v5e runs int8 matmuls at 2x the bf16 MAC rate, and the encoder is
    # MXU-limited; XLA's int8 lowering measured neutral (CLAUDE.md), so
    # measure the forced-int8-path kernel against the bf16 number above
    w8a8_chunks_per_s = 0.0
    w8a8_cos = 0.0
    if (on_tpu and chunks_per_s > 0
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
                w8a8_chunks_per_s = enc_batch * enc_iters / (time.perf_counter() - t0)
                log(f"w8a8 encoder (pallas): {w8a8_chunks_per_s:.1f} chunks/s, "
                    f"cos vs bf16 = {w8a8_cos:.5f}")
        finally:
            os.environ.pop("ARAG_W8A8_PALLAS", None)

    # --- CPU encoder baseline: the reference's actual stack (torch CPU
    # workers, generate_embeddings_parallel.py:40-74) — evidences the
    # BASELINE ">10x CPU embedding throughput" target with a measured
    # number instead of an assumption
    cpu_chunks_per_s = 0.0
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
            log(f"cpu encoder (torch, {os.cpu_count()} threads): "
                f"{cpu_chunks_per_s:.2f} chunks/s")
        except Exception as exc:  # noqa: BLE001
            log(f"cpu encoder baseline failed: {exc}")

    print(
        json.dumps(
            {
                "metric": f"flat_scan_qps_per_chip_{n_rows}x{dim}_bf16_recall_parity",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 2),
                "recall_at_10": round(float(recall), 4),
                "oracle_xcheck": round(float(xcheck), 4),
                "int8_qps": round(int8_qps, 2),
                "int8_recall_at_10": round(float(int8_recall), 4),
                "masked_qps": round(masked_qps, 2),
                "masked_recall_at_10": round(float(masked_recall), 4),
                "int8_masked_qps": round(int8m_qps, 2),
                "int8_masked_recall_at_10": round(float(int8m_recall), 4),
                "cpu_exact_qps_scaled": round(cpu_qps, 3),
                "embed_chunks_per_sec": round(chunks_per_s, 1),
                "embed_w8a8_chunks_per_sec": round(w8a8_chunks_per_s, 1),
                "w8a8_cos_vs_bf16": round(w8a8_cos, 5),
                "cpu_encoder_chunks_per_sec": round(cpu_chunks_per_s, 2),
                "encoder_vs_cpu": round(chunks_per_s / cpu_chunks_per_s, 1)
                if cpu_chunks_per_s else 0.0,
                "qps_at_q32_pipelined": round(q32_piped_qps, 1),
                "qps_at_q512_xla": round(q512_qps, 1),
                "qps_at_q512_fused": round(q512_fused_qps, 1),
                "qps_at_q512_fused_pipelined": round(q512_piped_qps, 1),
                "qps_at_q512_int8": round(int8_q512_qps, 1),
                "qps_at_q512_int8_pipelined": round(int8_q512_piped_qps, 1),
                "qps_at_q512_masked": round(masked_q512_qps, 1),
                "qps_at_q512_int8_masked": round(int8m_q512_qps, 1),
                "encoder_mfu": round(float(encoder_mfu), 4),
                "fraction_of_read_bw": round(float(frac_sol), 3),
                "fraction_of_read_bw_device": round(float(frac_sol_dev), 3),
                "read_bw_amortized_gbps": round(float(sol_amort_gbps), 1),
                "kernel": kernel_impl,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
