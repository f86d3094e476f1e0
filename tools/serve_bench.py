"""Service-level throughput benchmark: HTTP server + micro-batcher +
fused kernel against a device-built index.

Measures what a deployed user sees — concurrent HTTP clients firing
text queries through ``serve.py``'s micro-batcher (encode -> fused scan
-> hydrate per coalesced window, dispatch/fetch pipelined) — rather
than any single kernel's number. The reference has no serving stack at
all (retrieval existed only as config, SURVEY.md TL;DR), so this is the
framework's own production proof.

Run on the TPU host:  python tools/serve_bench.py [--rows 2000000]
(CPU fallback uses a small index; numbers then only smoke the plumbing.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--queries-per-client", type=int, default=8)
    ap.add_argument("--qbatch", type=int, default=1,
                    help="queries per HTTP request")
    ap.add_argument("--batch-window-ms", type=float, default=8.0)
    ap.add_argument("--dtype", choices=("bfloat16", "int8"), default="bfloat16",
                    help="index storage dtype (int8 = half the HBM bytes)")
    ap.add_argument("--nprobe", type=int, default=None,
                    help="serve through the device-planned IVF route "
                         "(builds an IVF delta over the index; this is a "
                         "service-level THROUGHPUT probe — recall on real "
                         "embeddings is RECALL_r05's evidence)")
    ap.add_argument("--ivf-clusters", type=int, default=4096)
    ap.add_argument("--hybrid-alpha", type=float, default=None,
                    help="enable hybrid retrieval (BM25 over a synthetic "
                         "corpus, built natively, merged at this alpha)")
    ap.add_argument("--rerank", action="store_true",
                    help="enable cross-encoder rerank of the top "
                         "rerank-top-k (ms-marco-MiniLM compute shape, "
                         "random init)")
    ap.add_argument("--rerank-top-k", type=int, default=50)
    ap.add_argument("--rerank-pair-len", type=int, default=256,
                    help="cross-encoder pair truncation (0 = model max; "
                         "round-4 A/B vs the old 512-token pairs)")
    ap.add_argument("--rerank-cascade", type=int, default=0,
                    help="cascade depth: score all pairs at a 64-token "
                         "truncation, rescore only the top N survivors "
                         "per query at full pair length (0 = off, the "
                         "reference's single-stage flagship config)")
    ap.add_argument("--rerank-window-pairs", type=int, default=2048,
                    help="admission cap on (query,passage) pairs per "
                         "window (0 = unbounded)")
    ap.add_argument("--corpus-dir", default=None,
                    help="cache dir for the synthetic corpus parquet "
                         "(default /tmp/arag_serve_corpus_<rows>)")
    ap.add_argument("--reload-mid-run", action="store_true",
                    help="save the index to disk and POST /admin/reload "
                         "once ~1/3 of requests completed — measures the "
                         "zero-downtime swap under saturating load "
                         "(errors stay 0, reload timings reported)")
    args = ap.parse_args()

    import jax

    # honor an explicit CPU request: env alone doesn't stop the axon
    # plugin init (which hangs in a tunnel outage) — same as bench.py
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from arxiv_rag_tpu.config import load_config
    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.index.store import DenseIndex
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.search import SearchEngine
    from arxiv_rag_tpu.serve import serve_in_thread
    from arxiv_rag_tpu.tokenize import WordPieceTokenizer

    on_tpu = jax.default_backend() == "tpu"
    n_rows = args.rows or (2_000_000 if on_tpu else 20_000)
    dim = 768

    def log(m: str) -> None:
        print(f"[serve_bench] {m}", file=sys.stderr, flush=True)

    log(f"backend={jax.default_backend()} rows={n_rows}")

    # random-weight full-size encoder + toy char vocab: self-contained
    # (zero egress), same compute shape as the converted checkpoint
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tok = WordPieceTokenizer.toy()
    embedder = Embedder(
        params, cfg, tok, buckets=(32, 64), batch_sizes=(64, 512),
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )

    ivf = None
    if args.nprobe:
        # IVF serving mode: HOST-generated clustered corpus with exact
        # by-construction assignments (bench.py's IVF-phase recipe) —
        # a k-means over the on-device corpus would round-trip ~6 GB
        # f32 through the tunnel and wait on fresh XLA compiles from
        # the shared pool; this path depends on NO compile except the
        # IVF kernel itself (warm after the runbook's warm_bench).
        # Queries come from the random-init encoder, so this mode is a
        # serving-path THROUGHPUT probe; recall evidence for the same
        # config is tools/recall_real.py (RECALL_r05).
        from arxiv_rag_tpu.index.ivf import IVFIndex

        n_cl = args.ivf_clusters
        if n_cl > n_rows:
            n_cl = max(2, n_rows // 256)
            log(f"ivf-clusters clamped to {n_cl} for {n_rows} rows")
        t0 = time.perf_counter()
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((n_cl, dim)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        host_vals = np.empty((n_rows, dim), np.float32)
        cid = np.empty((n_rows,), np.int32)
        step = max(1, n_rows // 8)
        for s in range(0, n_rows, step):
            rows = min(step, n_rows - s)
            c = ((np.arange(s, s + rows, dtype=np.int64) * n_cl)
                 // n_rows).astype(np.int32)
            x = centers[c]
            x += 0.025 * rng.standard_normal((rows, dim)).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            host_vals[s:s + rows] = x
            cid[s:s + rows] = c
        if args.dtype == "int8":
            sc = np.maximum(np.abs(host_vals).max(axis=1), 1e-12) / 127.0
            q8 = np.clip(np.round(host_vals / sc[:, None]),
                         -127, 127).astype(np.int8)
            idx = DenseIndex(
                values=q8, scales=sc.astype(np.float32), dtype="int8",
                normalized=True, categories=[], row_masks=None,
                chunk_ids=None,
            )
        else:
            import ml_dtypes

            idx = DenseIndex(
                values=host_vals.astype(ml_dtypes.bfloat16), scales=None,
                dtype="bfloat16", normalized=True, categories=[],
                row_masks=None, chunk_ids=None,
            )
        del host_vals
        # exact centroids/assignments skip training AND assignment; the
        # proportional map is already cluster-sorted, so build's argsort
        # permute is the identity
        ivf = IVFIndex.build(idx, n_cl, block_rows=1024,
                             centroids=centers, assignments=cid)
        idx.to_device()
        ivf = ivf.to_device()
        log(f"host-clustered corpus + IVF delta resident: {n_cl} clusters "
            f"in {time.perf_counter() - t0:.0f}s (nprobe={args.nprobe})")
        _build_plain_index = False
    else:
        _build_plain_index = True

    # index generated and normalized on device (no 6 GB host upload)
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def make_normal(key, rows):
        x = jax.random.normal(key, (rows, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    if _build_plain_index:
        values_f32 = make_normal(jax.random.PRNGKey(3), n_rows)
    if not _build_plain_index:
        pass
    elif args.dtype == "int8":
        from arxiv_rag_tpu.ops.quant import quantize_int8

        # quantize in row slices: a whole-matrix pass materializes fp32
        # intermediates next to the 6 GB source and OOMs HBM at 2M rows
        sv, ss = [], []
        step = max(1, n_rows // 8)
        for s in range(0, n_rows, step):
            v, sc = quantize_int8(values_f32[s : s + step])
            sv.append(v)
            ss.append(sc)
        qv = jnp.concatenate(sv, axis=0)
        qs = jnp.concatenate(ss, axis=0)
        del sv, ss
        values_f32.delete()
        idx = DenseIndex(
            values=qv, scales=qs, dtype="int8", normalized=True,
            categories=[], row_masks=None, chunk_ids=None,
        )
        _ = np.asarray(qv[0, 0])
    else:
        values = values_f32.astype(jnp.bfloat16)
        _ = np.asarray(values[0, 0])
        idx = DenseIndex(
            values=values, scales=None, dtype="bfloat16", normalized=True,
            categories=[], row_masks=None, chunk_ids=None,
        )
    if _build_plain_index:
        idx.to_device()
        log("index resident on device")

    # ---- optional flagship retrieval config: hybrid + rerank ----------
    # (the reference's configured-but-never-built mode,
    # config.yaml:62-69: hybrid semantic_weight 0.7, rerank top-50)
    corpus = bm25 = reranker = None
    if args.hybrid_alpha is not None or args.rerank:
        from pathlib import Path as _P

        import numpy as _np

        from arxiv_rag_tpu.store import ChunkRecord, CorpusReader, CorpusWriter

        cdir = _P(args.corpus_dir or f"/tmp/arag_serve_corpus_{n_rows}")
        vocab_words = _np.array([f"w{i}" for i in range(50_000)])
        if not (cdir / "corpus.json").exists():
            log(f"writing synthetic corpus parquet to {cdir} (once)")
            rng = _np.random.default_rng(0)
            with CorpusWriter(cdir) as w:
                for s in range(0, n_rows, 50_000):
                    m = min(50_000, n_rows - s)
                    lens = rng.integers(20, 40, m)
                    total = int(lens.sum())
                    u = rng.random(total)
                    ids = _np.minimum(
                        (_np.exp(u * _np.log(len(vocab_words))) - 1).astype(_np.int64),
                        len(vocab_words) - 1,
                    )
                    words = vocab_words[ids]
                    pos = 0
                    for j, ln in enumerate(lens.tolist()):
                        w.add(ChunkRecord(
                            paper_id=f"p{(s + j) // 20}", chunk_index=(s + j) % 20,
                            text=" ".join(words[pos : pos + ln].tolist()),
                            category="cs.LG", section="body", page=1,
                        ))
                        pos += ln
        # 2 GB row-group cache: the 2M corpus's text column is ~0.5 GB,
        # so the default 512 MB budget evicts mid-window and every
        # hybrid window re-reads cold parquet groups (measured: hydrate
        # p95 7.8 s on the first run)
        corpus = CorpusReader(cdir, cache_bytes=2 << 30)
        assert corpus.num_rows == n_rows, (corpus.num_rows, n_rows)
        if args.hybrid_alpha is not None:
            from arxiv_rag_tpu.search.bm25 import BM25Index

            bm25_path = cdir / "bm25.npz"
            t0 = time.perf_counter()
            if bm25_path.exists():
                bm25 = BM25Index.load(bm25_path)
                log(f"bm25 loaded from {bm25_path} in {time.perf_counter() - t0:.0f}s")
            else:
                bm25 = BM25Index.build(corpus.texts(), native=True)
                log(f"bm25 built natively over {n_rows} docs in "
                    f"{time.perf_counter() - t0:.0f}s")
                bm25.save(bm25_path)
        if args.rerank:
            from arxiv_rag_tpu.models.bert import BertConfig, init_params as bert_init
            from arxiv_rag_tpu.search.rerank import CrossEncoderReranker

            # ms-marco-MiniLM-L-6-v2 compute shape (the reference's
            # configured reranker): 6 layers, hidden 384, ff 1536
            bcfg = BertConfig(
                vocab_size=len(tok.vocab), hidden_size=384,
                num_hidden_layers=6, num_attention_heads=12,
                intermediate_size=1536, max_position_embeddings=512,
                pad_token_id=tok.pad_id, num_labels=1,
            )
            reranker = CrossEncoderReranker(
                bert_init(jax.random.PRNGKey(5), bcfg, dtype=jnp.bfloat16),
                bcfg, tok, batch_size=1024,
                max_pair_len=args.rerank_pair_len or None,
                compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            )

    rcfg = load_config(environ={}).retrieval
    if args.nprobe:
        import dataclasses as _dc_np

        rcfg = _dc_np.replace(rcfg, nprobe=args.nprobe)
    if args.rerank:
        import dataclasses

        rcfg = dataclasses.replace(
            rcfg, rerank_top_k=args.rerank_top_k,
            rerank_max_pair_len=args.rerank_pair_len,
            rerank_max_window_pairs=args.rerank_window_pairs,
            rerank_cascade_depth=args.rerank_cascade,
        )
    engine = SearchEngine(idx, embedder=embedder, cfg=rcfg, corpus=corpus,
                          bm25=bm25, reranker=reranker, ivf=ivf)
    # warm every compiled shape the windows can hit before timing: the
    # engine buckets Q to 8/32/64/128/256/384/512, and a remote kernel
    # compile mid-benchmark stalls whole windows for minutes (measured:
    # p50 1.4 s / 89 qps on a run that only warmed Q<=8)
    for qn in (1, 32, 64, 128, 256, 384, 512):
        # both token buckets per Q bucket — a cold encode shape mid-run
        # stalls a window ~3 s even with everything else warm
        engine.search([f"warm {i}" for i in range(qn)], k=10)
        engine.search(
            [f"warm {i} dense retrieval benchmark query padding" for i in range(qn)],
            k=10,
        )
        log(f"warmed Q bucket for {qn} queries")
    if reranker is not None:
        # every (bs, bucket) forward + the pow-2 logit-concat counts:
        # the warm queries above only hit the buckets THEY pad to, and
        # a cold shape/count mid-run stalls whole windows on the shared
        # compile pool
        t0 = time.perf_counter()
        warmed = reranker.warm(max_window_pairs=args.rerank_window_pairs
                               or 2048)
        log(f"rerank buckets warmed in {time.perf_counter() - t0:.0f}s: "
            f"{warmed}")
    log("engine warmed")
    if corpus is not None:
        # resident hydration cache before timing — otherwise the first
        # windows pay the whole cold fill (measured: hydrate p95 7.5 s,
        # run-level qps halved by the transient)
        t0 = time.perf_counter()
        groups = engine.warm_hydration()
        log(f"hydration cache prewarmed in {time.perf_counter() - t0:.0f}s "
            f"({groups} row groups, {corpus._rg_cache_size / 1e6:.0f} MB)")

    # per-stage timers restart here so the reported stage p50/p95
    # reflect the timed run, not warmup/prewarm (round-4: the hybrid
    # p95 tail needed per-stage attribution — VERDICT r3 weak/next #8)
    from arxiv_rag_tpu.logging_utils import METRICS

    METRICS.reset()
    # snapshot rerank work counters at the same instant: the warmup
    # queries above ran real rerank windows, and rerank_flops must pair
    # run-only FLOPs with the run-only stage timer
    rerank_stats0 = None
    if reranker is not None:
        import copy as _copy

        rerank_stats0 = _copy.deepcopy(reranker.stats)
    reload_dir = None
    if args.reload_mid_run:
        from pathlib import Path as _PR

        reload_dir = _PR(f"/tmp/arag_serve_index_{n_rows}_{args.dtype}")
        if not (reload_dir / "index.json").exists():
            t0 = time.perf_counter()
            idx.save(reload_dir)  # fetches the device values once; cached
            log(f"index saved for reload to {reload_dir} in "
                f"{time.perf_counter() - t0:.0f}s")
        else:
            log(f"reload index dir reused: {reload_dir}")
    httpd, _thr = serve_in_thread(
        engine, batch_window_ms=args.batch_window_ms, max_batch=512,
        reload_paths=None if reload_dir is None else {"index": str(reload_dir)},
    )
    host, port = httpd.server_address
    total = args.clients * args.queries_per_client
    lat: list[float] = []
    lat_lock = threading.Lock()
    errs: list[str] = []

    # hybrid-mode queries must share the corpus vocabulary or BM25
    # matches nothing and the "hybrid" number is dense in disguise
    # (round-3 bug: english query words vs the synthetic w#### vocab)
    if corpus is not None:
        _qrng = __import__("numpy").random.default_rng(42)

        def make_queries(ci: int, qi: int) -> list[str]:
            return [
                " ".join(f"w{_qrng.integers(0, 50_000)}" for _ in range(6))
                for _ in range(args.qbatch)
            ]
    else:
        def make_queries(ci: int, qi: int) -> list[str]:
            return [
                f"query {ci} {qi} {j} dense retrieval on tpu"
                for j in range(args.qbatch)
            ]

    qlock = threading.Lock()

    def client(ci: int) -> None:
        import http.client

        # keep-alive: one TCP connection per client for the whole run
        # (the server speaks HTTP/1.1) — real clients pool the same way
        conn = http.client.HTTPConnection(host, port, timeout=300)
        try:
            for qi in range(args.queries_per_client):
                with qlock:  # rng is not thread-safe
                    queries = make_queries(ci, qi)
                payload = {
                    "queries": queries,
                    "k": 10,
                }
                if args.hybrid_alpha is not None:
                    payload["hybrid_alpha"] = args.hybrid_alpha
                body = json.dumps(payload).encode()
                t0 = time.perf_counter()
                for attempt in (1, 2):  # one retry on transient errors
                    try:
                        conn.request("POST", "/search", body,
                                     {"Content-Type": "application/json"})
                        resp = conn.getresponse()
                        out = json.loads(resp.read())
                        assert resp.status == 200 and out["results"][0], (
                            resp.status, out)
                        break
                    except Exception as exc:  # noqa: BLE001
                        conn.close()
                        conn = http.client.HTTPConnection(host, port,
                                                          timeout=300)
                        if attempt == 2:
                            with lat_lock:
                                errs.append(str(exc))
                            return
                        time.sleep(0.05)
                with lat_lock:
                    lat.append(time.perf_counter() - t0)
        finally:
            conn.close()

    reload_result: dict = {}

    def reload_trigger() -> None:
        # fire once ~1/3 of requests completed: the swap lands mid-load
        while True:
            with lat_lock:
                if len(lat) >= max(1, total // 3) or len(errs) == total:
                    break
            time.sleep(0.2)
        tr = time.perf_counter()
        req = urllib.request.Request(
            f"http://{host}:{port}/admin/reload", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=1200) as resp:
                reload_result.update(json.loads(resp.read()))
        except Exception as exc:  # noqa: BLE001 — reported, run continues
            reload_result["error"] = str(exc)[:300]
        reload_result["total_s"] = round(time.perf_counter() - tr, 2)
        log(f"mid-run reload: {reload_result}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(args.clients)]
    if reload_dir is not None:
        threads.append(threading.Thread(target=reload_trigger))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    stage_ms = {}
    rerank_acct = None
    try:
        snap = METRICS.snapshot()
        for name, t in sorted(snap.get("timers", {}).items()):
            if name.startswith(("search.", "serve.")):
                stage_ms[name] = {
                    "p50_ms": round(1e3 * t["p50_s"], 1),
                    "p95_ms": round(1e3 * t["p95_s"], 1),
                    "count": t["count"],
                }
        log("stage timers: " + json.dumps(stage_ms))
        if (reranker is not None and rerank_stats0 is not None
                and reranker.stats.pairs > rerank_stats0.pairs):
            # VERDICT r4 #3: prove (or disprove) that this mode is
            # cross-encoder-FLOPs-bound. achieved_tflops is device work
            # over the rerank stage's wall time (which also contains
            # host tokenization overlapped with dispatch); compare
            # mfu_vs_peak to the encoder's ~28% XLA ceiling. All
            # counters are RUN-ONLY deltas vs the post-warmup snapshot,
            # matching the run-only stage timer.
            st, s0 = reranker.stats, rerank_stats0
            pairs = st.pairs - s0.pairs
            fpad = st.flops_padded - s0.flops_padded
            fuse = st.flops_useful - s0.flops_useful
            bucket_d = {
                str(b): st.buckets[b] - s0.buckets.get(b, 0)
                for b in sorted(st.buckets)
                if st.buckets[b] - s0.buckets.get(b, 0)
            }
            stage_s = snap["timers"].get("search.rerank", {}).get("total_s", 0.0)
            peak_tf = float(os.environ.get("ARAG_PEAK_TFLOPS", "197"))
            rerank_acct = {
                "pairs": pairs,
                "batches": st.batches - s0.batches,
                "bucket_batches": bucket_d,
                "gflops_padded": round(fpad / 1e9, 1),
                "gflops_useful": round(fuse / 1e9, 1),
                "padding_efficiency": round(fuse / fpad, 3) if fpad else None,
                "stage_total_s": round(stage_s, 2),
                "achieved_tflops": round(fpad / stage_s / 1e12, 2)
                if stage_s else None,
                "mfu_vs_peak": round(fpad / stage_s / (peak_tf * 1e12), 3)
                if stage_s else None,
                "peak_tflops_assumed": peak_tf,
            }
            log("rerank flops: " + json.dumps(rerank_acct))
    except Exception as exc:  # noqa: BLE001
        log(f"metrics snapshot failed: {exc}")
    httpd.batcher.close()
    httpd.shutdown()
    if errs:
        log(f"{len(errs)} client errors; first: {errs[0]}")
    lat.sort()
    done = len(lat)
    mode = args.dtype
    if args.nprobe:
        mode += f"_ivf{args.nprobe}"
    if args.hybrid_alpha is not None:
        mode += f"_hybrid{args.hybrid_alpha}"
    if args.rerank:
        mode += f"_rerank{args.rerank_top_k}"
        if args.rerank_cascade:
            mode += f"_cascade{args.rerank_cascade}"
    result = {
        "metric": f"service_qps_http_{n_rows}x{dim}_{mode}",
        "value": round(done * args.qbatch / wall, 1),
        "unit": "qps",
        "clients": args.clients,
        "qbatch": args.qbatch,
        "queries_ok": done * args.qbatch,
        "p50_ms": round(1e3 * lat[done // 2], 1) if done else None,
        "p95_ms": round(1e3 * lat[int(done * 0.95)], 1) if done else None,
        "errors": len(errs),
        "backend": jax.default_backend(),
        "stages": stage_ms,
    }
    if args.nprobe:
        result["nprobe"] = args.nprobe
        result["ivf_clusters"] = args.ivf_clusters
    if rerank_acct is not None:
        result["rerank_flops"] = rerank_acct
    if reload_dir is not None:
        result["reload"] = reload_result
    print(json.dumps(result))


if __name__ == "__main__":
    main()
