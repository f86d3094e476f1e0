"""BM25 at the 2M-chunk target scale (round-2 weak #5 proof).

Generates a synthetic 2M-doc corpus (~150 tokens/doc, zipf-ish vocab of
50k terms — df spread like real text), builds the inverted index via
the native C++ builder, and measures build time plus topk query latency
through the scratch-scored path. A 20k slice is also built with the
pure-Python loop to record the speedup honestly (the full Python build
would take ~an hour on this 1-core host).

Usage: python tools/bm25_scale.py   (host-only; no TPU needed)
Env: ROWS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[bm25 +{time.perf_counter() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    from arxiv_rag_tpu.search import bm25_native
    from arxiv_rag_tpu.search.bm25 import BM25Index

    assert bm25_native.is_available(), "native builder required for the scale proof"
    n = int(os.environ.get("ROWS", 2_000_000))
    rng = np.random.default_rng(0)
    vocab = np.array([f"w{i}" for i in range(50_000)])
    log(f"generating {n} synthetic docs")
    texts: list[str] = []
    chunk = 50_000
    for s in range(0, n, chunk):
        m = min(chunk, n - s)
        lens = rng.integers(100, 200, m)
        total = int(lens.sum())
        # log-uniform ranks ~ zipf-ish df spread
        u = rng.random(total)
        ids = np.minimum((np.exp(u * np.log(len(vocab))) - 1).astype(np.int64),
                         len(vocab) - 1)
        words = vocab[ids]
        pos = 0
        for ln in lens.tolist():
            texts.append(" ".join(words[pos : pos + ln].tolist()))
            pos += ln
        if (s // chunk) % 10 == 0:
            log(f"  {s + m}/{n} docs")
    log(f"corpus ready ({sum(len(t) for t in texts[:1000]) / 1000:.0f} B/doc avg), rss {rss_gb():.1f} GB")

    # python-builder reference on a 20k slice (scaled estimate recorded)
    t0 = time.perf_counter()
    BM25Index.build(texts[:20_000], native=False)
    py_20k = time.perf_counter() - t0
    log(f"python build 20k: {py_20k:.1f}s (linear-scaled {n/20_000*py_20k/60:.0f} min at {n})")

    t0 = time.perf_counter()
    idx = BM25Index.build(texts, native=True)
    build_s = time.perf_counter() - t0
    log(f"native build {n}: {build_s:.1f}s, {len(idx.vocab)} terms, rss {rss_gb():.1f} GB")

    queries = [" ".join(vocab[rng.integers(0, len(vocab), 6)].tolist()) for _ in range(200)]
    idx.topk(queries[0], 10)  # builds derived caches
    t0 = time.perf_counter()
    for q in queries:
        v, r = idx.topk(q, 50)
    query_s = (time.perf_counter() - t0) / len(queries)
    log(f"topk(50) at {n} docs: {query_s * 1e3:.1f} ms/query -> {1 / query_s:.1f} qps single-threaded")

    print(json.dumps({
        "rows": n,
        "native_build_s": round(build_s, 1),
        "python_build_20k_s": round(py_20k, 1),
        "python_build_scaled_min": round(n / 20_000 * py_20k / 60, 1),
        "terms": len(idx.vocab),
        "topk50_ms": round(query_s * 1e3, 2),
        "bm25_qps": round(1 / query_s, 1),
        "max_rss_gb": round(rss_gb(), 2),
    }))


if __name__ == "__main__":
    main()
