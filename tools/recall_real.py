"""int8/s8s8 + IVF recall on REAL encoder embeddings, up to 2M rows.

VERDICT r3 weak #4 (quantization recall on real embeddings) and VERDICT
r4 weak #5 / next #4 (IVF recall at PRODUCTION scale on real
embeddings): synthetic Gaussians have well-separated scores; real
mean-pooled MPNet outputs are extremely tie-dense (off-diag cosine mean
~0.988 at 100k), which is exactly where int8 quantization AND cluster
pruning could start costing. This tool:

1. embeds an N-row synthetic-text corpus through the full-size encoder
   (random-init — zero egress, same architecture/pooling as
   all-mpnet-base-v2) in 100k-row slices, caching each slice to
   /tmp/arag_recall_real/ so tunnel outages never lose work;
2. computes the fp32 oracle top-k ON THE HOST (slice-wise numpy matmul
   + partial-sort merge — no fresh device compiles, outage-proof);
3. measures recall@10 vs that oracle at tie_tol 5e-3 AND 0 for
   bf16 fused / int8 "row" / int8 "s8s8";
4. builds the production IVF config (4096 clusters at >=1M rows,
   1024-row blocks, int8) and measures device-planned recall@10 at
   nprobe 8/16/32 plus amortized latency vs the flat int8 kernel
   (dispatch-K-fetch-once, per CLAUDE.md measurement truths).

Run (TPU): python tools/recall_real.py [rows=100000]
Writes one JSON line to stdout and /tmp/recall_real.json.
"""
import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_Q, K = min(512, N_ROWS // 4), 10
SLICE = 100_000
CACHE_DIR = pathlib.Path(os.environ.get("ARAG_RECALL_CACHE",
                                        "/tmp/arag_recall_real"))
T0 = time.perf_counter()


def log(m):
    print(f"[recall_real +{time.perf_counter()-T0:7.1f}s] {m}",
          file=sys.stderr, flush=True)


def _texts_for_slice(rng, n):
    """Zipfian draws from a 50k-word vocab, 30-150 words per chunk."""
    vocab_words = np.array([f"w{i}" for i in range(50_000)])
    texts = []
    for _ in range(n):
        m = int(rng.integers(30, 150))
        u = rng.random(m)
        ids = np.minimum(
            (np.exp(u * np.log(len(vocab_words))) - 1).astype(np.int64),
            len(vocab_words) - 1,
        )
        texts.append(" ".join(vocab_words[ids]))
    return texts


def _build_embedder(on_tpu):
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.embed.runner import Embedder
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.tokenize import WordPieceTokenizer

    cfg = ModelConfig()  # full-size all-mpnet-base-v2 dims
    params = init_params(jax.random.PRNGKey(0), cfg,
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    tok = WordPieceTokenizer.toy()
    native = None
    try:
        from arxiv_rag_tpu.tokenize.native import (
            NativeWordPieceTokenizer, is_available,
        )

        if is_available():
            # the native core loads a vocab FILE (one token per line,
            # line == id); write the toy vocab out if it is dense
            import tempfile

            size = max(tok.vocab.values()) + 1
            toks = [None] * size
            for t, i in tok.vocab.items():
                toks[i] = t
            if all(t is not None for t in toks):
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".vocab.txt", delete=False, encoding="utf-8"
                ) as f:
                    f.write("\n".join(toks) + "\n")
                native = NativeWordPieceTokenizer(
                    f.name, specials=tok.specials,
                    do_lower_case=tok.do_lower_case,
                )
                log("native tokenizer engaged")
    except Exception:  # noqa: BLE001
        native = None
    return Embedder(
        params, cfg, tok, buckets=(128, 256), batch_size=512,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        native_tokenizer=native,
    )


def _embeddings(on_tpu):
    """[N_ROWS, 768] f32 L2-normalized, slice-cached on disk."""
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    slices = []
    embedder = None
    t_embed = 0.0
    embedded_rows = 0
    for start in range(0, N_ROWS, SLICE):
        n = min(SLICE, N_ROWS - start)
        path = CACHE_DIR / f"embs_s{start}_n{n}.npy"
        if path.exists():
            slices.append(np.load(path))
            continue
        if embedder is None:
            embedder = _build_embedder(on_tpu)
            # compile probe first, with its own log line — a queued
            # remote compile on the loaded shared pool looks like a
            # hang otherwise (observed 40+ min for a cold encode shape)
            for warm_len in (40, 120):
                t0 = time.perf_counter()
                _ = embedder.encode_texts(["word " * warm_len] * 512)
                log(f"encode bucket for ~{warm_len}-word texts warm "
                    f"({time.perf_counter() - t0:.1f}s)")
        # slice seed is its start offset: deterministic, order-free
        texts = _texts_for_slice(np.random.default_rng(start + 1), n)
        t0 = time.perf_counter()
        embs = np.asarray(embedder.encode_texts(texts), np.float32)
        t_embed += time.perf_counter() - t0
        embedded_rows += n
        tmp = path.with_suffix(".tmp.npy")
        np.save(tmp, embs)
        tmp.rename(path)
        slices.append(embs)
        log(f"slice {start}..{start+n} embedded+cached "
            f"({embedded_rows / max(t_embed, 1e-9):.0f} chunks/s cumulative)")
    out = np.concatenate(slices, axis=0) if len(slices) > 1 else slices[0]
    rate = embedded_rows / t_embed if t_embed > 0 else 0.0
    return out, rate


def _host_oracle(embs, queries, k):
    """fp32 top-k on the host: slice-wise BLAS matmul + partial sort.

    No device work at all — the oracle survives tunnel outages and
    never pays a fresh XLA compile (CLAUDE.md round-4 lesson).
    """
    nq = queries.shape[0]
    best_v = np.full((nq, k), -np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    for start in range(0, embs.shape[0], SLICE):
        block = embs[start:start + SLICE]
        scores = queries @ block.T  # [nq, slice]
        take = min(k, scores.shape[1])
        part = np.argpartition(-scores, take - 1, axis=1)[:, :take]
        pv = np.take_along_axis(scores, part, axis=1)
        cand_v = np.concatenate([best_v, pv], axis=1)
        cand_i = np.concatenate([best_i, part + start], axis=1)
        sel = np.argsort(-cand_v, axis=1, kind="stable")[:, :k]
        best_v = np.take_along_axis(cand_v, sel, axis=1)
        best_i = np.take_along_axis(cand_i, sel, axis=1)
    return best_v, best_i


def _amortized_ms(fn, reps=6):
    """Median-free amortized wall time: dispatch reps calls, fetch once
    (in-order stream — fetching the last forces all prior work)."""
    out = fn()  # warm/compile
    np.asarray(out[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    np.asarray(outs[-1][0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.pallas_topk import fused_topk, fused_topk_int8
    from arxiv_rag_tpu.ops.quant import quantize_int8
    from arxiv_rag_tpu.ops.topk import recall_at_k

    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()} rows={N_ROWS}")

    rng = np.random.default_rng(0)
    embs, embed_rate = _embeddings(on_tpu)
    log(f"embeddings ready: {embs.shape}"
        + (f" ({embed_rate:.0f} chunks/s)" if embed_rate else " (cached)"))
    assert np.allclose(np.linalg.norm(embs[:64], axis=1), 1.0, atol=1e-3)

    # cosine-sim stats: how tie-dense is this corpus vs Gaussians?
    sample = embs[rng.choice(N_ROWS, min(N_ROWS, 2048), replace=False)]
    sims = sample @ sample.T
    off = sims[~np.eye(len(sims), dtype=bool)]
    log(f"pairwise cosine: mean {off.mean():.4f} p99 "
        f"{np.percentile(off, 99):.4f} max {off.max():.4f} "
        f"(Gaussian-768 mean ~0.000)")

    qi = rng.choice(N_ROWS, N_Q, replace=False)
    qf32 = np.ascontiguousarray(embs[qi], dtype=np.float32)
    queries = jnp.asarray(qf32)

    t0 = time.perf_counter()
    ov, oi = _host_oracle(embs, qf32, K)
    log(f"host fp32 oracle ready in {time.perf_counter()-t0:.1f}s; "
        f"oracle kth-score mean {ov[:, -1].mean():.4f}")
    assert (oi[:, 0] == qi).mean() > 0.99, "self-retrieval should top the list"

    i8_vals, i8_scales = quantize_int8(jnp.asarray(embs))

    result = {
        "rows": N_ROWS, "queries": N_Q, "k": K,
        "embed_chunks_per_sec": round(embed_rate, 1),
        "cos_offdiag_mean": round(float(off.mean()), 4),
        "cos_offdiag_p99": round(float(np.percentile(off, 99)), 4),
    }

    def measure(name, fn):
        v, i = fn()
        v, i = np.asarray(v, np.float32), np.asarray(i)
        for tol, tag in ((5e-3, "tol5e3"), (0.0, "strict")):
            r = recall_at_k(i, oi, ov, tie_tol=tol, candidate_scores=v)
            result[f"recall_{name}_{tag}"] = round(float(r), 4)
        log(f"{name}: recall@{K} = {result[f'recall_{name}_tol5e3']:.4f} "
            f"(tie_tol 5e-3) / {result[f'recall_{name}_strict']:.4f} (strict)")

    # bf16 first, then drop it from device memory before IVF at scale
    index_bf16 = jnp.asarray(embs).astype(jnp.bfloat16)
    measure("bf16", lambda: fused_topk(
        index_bf16, queries.astype(jnp.bfloat16), K))
    del index_bf16
    measure("int8_row", lambda: fused_topk_int8(
        i8_vals, i8_scales, queries, K, _variant="row"))
    measure("int8_s8s8", lambda: fused_topk_int8(
        i8_vals, i8_scales, queries, K, _variant="s8s8"))

    # --- IVF on real embeddings at the PRODUCTION configuration
    # (4096 clusters / 1024-row blocks / int8 at >=1M rows): the pruning
    # loss the synthetic blob corpora can't measure
    from arxiv_rag_tpu.index.ivf import IVFIndex
    from arxiv_rag_tpu.index.store import DenseIndex

    dense = DenseIndex(
        values=np.asarray(i8_vals), scales=np.asarray(i8_scales),
        dtype="int8", normalized=True, categories=[], row_masks=None,
    )
    n_clusters = 4096 if N_ROWS >= 1_000_000 else max(16, N_ROWS // 400)
    nprobes = (8, 16, 32) if N_ROWS >= 1_000_000 else (4, 8, 16)
    t0 = time.perf_counter()
    ivf = IVFIndex.build(dense, n_clusters, block_rows=1024, iters=8, seed=0)
    result["ivf_clusters"] = n_clusters
    result["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    log(f"IVF built: {n_clusters} clusters in {result['ivf_build_s']}s")
    for nprobe in nprobes:
        v, r = ivf.search(qf32, K, nprobe=nprobe, plan="device")
        v = np.asarray(v, np.float32)
        for tol, tag in ((5e-3, "tol5e3"), (0.0, "strict")):
            rec = recall_at_k(r, oi, ov, tie_tol=tol, candidate_scores=v)
            result[f"recall_ivf_np{nprobe}_{tag}"] = round(float(rec), 4)
        log(f"ivf nprobe={nprobe}: recall@{K} = "
            f"{result[f'recall_ivf_np{nprobe}_tol5e3']:.4f} (tie_tol 5e-3) / "
            f"{result[f'recall_ivf_np{nprobe}_strict']:.4f} (strict)")

    # amortized qps: device-planned IVF at the production nprobe vs the
    # flat int8 kernel over the same index (dispatch-K-fetch-once)
    if on_tpu:
        q32 = qf32[:32]
        flat_ms = _amortized_ms(
            lambda: fused_topk_int8(i8_vals, i8_scales, jnp.asarray(q32), K))
        ivf_ms = _amortized_ms(
            lambda: ivf.search(q32, K, nprobe=nprobes[0], plan="device"))
        result["flat_int8_ms_q32"] = round(flat_ms, 2)
        result[f"ivf_np{nprobes[0]}_ms_q32"] = round(ivf_ms, 2)
        result["ivf_speedup_vs_flat"] = round(flat_ms / max(ivf_ms, 1e-9), 2)
        log(f"amortized @Q=32: flat {flat_ms:.2f} ms vs ivf(np{nprobes[0]}) "
            f"{ivf_ms:.2f} ms -> {result['ivf_speedup_vs_flat']}x")

    line = json.dumps(result)
    print(line, flush=True)
    pathlib.Path("/tmp/recall_real.json").write_text(line)


if __name__ == "__main__":
    main()
