"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): flat-scan search QPS/chip at recall@10
parity on a ~2M×768 corpus, via the Pallas fused matmul + streaming
top-k kernel over an HBM-resident bf16 index. ``vs_baseline`` is the
speedup over the reference-equivalent CPU exact scan (numpy fp32 — the
only search the reference corpus could support, and the recall oracle).

Extra fields report recall@10 vs the oracle and encoder throughput
(chunks/sec/chip on the full-size all-mpnet-base-v2 forward).

Env knobs: ARAG_BENCH_ROWS (default 2_000_000), ARAG_BENCH_ORACLE_Q
(queries used for the CPU oracle / baseline timing).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import ModelConfig, encode, init_params
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk
    from arxiv_rag_tpu.ops.topk import cosine_topk_numpy, flat_search, recall_at_k

    on_tpu = jax.default_backend() == "tpu"
    n_rows = int(os.environ.get("ARAG_BENCH_ROWS", 2_000_000 if on_tpu else 100_000))
    dim, q_batch, k = 768, 32, 10
    rng = np.random.default_rng(0)

    # --- corpus + queries (host fp32 for the oracle, device bf16 index) ---
    host_index = rng.standard_normal((n_rows, dim), dtype=np.float32)
    host_index /= np.linalg.norm(host_index, axis=1, keepdims=True)
    queries = rng.standard_normal((q_batch, dim), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    index = jnp.asarray(host_index, jnp.bfloat16)
    jq = jnp.asarray(queries)

    def run_search():
        if on_tpu:
            return fused_topk(index, jq, k, block_rows=2048)
        return flat_search(index, jq, k)

    # compile + warm
    vals, ids = run_search()
    vals.block_until_ready()

    # --- timed TPU search ---
    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        vals, ids = run_search()
    vals.block_until_ready()
    tpu_s = (time.perf_counter() - t0) / iters
    qps = q_batch / tpu_s

    # --- recall parity vs CPU exact scan (also the baseline timing) ---
    t0 = time.perf_counter()
    ov, oi = cosine_topk_numpy(host_index, queries, k)
    cpu_s = time.perf_counter() - t0
    cpu_qps = q_batch / cpu_s
    recall = recall_at_k(
        np.asarray(ids), oi, ov, tie_tol=5e-3,
        candidate_scores=np.asarray(vals, np.float32),
    )

    # --- encoder throughput (full-size MPNet, bf16, batch 256 × seq 128) ---
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    enc_batch, seq = (256, 128) if on_tpu else (16, 64)
    ids_in = jnp.asarray(rng.integers(4, cfg.vocab_size, (enc_batch, seq)), jnp.int32)
    mask_in = jnp.ones((enc_batch, seq), jnp.int32)
    enc_fn = jax.jit(lambda p, i, m: encode(p, i, m, cfg, compute_dtype=jnp.bfloat16))
    enc_fn(params, ids_in, mask_in).block_until_ready()
    enc_iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(enc_iters):
        out = enc_fn(params, ids_in, mask_in)
    out.block_until_ready()
    chunks_per_s = enc_batch * enc_iters / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": f"flat_scan_qps_per_chip_{n_rows}x{dim}_bf16_recall_parity",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 2),
                "recall_at_10": round(recall, 4),
                "cpu_exact_qps": round(cpu_qps, 2),
                "embed_chunks_per_sec": round(chunks_per_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
