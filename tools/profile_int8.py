"""Profile the int8 fused top-k kernel variants on the real TPU.

Round-3 investigation (VERDICT weak #1): the int8 scan runs at ~54% of
its halved-HBM-stream ceiling (1020 qps @Q=32 on 2M rows vs ~1750+
implied by the bf16 kernel's 92%-of-read-BW). Candidate limiters and
the variant that isolates each:

- per-block fixed overhead amortized over half the bytes ->
  ``row8192`` (double the rows per block; same bytes/block as bf16@4096)
- the s8->bf16 widening feeding the MXU (possibly a slow Mosaic
  relayout: int8 tiles are (32,128), bf16 (16,128)) ->
  ``s8s8`` (native s8xs8->s32 MXU path, no widening)
- the [QB,BN] f32 dequant multiply -> ``nodq`` (probe, recall-broken)

All variants are timed INTERLEAVED in one process (per CLAUDE.md:
standalone timings through the tunnel are not trustworthy). Output: one
JSON line with per-variant median ms and qps.

Usage: python tools/profile_int8.py   (real TPU; ~10-20 min cold compiles)
Env: ROWS (default 2_000_000), ITERS (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from functools import partial

import numpy as np

T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[prof +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8
    from arxiv_rag_tpu.ops.quant import quantize_int8

    n_rows = int(os.environ.get("ROWS", 2_000_000))
    iters = int(os.environ.get("ITERS", 8))
    dim, q_batch, k = 768, 32, 10
    log(f"backend={jax.default_backend()} rows={n_rows}")

    @partial(jax.jit, static_argnums=1)
    def make_normal(key, rows):
        x = jax.random.normal(key, (rows, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    kq, ki = jax.random.split(jax.random.PRNGKey(0))
    queries = make_normal(kq, q_batch)
    index_f32 = make_normal(ki, n_rows)
    index_f32.block_until_ready()
    log("fp32 index on device")

    slices_v, slices_s = [], []
    step = max(1, n_rows // 8)
    for s in range(0, n_rows, step):
        v, sc = quantize_int8(index_f32[s : s + step])
        slices_v.append(v)
        slices_s.append(sc)
    i8 = jnp.concatenate(slices_v, axis=0)
    scales = jnp.concatenate(slices_s, axis=0)
    del slices_v, slices_s
    index_f32.delete()
    # pre-pad to the largest block multiple so no variant pays a per-call
    # pad copy (8192 is a multiple of 4096)
    pad = (-n_rows) % 8192
    if pad:
        i8 = jnp.pad(i8, ((0, pad), (0, 0)))
        scales = jnp.pad(scales, (0, pad))
    i8.block_until_ready()
    log(f"int8 index ready (+{pad} pad rows)")

    variants = {
        "row4096": dict(_variant="row", block_rows=4096),
        "row8192": dict(_variant="row", block_rows=8192),
        "nodq4096": dict(_variant="nodequant", block_rows=4096),
        "s8s8_4096": dict(_variant="s8s8", block_rows=4096),
        "s8s8_8192": dict(_variant="s8s8", block_rows=8192),
    }

    def run(kw):
        return fused_topk_int8(i8, scales, queries, k, n_valid=n_rows, **kw)

    # compile all variants concurrently (remote compiles release the GIL)
    ready: dict[str, bool] = {}

    def warm(name, kw):
        try:
            t0 = time.perf_counter()
            v, _ = run(kw)
            _ = np.asarray(v)
            ready[name] = True
            log(f"{name}: compiled+warm in {time.perf_counter() - t0:.0f}s")
        except Exception as exc:  # noqa: BLE001
            log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}")
            ready[name] = False

    threads = [threading.Thread(target=warm, args=(n, kw), daemon=True) for n, kw in variants.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join(1200)
    live = [n for n, ok in ready.items() if ok]
    log(f"live variants: {live}")

    lat: dict[str, list[float]] = {n: [] for n in live}
    for rep in range(iters):
        for n in live:
            t0 = time.perf_counter()
            v, _ = run(variants[n])
            _ = np.asarray(v)
            lat[n].append(time.perf_counter() - t0)
        log(f"rep {rep + 1}/{iters} done")

    out = {}
    for n in live:
        med = sorted(lat[n])[len(lat[n]) // 2]
        out[n] = {"ms": round(med * 1e3, 2), "qps": round(q_batch / med, 1)}
        log(f"{n}: {med * 1e3:.2f} ms -> {q_batch / med:.1f} qps")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
