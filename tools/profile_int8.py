"""Profile the fused top-k kernel variants on the real TPU — AMORTIZED.

Round-3 finding that reshaped this tool: every fetched call through the
remote-device tunnel pays a ~30 ms RTT, so single-call timings at Q=32
(36 ms/call) are RTT-dominated — the round-2 "int8 at 54% of its
bandwidth ceiling" arithmetic compared RTT-inflated numbers. Honest
device-time measurement = dispatch K independent calls, fetch once
(TPU streams execute in order, so fetching the last result bounds all).

Variants:
- bf16 row4096 (reference)            - int8 row4096 (shipped)
- int8 s8s8 (native s8xs8->s32 MXU)   - int8 nodequant (probe)
- read probes: ones-matmul over the same arrays (bf16 / int8-widen /
  int8-s32) — the per-dtype speed-of-light for a streaming scan

Usage: PYTHONPATH=. python tools/profile_int8.py
Env: ROWS (default 2_000_000), CHAIN (calls per timed group, default 8),
GROUPS (default 4).
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

    from arxiv_rag_tpu.ops.pallas_topk import fused_topk, fused_topk_int8
    from arxiv_rag_tpu.ops.quant import quantize_int8

    n_rows = int(os.environ.get("ROWS", 2_000_000))
    chain = int(os.environ.get("CHAIN", 8))
    groups = int(os.environ.get("GROUPS", 4))
    dim, k = 768, 10
    q_batch = int(os.environ.get("Q", 32))
    log(f"backend={jax.default_backend()} rows={n_rows} chain={chain} Q={q_batch}")

    @partial(jax.jit, static_argnums=(1, 2))
    def make_slice(key, rows, seed_row):
        x = jax.random.normal(jax.random.fold_in(key, seed_row), (rows, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    # build bf16 + int8 copies WITHOUT ever holding the full f32 (OOM on
    # the shared chip): generate/convert per 250k-row slice
    key = jax.random.PRNGKey(0)
    queries = make_slice(key, q_batch, 999)
    step = 250_000
    bf_parts, i8_parts, sc_parts = [], [], []
    for s in range(0, n_rows, step):
        m = min(step, n_rows - s)
        x = make_slice(key, m, s)
        bf_parts.append(x.astype(jnp.bfloat16))
        v, sc = quantize_int8(x)
        i8_parts.append(v)
        sc_parts.append(sc)
        del x
    xb = jnp.concatenate(bf_parts, axis=0)
    del bf_parts
    i8 = jnp.concatenate(i8_parts, axis=0)
    scales = jnp.concatenate(sc_parts, axis=0)
    del i8_parts, sc_parts
    pad = (-n_rows) % 4096
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
        i8 = jnp.pad(i8, ((0, pad), (0, 0)))
        scales = jnp.pad(scales, (0, pad))
    xb.block_until_ready()
    log(f"bf16 (3.1 GB) + int8 (1.5 GB) indexes ready (+{pad} pad)")

    qbf = queries.astype(jnp.bfloat16)
    ones8_bf = jnp.ones((dim, 8), jnp.bfloat16)
    ones8_i8 = jnp.ones((dim, 8), jnp.int8)
    mm = jax.jit(
        lambda x, o: jnp.sum(
            jax.lax.dot_general(
                x, o, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    )
    mm_widen = jax.jit(
        lambda x, o: jnp.sum(
            jax.lax.dot_general(
                x.astype(jnp.bfloat16), o,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        )
    )
    mm_s32 = jax.jit(
        lambda x, o: jnp.sum(
            jax.lax.dot_general(
                x, o, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        )
    )

    variants = {
        "bf16_row4096": lambda: fused_topk(xb, qbf, k, n_valid=n_rows, block_rows=4096)[0],
        "int8_row4096": lambda: fused_topk_int8(i8, scales, queries, k, n_valid=n_rows, block_rows=4096)[0],
        "int8_s8s8": lambda: fused_topk_int8(i8, scales, queries, k, n_valid=n_rows, block_rows=4096, _variant="s8s8")[0],
        "int8_nodq": lambda: fused_topk_int8(i8, scales, queries, k, n_valid=n_rows, block_rows=4096, _variant="nodequant")[0],
        "read_bf16": lambda: mm(xb, ones8_bf),
        "read_int8_widen": lambda: mm_widen(i8, ones8_bf),
        "read_int8_s32": lambda: mm_s32(i8, ones8_i8),
    }

    ready: dict[str, bool] = {}

    def warm(name, fn):
        try:
            t0 = time.perf_counter()
            _ = np.asarray(fn())
            ready[name] = True
            log(f"{name}: warm in {time.perf_counter() - t0:.0f}s")
        except Exception as exc:  # noqa: BLE001
            log(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
            ready[name] = False

    threads = [threading.Thread(target=warm, args=(nm, fn), daemon=True)
               for nm, fn in variants.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join(900)
    live = [nm for nm, ok in ready.items() if ok]
    log(f"live: {live}")

    # amortized timing: CHAIN dispatches, ONE fetch of the last result
    # (in-order stream => last bounds all); RTT amortizes to 1/CHAIN
    lat: dict[str, list[float]] = {nm: [] for nm in live}
    for g in range(groups):
        for nm in live:
            fn = variants[nm]
            t0 = time.perf_counter()
            out = None
            for _ in range(chain):
                out = fn()
            _ = np.asarray(out)
            lat[nm].append((time.perf_counter() - t0) / chain)
        log(f"group {g + 1}/{groups}")

    out = {}
    for nm in live:
        med = sorted(lat[nm])[len(lat[nm]) // 2]
        qps = q_batch / med if nm.startswith(("bf16", "int8")) else None
        bytes_ = n_rows * dim * (1 if "int8" in nm else 2)
        rec = {"ms": round(med * 1e3, 2), "GBps": round(bytes_ / med / 1e9, 1)}
        if qps:
            rec["qps"] = round(qps, 1)
        out[nm] = rec
        log(f"{nm}: {rec}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
