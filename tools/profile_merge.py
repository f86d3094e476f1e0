"""A/B the fused-kernel merge implementations on the real TPU — AMORTIZED.

Round-3 decomposition (CLAUDE.md): at Q=512 the extract merge adds
~7.4-7.9 ms/call, ~1 us ≈ one [QB, BN] VPU pass per while-trip.
``extractN`` (unroll) and ``staged`` were measured dead ends; round 4
adds ``group1``/``group2`` (per-group top-k cache, lazy bound-carrying
refill — per-trip traffic [QB, G] instead of [QB, BN]), which this tool
A/Bs against ``extract`` for the two serving dtypes.

Usage: PYTHONPATH=. python tools/profile_merge.py
Env: ROWS (default 2_000_000), CHAIN (default 6), GROUPS (default 4),
Q (default 512), MERGES (default "extract,group1,group2"; numeric N
means extractN for back-compat with the round-3 UNROLLS sweep).
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
    print(f"[merge +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.pallas_topk import fused_topk, fused_topk_int8
    from arxiv_rag_tpu.ops.quant import quantize_int8

    n_rows = int(os.environ.get("ROWS", 2_000_000))
    chain = int(os.environ.get("CHAIN", 6))
    groups = int(os.environ.get("GROUPS", 4))
    q_batch = int(os.environ.get("Q", 512))
    merges = [
        m if not m.strip().isdigit()
        else ("extract" if int(m) == 1 else f"extract{int(m)}")
        for m in os.environ.get(
            "MERGES", os.environ.get("UNROLLS", "extract,group1,group2")
        ).split(",")
    ]
    dim, k = 768, 10
    log(f"backend={jax.default_backend()} rows={n_rows} Q={q_batch} merges={merges}")

    @partial(jax.jit, static_argnums=(1, 2))
    def make_slice(key, rows, seed_row):
        x = jax.random.normal(jax.random.fold_in(key, seed_row), (rows, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

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
    qbf = queries.astype(jnp.bfloat16)
    log("indexes ready")

    def mk(merge: str):
        return {
            f"int8_s8s8_{merge}": lambda m=merge: fused_topk_int8(
                i8, scales, queries, k, n_valid=n_rows, block_rows=4096,
                _variant="s8s8", _merge=m)[0],
            f"bf16_{merge}": lambda m=merge: fused_topk(
                xb, qbf, k, n_valid=n_rows, block_rows=4096, _merge=m)[0],
        }

    variants: dict = {}
    for m in merges:
        variants.update(mk(m))

    ready: dict[str, bool] = {}
    oracle: dict[str, np.ndarray] = {}

    def warm(name, fn):
        try:
            t0 = time.perf_counter()
            oracle[name] = np.asarray(fn())
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

    # exactness: every impl must match its dtype's extract values bitwise
    for nm in live:
        base = nm.rsplit("_", 1)[0] + "_extract"
        if base in oracle and nm != base:
            same = np.array_equal(oracle[nm], oracle[base])
            log(f"{nm}: values {'EXACT' if same else 'MISMATCH'} vs {base}")

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
        out[nm] = {"ms": round(med * 1e3, 2), "qps": round(q_batch / med, 1)}
        log(f"{nm}: {out[nm]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
