"""IVF vs flat scan at scale on the real TPU — AMORTIZED timing.

The flat fused kernel is read-bandwidth-bound at small Q; IVF's win is
reading fewer rows, and it grows with corpus size (the probed-union
cost per query tile is ~independent of N — see index/ivf.py). This
tool builds a synthetic CLUSTERED corpus (real MPNet embeddings are
extremely cluster-dense: RECALL_r04 measured mean pairwise cosine
0.9882 at 100k — isotropic Gaussians would be an unfairly HARD case
for IVF, blobs are the representative one), entirely ON DEVICE
(slice-wise; a 4M x 768 f32 corpus would take ~25 min to move through
the ~80 MB/s tunnel), then measures:

- flat fused int8 scan (s8s8 default variant) — the exact baseline AND
  the recall oracle (both paths see identical int8 storage, so recall
  isolates PRUNING loss from quantization loss);
- IVF at each requested nprobe: probe+plan (host) then kernel, with
  the amortized dispatch-K-fetch-once protocol on the kernel calls and
  probes batched the same way.

Usage: PYTHONPATH=. python tools/ivf_scale.py
Env: ROWS (4_000_000), CLUSTERS (4096), NPROBES ("8,16,32,64"),
Q (32), QBLOCK (8), BLOCK_ROWS (1024), CHAIN (8), GROUPS (3),
CENTERS (2048 blob centers), SPREAD (0.025).
Writes one JSON line to stdout; phase logs to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[ivf +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from arxiv_rag_tpu.index.ivf import IVFIndex
    from arxiv_rag_tpu.index.store import DenseIndex
    from arxiv_rag_tpu.ops.pallas_topk import fused_topk_int8
    from arxiv_rag_tpu.ops.topk import recall_at_k

    rows = int(os.environ.get("ROWS", 4_000_000))
    n_clusters = int(os.environ.get("CLUSTERS", 4096))
    nprobes = [int(x) for x in os.environ.get("NPROBES", "8,16,32,64").split(",")]
    q_batch = int(os.environ.get("Q", 32))
    q_block = int(os.environ.get("QBLOCK", 8))
    block_rows = int(os.environ.get("BLOCK_ROWS", 1024))
    chain = int(os.environ.get("CHAIN", 8))
    groups = int(os.environ.get("GROUPS", 3))
    n_centers = int(os.environ.get("CENTERS", 2048))
    spread = float(os.environ.get("SPREAD", 0.025))
    dim, k = 768, 10
    log(f"backend={jax.default_backend()} rows={rows} clusters={n_clusters} "
        f"nprobes={nprobes} Q={q_batch} q_block={q_block} block={block_rows}")

    # ---- corpus: blobs generated on device, fetched as int8 ----
    @partial(jax.jit, static_argnums=(2,))
    def make_blob_slice(key, centers, m):
        kc, kn = jax.random.split(key)
        cid = jax.random.randint(kc, (m,), 0, centers.shape[0])
        x = centers[cid] + spread * jax.random.normal(kn, (m, dim), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12)
        sc = absmax / 127.0
        v = jnp.clip(jnp.round(x / sc[:, None]), -127, 127).astype(jnp.int8)
        return v, sc.astype(jnp.float32)

    key = jax.random.PRNGKey(7)
    kcent, kq = jax.random.split(jax.random.PRNGKey(3))
    centers_h = jax.random.normal(kcent, (n_centers, dim), jnp.float32)
    centers_h = centers_h / jnp.linalg.norm(centers_h, axis=1, keepdims=True)
    step = 250_000
    # corpus/centroids/assignment are deterministic in (rows, centers,
    # spread, clusters, iters) — cache them on disk so block_rows /
    # nprobe / Q sweeps skip the ~25-min generate+train+assign setup
    # (the tunnel transfer dominates it)
    cache = (f"/tmp/arag_ivf_corpus_{rows}_{n_centers}_{spread}_"
             f"{n_clusters}_{os.environ.get('ITERS', 8)}.npz")
    cached = os.path.exists(cache)
    if cached:
        z = np.load(cache)
        values, scales = z["values"], z["scales"]
        log(f"corpus loaded from {cache}")
    else:
        v_parts, s_parts = [], []
        for s in range(0, rows, step):
            m = min(step, rows - s)
            v, sc = make_blob_slice(jax.random.fold_in(key, s), centers_h, m)
            v_parts.append(np.asarray(v))
            s_parts.append(np.asarray(sc))
        values = np.concatenate(v_parts)
        scales = np.concatenate(s_parts)
        del v_parts, s_parts
    log(f"corpus on host: {values.nbytes/2**30:.2f} GiB int8")

    # queries: noisy blob members (what a real workload looks like)
    qv, qs = make_blob_slice(jax.random.fold_in(key, 10**9), centers_h, q_batch)
    queries = np.asarray(qv, np.float32) * np.asarray(qs)[:, None]
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    queries = queries.astype(np.float32)
    qd = jnp.asarray(queries)

    # ---- kmeans on a host sample; assignment on device per slice ----
    from arxiv_rag_tpu.ops.kmeans import _assign_batch, spherical_kmeans

    rng = np.random.default_rng(0)
    if cached:
        centroids = z["centroids"]
        log("centroids loaded from cache")
    else:
        t_idx = np.sort(rng.choice(rows, size=min(rows, 262_144), replace=False))
        sample = values[t_idx].astype(np.float32) * scales[t_idx][:, None]
        t0 = time.perf_counter()
        centroids = spherical_kmeans(
            sample, n_clusters, iters=int(os.environ.get("ITERS", 8)),
            seed=0, sample_rows=None)
        log(f"kmeans trained in {time.perf_counter()-t0:.1f}s")
        del sample

    @jax.jit
    def assign_i8(v, sc, cents):
        x = v.astype(jnp.bfloat16) * sc[:, None].astype(jnp.bfloat16)
        scores = jnp.dot(x, cents.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    if cached:
        assign = z["assign"]
        log("assignments loaded from cache")
    else:
        cents_d = jnp.asarray(centroids)
        assign = np.empty((rows,), np.int32)
        t0 = time.perf_counter()
        for s in range(0, rows, step):
            sl = slice(s, min(s + step, rows))
            assign[sl] = np.asarray(assign_i8(jnp.asarray(values[sl]),
                                              jnp.asarray(scales[sl]), cents_d))
        log(f"assignment in {time.perf_counter()-t0:.1f}s")
        try:
            # write-to-tmp + rename: a run killed mid-save (tunnel
            # outage, watchdog) must not leave a truncated npz that
            # poisons every later sweep's `cached` branch
            tmp = cache + ".tmp.npz"
            np.savez(tmp, values=values, scales=scales,
                     centroids=centroids, assign=assign)
            os.replace(tmp, cache)
            log(f"setup cached to {cache}")
        except OSError as exc:
            log(f"cache save skipped ({exc})")

    dense = DenseIndex(values=values, scales=scales, dtype="int8",
                       normalized=True, categories=[], row_masks=None)
    t0 = time.perf_counter()
    ivf = IVFIndex.build(dense, n_clusters, block_rows=block_rows,
                         centroids=centroids, assignments=assign)
    log(f"ivf layout in {time.perf_counter()-t0:.1f}s "
        f"({ivf.n_blocks} blocks of {block_rows})")
    del values, scales, dense.values, assign

    # one device copy serves both paths: flat scan over the IVF-ordered
    # rows is the same corpus permuted
    ivf.to_device()
    vals_d, scales_d = ivf._device_values, ivf._device_scales
    n_valid = ivf.n_valid

    # ---- flat baseline (s8s8 default) + oracle ----
    t0 = time.perf_counter()
    fv, fr = fused_topk_int8(vals_d, scales_d, qd, k, n_valid=n_valid,
                             block_rows=4096)
    fv, fr = np.asarray(fv), np.asarray(fr)
    log(f"flat first call (incl compile) {time.perf_counter()-t0:.1f}s")
    oracle_rows = ivf.perm[np.clip(fr, 0, n_valid - 1)]
    oracle_scores = fv

    def amortize(dispatch_fn):
        """median over groups of: dispatch `chain` calls, fetch last."""
        times = []
        for g in range(groups):
            t0 = time.perf_counter()
            outs = [dispatch_fn(i) for i in range(chain)]
            np.asarray(outs[-1][0])
            times.append((time.perf_counter() - t0) / chain)
        return float(np.median(times))

    flat_s = amortize(lambda i: fused_topk_int8(
        vals_d, scales_d, qd, k, n_valid=n_valid, block_rows=4096))
    log(f"flat amortized {flat_s*1e3:.2f} ms/call = {q_batch/flat_s:.0f} qps")

    results = {"flat_ms": flat_s * 1e3, "flat_qps": q_batch / flat_s,
               "per_nprobe": {}}
    for nprobe in nprobes:
        # probe+plan once (fixed query set -> fixed tables); per-call
        # probe cost is reported separately below
        t0 = time.perf_counter()
        cids = ivf.probe(qd, nprobe)
        table = ivf.plan_blocks(cids, q_block)
        plan_s = time.perf_counter() - t0
        kw = dict(n_valid=n_valid, block_rows=block_rows, q_block=q_block)
        t0 = time.perf_counter()
        iv, ir = ivf._search_table(qd, table, k, **kw)
        iv, ir = np.asarray(iv), np.asarray(ir)
        log(f"nprobe={nprobe}: first call (incl compile) "
            f"{time.perf_counter()-t0:.1f}s, table width {table.shape[1]}")
        found = ivf.perm[np.clip(ir, 0, n_valid - 1)]
        found = np.where(ir >= 0, found, -1)
        rec = recall_at_k(found, oracle_rows, oracle_scores, tie_tol=5e-3,
                          candidate_scores=np.where(ir >= 0, iv, -np.inf))
        kern_s = amortize(lambda i: ivf._search_table(qd, table, k, **kw))
        # probe amortized: dispatch K probes, fetch last
        t0 = time.perf_counter()
        outs = [ivf._probe_dispatch(qd, nprobe) for _ in range(chain)]
        np.asarray(outs[-1])
        probe_s = (time.perf_counter() - t0) / chain
        total_s = kern_s + probe_s + plan_s
        log(f"nprobe={nprobe}: recall@10 {rec:.4f}, kernel "
            f"{kern_s*1e3:.2f} ms, probe {probe_s*1e3:.2f} ms, plan "
            f"{plan_s*1e3:.1f} ms -> {q_batch/total_s:.0f} qps "
            f"({flat_s/total_s:.2f}x flat)")
        results["per_nprobe"][str(nprobe)] = {
            "recall_at_10": rec, "kernel_ms": kern_s * 1e3,
            "probe_ms": probe_s * 1e3, "plan_ms": plan_s * 1e3,
            "qps": q_batch / total_s, "speedup_vs_flat": flat_s / total_s,
            "table_width": int(table.shape[1]),
        }

        # device-planned path: probe + plan + scan in ONE dispatch — no
        # host sync, so the honest per-call cost is just the amortized
        # kernel chain (the thing the host path's RTT destroys)
        dkw = dict(nprobe=nprobe, q_block=q_block)
        t0 = time.perf_counter()
        ddv, ddr = ivf._search_device(qd, k, **dkw)
        ddv, ddr = np.asarray(ddv), np.asarray(ddr)
        log(f"nprobe={nprobe}: device-plan first call (incl compile) "
            f"{time.perf_counter()-t0:.1f}s")
        match = bool(np.array_equal(ddr, ir)) and bool(
            np.allclose(ddv, iv, atol=1e-4))
        dev_s = amortize(lambda i: ivf._search_device(qd, k, **dkw))
        log(f"nprobe={nprobe}: device-plan amortized {dev_s*1e3:.2f} ms "
            f"-> {q_batch/dev_s:.0f} qps ({flat_s/dev_s:.2f}x flat), "
            f"match_host={match}")
        results["per_nprobe"][str(nprobe)]["device_plan"] = {
            "total_ms": dev_s * 1e3, "qps": q_batch / dev_s,
            "speedup_vs_flat": flat_s / dev_s, "match_host_plan": match,
        }

    out = {"metric": f"ivf_scale_{rows}x{dim}_int8", "rows": rows,
           "clusters": n_clusters, "q": q_batch, "q_block": q_block,
           "block_rows": block_rows, **results}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
