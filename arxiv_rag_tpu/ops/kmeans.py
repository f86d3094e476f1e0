"""Spherical k-means on the MXU — the IVF index's coarse quantizer.

The reference ships ``faiss-cpu``/``qdrant-client`` as unused deps
(``3-chunks/pipeline/requirements.txt:17,20,31``) and never builds any
ANN structure; the flat fused scan (ops/pallas_topk.py) already runs at
~90-100% of the device's HBM read rate, so the only remaining axis for
retrieval throughput is *scanning fewer rows* — a cluster-pruned (IVF)
layout. This module trains the cluster centroids.

TPU-first design notes:
- Assignment is a plain ``[B, D] x [D, C]`` matmul + argmax — pure MXU.
- The centroid UPDATE avoids scatter/segment_sum (TPU scatters serialize
  on the VPU): it is a second matmul, ``one_hot(assign).T @ batch``,
  accumulated over row batches. Both phases are therefore MXU work with
  static shapes; one jitted step per batch, carries on device.
- Empty clusters are reseeded from random data rows between iterations
  (host-side — the [C] count fetch per iteration is tiny).
- Inputs are assumed L2-normalized (cosine geometry); centroids are
  re-normalized every iteration, making this spherical k-means — the
  variant whose Voronoi cells match cosine top-k probing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from arxiv_rag_tpu.logging_utils import get_logger

log = get_logger("kmeans")


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _assign_batch(batch, centroids, n_clusters):
    """argmax-cosine assignment for one row batch: [B] int32."""
    scores = jnp.dot(
        batch.astype(jnp.bfloat16),
        centroids.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _accum_batch(batch, centroids, sums, counts, n_clusters):
    """One Lloyd accumulation step: assign a batch, add its rows into
    per-cluster sums/counts via the one-hot matmul (no scatter)."""
    assign = _assign_batch(batch, centroids, n_clusters)
    onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.bfloat16)  # [B, C]
    sums = sums + jnp.dot(
        onehot.T, batch.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    counts = counts + jnp.sum(onehot.astype(jnp.float32), axis=0)
    return sums, counts


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def spherical_kmeans(
    data: np.ndarray,
    n_clusters: int,
    *,
    iters: int = 10,
    seed: int = 0,
    sample_rows: int | None = 262144,
    batch_rows: int = 8192,
) -> np.ndarray:
    """Train ``[n_clusters, D]`` L2-normalized centroids on (a sample of)
    ``data`` (rows assumed L2-normalized). Returns fp32 centroids."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    if sample_rows is not None and n > sample_rows:
        idx = rng.choice(n, size=sample_rows, replace=False)
        idx.sort()  # keep gathers sequential-ish for mmapped sources
        data = np.asarray(data[idx], np.float32)
    else:
        data = np.asarray(data, np.float32)
    n = data.shape[0]
    if n_clusters > n:
        raise ValueError(f"n_clusters {n_clusters} > rows {n}")
    centroids = jnp.asarray(
        _l2n(data[rng.choice(n, size=n_clusters, replace=False)])
    )
    d = data.shape[1]
    for it in range(iters):
        sums = jnp.zeros((n_clusters, d), jnp.float32)
        counts = jnp.zeros((n_clusters,), jnp.float32)
        for start in range(0, n, batch_rows):
            batch = jnp.asarray(data[start : start + batch_rows])
            sums, counts = _accum_batch(batch, centroids, sums, counts, n_clusters)
        sums_h = np.asarray(sums)
        counts_h = np.asarray(counts)
        empty = counts_h == 0
        new = sums_h / np.maximum(counts_h, 1.0)[:, None]
        if empty.any():
            # reseed dead centroids from random data rows so every
            # cluster stays probe-able (an empty IVF list is wasted C)
            new[empty] = data[rng.choice(n, size=int(empty.sum()), replace=False)]
        centroids = jnp.asarray(_l2n(new))
        if it == iters - 1 or empty.any():
            log.info(
                "kmeans iter %d/%d: %d empty clusters, min/median size %d/%d",
                it + 1, iters, int(empty.sum()),
                int(counts_h.min()), int(np.median(counts_h)),
            )
    return np.asarray(centroids, np.float32)


def assign_clusters(
    data: np.ndarray, centroids: np.ndarray, *, batch_rows: int = 65536
) -> np.ndarray:
    """[N] int32 nearest-centroid (cosine) assignment, batched on device."""
    c = jnp.asarray(centroids, np.float32)
    out = []
    for start in range(0, data.shape[0], batch_rows):
        batch = jnp.asarray(np.asarray(data[start : start + batch_rows], np.float32))
        out.append(np.asarray(_assign_batch(batch, c, centroids.shape[0])))
    return (
        np.concatenate(out) if out else np.zeros((0,), np.int32)
    )
