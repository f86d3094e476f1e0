"""Flat cosine top-k search ops.

The capability the reference configures but never implements
(``3-chunks/pipeline/config.yaml:62-69``: top_k retrieval over the
chunk-embedding store). Three tiers:

- ``cosine_topk_numpy``: CPU exact scan — the recall oracle every other
  implementation is checked against (BASELINE configs[1]).
- ``flat_search``: jitted XLA matmul + ``lax.top_k``; fp32 accumulation
  via ``preferred_element_type`` so bf16/int8 storage cannot perturb
  ranking near ties more than storage precision itself.
- ``masked_flat_search``: the same with a per-row uint32 metadata
  bitmask (per-cs.*-category filtering, BASELINE configs[4]) pushed into
  the score computation.

The Pallas fused matmul + streaming top-k kernel in
``ops/pallas_topk.py`` replaces the scores materialization on TPU; these
XLA versions remain the portable fallback and the parity reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# plain float, NOT jnp.float32(...): a concrete jax scalar here would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multi-process workers (it must run
# before ANY backend-touching call) — see test_distributed_multiprocess
NEG_INF = float("-inf")


def matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 storage gets HIGHEST (full-fp32 accumulate everywhere — XLA
    CPU's DEFAULT routes through reduced-precision oneDNN/bf16 passes and
    TPU's DEFAULT rounds fp32 operands to bf16); bf16/int8 storage keeps
    DEFAULT so the MXU runs at native storage precision."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def cosine_topk_numpy(
    index: np.ndarray, queries: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact fp32 scan oracle (the reference-equivalent CPU flat scan,
    BASELINE configs[1]). Assumes rows are L2-normalized (cosine == dot).
    Returns (scores [Q,k] desc, indices [Q,k]); ties broken by lower
    index, matching lax.top_k."""
    scores = queries.astype(np.float32) @ index.astype(np.float32).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx.astype(np.int64)


@partial(jax.jit, static_argnames=("k",))
def flat_search(
    index: jnp.ndarray, queries: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """scores = Q @ X^T with fp32 accumulation, then lax.top_k.

    ``index`` may be bf16 (HBM-resident); queries are cast to the index
    dtype so the MXU runs at storage precision with fp32 accumulate.
    """
    scores = jnp.dot(
        queries.astype(index.dtype),
        index.T,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(index.dtype),
    )
    return _topk_padded(scores, k)


def _topk_padded(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """lax.top_k clamped to the row count; short results pad with
    (-inf, -1) so callers always get the requested k columns."""
    kk = min(k, scores.shape[-1])
    values, indices = jax.lax.top_k(scores, kk)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        values = jnp.pad(values, pad, constant_values=NEG_INF)
        indices = jnp.pad(indices, pad, constant_values=-1)
    return values, indices


@partial(jax.jit, static_argnames=("k",))
def masked_flat_search(
    index: jnp.ndarray,
    row_masks: jnp.ndarray,
    query_mask: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Metadata-filtered search.

    row_masks: [N] uint32 bitmask per corpus row (e.g. bit per cs.*
    category). query_mask: [Q] uint32; a row is eligible for a query iff
    ``row_masks & query_mask != 0``. Ineligible rows score -inf, so they
    can never enter the top-k (exact filtering, not post-hoc)."""
    scores = jnp.dot(
        queries.astype(index.dtype),
        index.T,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(index.dtype),
    )
    eligible = (row_masks[None, :] & query_mask[:, None]) != 0
    scores = jnp.where(eligible, scores, NEG_INF)
    return _topk_padded(scores, k)


def category_bit(categories: list[str], category: str) -> int:
    """Stable bit assignment for a category list (bit i = categories[i])."""
    return 1 << categories.index(category)


def make_row_masks(row_categories: np.ndarray, categories: list[str]) -> np.ndarray:
    """[N] uint32 bitmasks from per-row category strings."""
    bit_of = {c: np.uint32(1 << i) for i, c in enumerate(categories)}
    if len(categories) > 32:
        raise ValueError("more than 32 categories needs a wider mask")
    return np.array([bit_of.get(c, np.uint32(0)) for c in row_categories], np.uint32)


def recall_at_k(
    found: np.ndarray, oracle: np.ndarray, oracle_scores: np.ndarray | None = None,
    tie_tol: float = 1e-6, candidate_scores: np.ndarray | None = None,
) -> float:
    """Tie-tolerant recall@k (SURVEY §7 hard part 2: bf16 ties near the
    boundary). A found index counts if it's in the oracle set OR its
    oracle-precision score is within tie_tol of the oracle's k-th score."""
    q, k = oracle.shape
    hits = 0
    for row in range(q):
        oracle_set = set(oracle[row].tolist())
        for j, cand in enumerate(found[row].tolist()):
            if cand in oracle_set:
                hits += 1
            elif (
                oracle_scores is not None
                and candidate_scores is not None
                and candidate_scores[row, j] >= oracle_scores[row, -1] - tie_tol
            ):
                hits += 1
    return hits / (q * k)
