"""int8 symmetric quantization for the HBM-resident index.

BASELINE configs[4]: int8-quantized index with recall parity. Per-row
symmetric scales (absmax/127) keep cosine ranking: for L2-normalized
rows x_i, score(q, x_i) = s_i * (q · q_i) where q_i = round(x_i / s_i).
Halves HBM bytes vs bf16 — and flat-scan QPS is HBM-bandwidth-bound, so
this is a direct throughput lever.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(index: jnp.ndarray | np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N,D] float → ([N,D] int8 values, [N] fp32 per-row scales)."""
    x = jnp.asarray(index, jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1)
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scales[:, None]), -127, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def dequantize_int8(values: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    return values.astype(jnp.float32) * scales[:, None]


@partial(jax.jit, static_argnames=("k",))
def int8_search(
    values: jnp.ndarray,
    scales: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    row_masks: jnp.ndarray | None = None,
    query_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flat search over an int8 index (XLA path; Pallas kernel fuses the
    same math on TPU). Scores accumulate in fp32; per-row scale applied
    after the matmul so the MXU sees a plain int8/bf16 contraction."""
    raw = jnp.dot(
        queries.astype(jnp.bfloat16),
        values.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = raw * scales[None, :]
    if row_masks is not None and query_mask is not None:
        eligible = (row_masks[None, :] & query_mask[:, None]) != 0
        scores = jnp.where(eligible, scores, -jnp.inf)
    else:
        # padding rows carry scale 0 and would score exactly 0.0 —
        # above any genuinely-negative-similarity row; exclude them
        scores = jnp.where(scales[None, :] > 0, scores, -jnp.inf)
    from arxiv_rag_tpu.ops.topk import _topk_padded

    return _topk_padded(scores, k)
