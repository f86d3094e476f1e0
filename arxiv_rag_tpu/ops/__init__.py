from arxiv_rag_tpu.ops.topk import (
    cosine_topk_numpy,
    flat_search,
    masked_flat_search,
)
from arxiv_rag_tpu.ops.quant import (
    dequantize_int8,
    int8_search,
    quantize_int8,
)

__all__ = [
    "cosine_topk_numpy",
    "flat_search",
    "masked_flat_search",
    "quantize_int8",
    "dequantize_int8",
    "int8_search",
]
