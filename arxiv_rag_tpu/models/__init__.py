from arxiv_rag_tpu.models.mpnet import (
    MPNetParams,
    ModelConfig,
    encode,
    forward,
    init_params,
    mean_pool,
    quantize_params_int8,
)

__all__ = [
    "ModelConfig",
    "MPNetParams",
    "init_params",
    "forward",
    "encode",
    "mean_pool",
    "quantize_params_int8",
]
