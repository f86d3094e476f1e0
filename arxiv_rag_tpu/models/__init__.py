from arxiv_rag_tpu.models.mpnet import (
    MPNetParams,
    ModelConfig,
    encode,
    forward,
    init_params,
    mean_pool,
)

__all__ = [
    "ModelConfig",
    "MPNetParams",
    "init_params",
    "forward",
    "encode",
    "mean_pool",
]
