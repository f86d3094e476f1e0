"""MPNet sentence encoder — pure-functional JAX, TPU-first.

Replaces the reference's sentence-transformers/torch encoder (the model
behind ``generate_embeddings_parallel.py:40-74``: all-mpnet-base-v2,
768-d, mean-pooled, L2-normalized) with a jit/pjit-friendly functional
forward pass:

- params live in a plain nested-dict pytree (trivially shardable with
  ``jax.sharding``; no framework module state);
- the T5-style relative position bias (shared across layers, HF
  ``MPNetEncoder.compute_position_bias``) is built from the *static*
  padded length at trace time, so XLA constant-folds the bucket matrix
  per length bucket — zero runtime gather cost beyond one embedding
  lookup;
- matmuls run in the compute dtype (bf16 on TPU) with fp32
  accumulation (``preferred_element_type``); LayerNorm, softmax and the
  final pooling/normalization run in fp32 for parity with the CPU/torch
  reference outputs;
- dropout is omitted: this framework only ever runs the encoder in
  inference mode (the reference likewise calls ``model.encode`` in eval
  mode).

Architecture parity target: HF ``MPNetModel`` (torch). Validated
layer-by-layer in tests/test_mpnet_parity.py against random-initialized
torch weights converted via models/convert.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

MPNetParams = Dict[str, Any]

PAD_TOKEN_ID = 1  # MPNet convention: <pad>=1 (HF MPNetEmbeddings.padding_idx)


@dataclass(frozen=True)
class ModelConfig:
    """Subset of HF MPNetConfig the forward pass needs.

    Defaults match sentence-transformers/all-mpnet-base-v2.
    """

    vocab_size: int = 30527
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-5
    pad_token_id: int = PAD_TOKEN_ID

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# ---------------------------------------------------------------------------
# Parameter initialization (random; real weights come via models/convert.py)
# ---------------------------------------------------------------------------


def init_params(
    rng: jax.Array, cfg: ModelConfig, dtype: jnp.dtype = jnp.float32
) -> MPNetParams:
    """Random init with HF's scheme (normal(0, 0.02), zero bias) so random
    models are numerically comparable in tests."""
    std = 0.02
    keys = iter(jax.random.split(rng, 6 + 12 * cfg.num_hidden_layers))

    def dense(key, d_in, d_out):
        return {
            "kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype),
            "bias": jnp.zeros((d_out,), dtype),
        }

    def layer_norm(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    h, ffn = cfg.hidden_size, cfg.intermediate_size
    params: MPNetParams = {
        "embeddings": {
            "word": (jax.random.normal(next(keys), (cfg.vocab_size, h)) * std).astype(dtype),
            "position": (
                jax.random.normal(next(keys), (cfg.max_position_embeddings, h)) * std
            ).astype(dtype),
            "ln": layer_norm(h),
        },
        "rel_bias": (
            jax.random.normal(
                next(keys), (cfg.relative_attention_num_buckets, cfg.num_attention_heads)
            )
            * std
        ).astype(dtype),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append(
            {
                "attn": {
                    "q": dense(next(keys), h, h),
                    "k": dense(next(keys), h, h),
                    "v": dense(next(keys), h, h),
                    "o": dense(next(keys), h, h),
                    "ln": layer_norm(h),
                },
                "ffn": {
                    "in": dense(next(keys), h, ffn),
                    "out": dense(next(keys), ffn, h),
                    "ln": layer_norm(h),
                },
            }
        )
    # stack per-layer params → one leading layer axis: single pytree leaf per
    # weight, scanned over in forward. Better for compile time and sharding.
    layers = params.pop("layers")
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


# ---------------------------------------------------------------------------
# Forward pass building blocks
# ---------------------------------------------------------------------------


def _layer_norm(x: jnp.ndarray, p: MPNetParams, eps: float) -> jnp.ndarray:
    """fp32 LayerNorm regardless of compute dtype (parity + stability)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _precision(dtype) -> jax.lax.Precision:
    """Full-precision matmuls for fp32 compute (XLA's DEFAULT rounds fp32
    operands through bf16 on TPU and reduced-precision oneDNN on CPU);
    bf16 compute keeps DEFAULT for native MXU throughput."""
    return (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )


def _dense(x: jnp.ndarray, p: MPNetParams) -> jnp.ndarray:
    if "kernel_q" in p:
        return _dense_int8(x, p)
    y = jnp.dot(
        x,
        p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=_precision(x.dtype),
    )
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense_int8(x: jnp.ndarray, p: MPNetParams) -> jnp.ndarray:
    """W8A8 dense: per-output-channel int8 weights (static, from
    quantize_params_int8) x per-token dynamically-quantized int8
    activations, s8s8->s32 on the MXU (2x the bf16 MAC rate on v5e),
    dequantized with the product of both scales.

    Replaces the encoder throughput role of the reference's torch
    workers (``generate_embeddings_parallel.py:131-169``) at the next
    precision notch down; accuracy bounds are tested in
    tests/test_mpnet_parity.py (int8-vs-fp32 embedding cosine).

    Lowering: XLA by default (measured throughput-neutral vs bf16 on
    v5e — it never picks the double-rate s8 MXU path for these shapes);
    ``ARAG_W8A8_PALLAS=1`` routes through the fused Pallas kernel
    (ops/pallas_matmul.py), which measured ~25% SLOWER end-to-end on
    v5e (see that module's header for the A/B numbers) — the env knob
    exists so future toolchains can be re-measured cheaply."""
    from arxiv_rag_tpu.ops.pallas_matmul import pallas_w8a8_enabled, w8a8_dense

    if pallas_w8a8_enabled():
        # fused-quant kernel: activations quantize in VMEM, never in HBM
        return w8a8_dense(x, p, out_dtype=x.dtype)
    a32 = x.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0
    a_scale = jnp.maximum(a_scale, 1e-8)
    x_q = jnp.round(a32 / a_scale).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * a_scale * p["kscale"].astype(jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def quantize_params_int8(params: MPNetParams) -> MPNetParams:
    """Per-output-channel symmetric int8 quantization of every dense
    kernel (q/k/v/o and both FFN projections; embeddings, LayerNorms and
    the relative bias stay in their original dtype). Works on the
    stacked-layer pytree: kernels are [L, d_in, d_out], scales become
    [L, 1, d_out]."""

    def quant_dense(d: MPNetParams) -> MPNetParams:
        k = jnp.asarray(d["kernel"], jnp.float32)
        scale = jnp.max(jnp.abs(k), axis=-2, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        return {
            "kernel_q": jnp.round(k / scale).astype(jnp.int8),
            "kscale": scale,
            "bias": d["bias"],
        }

    layers = params["layers"]
    out = dict(params)
    out["layers"] = {
        "attn": {
            **{n: quant_dense(layers["attn"][n]) for n in ("q", "k", "v", "o")},
            "ln": layers["attn"]["ln"],
        },
        "ffn": {
            "in": quant_dense(layers["ffn"]["in"]),
            "out": quant_dense(layers["ffn"]["out"]),
            "ln": layers["ffn"]["ln"],
        },
    }
    return out


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """T5-style bidirectional bucketing (HF MPNetEncoder.relative_position_bucket).

    Pure numpy on purpose: positions are static under jit, so the bucket
    matrix is a compile-time constant per padded length.
    """
    n = -relative_position
    num_buckets //= 2
    ret = (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1).astype(np.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_bias: jnp.ndarray, seq_len: int, cfg: ModelConfig
) -> jnp.ndarray:
    """[1, heads, q, k] additive attention bias, shared across layers."""
    pos = np.arange(seq_len, dtype=np.int64)
    rel = pos[None, :] - pos[:, None]  # memory - context
    buckets = relative_position_bucket(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    values = rel_bias[jnp.asarray(buckets)]  # [q, k, heads]
    return jnp.transpose(values, (2, 0, 1))[None].astype(jnp.float32)


def _attention(
    x: jnp.ndarray,
    p: MPNetParams,
    bias: jnp.ndarray,
    mask_bias: jnp.ndarray,
    cfg: ModelConfig,
    fused: bool = False,
) -> jnp.ndarray:
    b, s, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    if fused:
        # XLA's fused attention path (jax.nn.dot_product_attention):
        # avoids materializing [B,H,S,S] scores in HBM. Layout BTNH.
        q = _dense(x, p["q"]).reshape(b, s, nh, hd)
        k = _dense(x, p["k"]).reshape(b, s, nh, hd)
        v = _dense(x, p["v"]).reshape(b, s, nh, hd)
        full_bias = (bias + mask_bias).astype(jnp.float32)  # [B,H,S,S]
        ctx = jax.nn.dot_product_attention(
            q, k, v, bias=full_bias, scale=1.0 / math.sqrt(hd),
            implementation="xla",
        )
        ctx = ctx.reshape(b, s, h)
    else:
        def split_heads(t: jnp.ndarray) -> jnp.ndarray:
            return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

        q = split_heads(_dense(x, p["q"]))
        k = split_heads(_dense(x, p["k"]))
        v = split_heads(_dense(x, p["v"]))

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32, precision=_precision(x.dtype),
        )
        scores = scores / math.sqrt(hd) + bias + mask_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v,
            preferred_element_type=jnp.float32, precision=_precision(x.dtype),
        )
        ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, h)
    out = _dense(ctx, p["o"])
    return _layer_norm(out + x, p["ln"], cfg.layer_norm_eps)


def _ffn(x: jnp.ndarray, p: MPNetParams, cfg: ModelConfig) -> jnp.ndarray:
    y = _dense(x, p["in"])
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
    y = _dense(y, p["out"])
    return _layer_norm(y + x, p["ln"], cfg.layer_norm_eps)


def create_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa/MPNet position ids: pad positions get padding_idx; real
    tokens count up from padding_idx+1 (HF create_position_ids_from_input_ids)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def forward(
    params: MPNetParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: ModelConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    fused_attention: bool = False,
) -> jnp.ndarray:
    """Token-level hidden states [batch, seq, hidden] in fp32."""
    seq_len = input_ids.shape[1]

    pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
    emb = params["embeddings"]
    x = emb["word"][input_ids] + emb["position"][pos_ids]
    x = _layer_norm(x.astype(compute_dtype), emb["ln"], cfg.layer_norm_eps)

    bias = compute_position_bias(params["rel_bias"], seq_len, cfg)
    # additive mask: 0 where attended, large negative where padded
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * jnp.finfo(
        jnp.float32
    ).min

    def layer_step(h: jnp.ndarray, layer_p: MPNetParams) -> tuple[jnp.ndarray, None]:
        h = _attention(h, layer_p["attn"], bias, mask_bias, cfg, fused=fused_attention)
        h = _ffn(h, layer_p["ffn"], cfg)
        return h, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    return x.astype(jnp.float32)


def mean_pool(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Mask-aware mean pooling + optional L2 norm — the exact
    sentence-transformers pooling contract
    (``generate_embeddings_parallel.py:148`` normalize_embeddings=True)."""
    mask = attention_mask.astype(jnp.float32)[..., None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    pooled = summed / counts
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled


def encode(
    params: MPNetParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: ModelConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = True,
    fused_attention: bool = False,
) -> jnp.ndarray:
    """Sentence embeddings [batch, hidden] in fp32 (L2-normalized)."""
    hidden = forward(params, input_ids, attention_mask, cfg, compute_dtype,
                     fused_attention=fused_attention)
    return mean_pool(hidden, attention_mask, normalize)
