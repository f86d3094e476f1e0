"""BERT-style cross-encoder — pure-functional JAX, TPU-first.

The reference *configures* a cross-encoder reranker
(``cross-encoder/ms-marco-MiniLM-L-6-v2``, ``config.yaml:68-69``) but
never implements it; this module supplies the model. ms-marco MiniLM
is a standard BERT encoder (absolute position + token-type embeddings)
with a 1-logit sequence-classification head over the CLS token.

Same design rules as models/mpnet.py: nested-dict param pytree,
``lax.scan`` over stacked layers, bf16 matmuls with fp32 accumulation,
fp32 LayerNorm/softmax. Shares the dense/LN/FFN building blocks with
the MPNet module; attention differs only in bias terms (no relative
position bias here).

Parity target: HF ``BertForSequenceClassification`` (torch), validated
in tests/test_bert_parity.py via the golden-file strategy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .mpnet import _dense, _ffn, _layer_norm, _precision

BertParams = Dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    """Subset of HF BertConfig. Defaults match ms-marco-MiniLM-L-6-v2."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    num_labels: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def init_params(rng: jax.Array, cfg: BertConfig, dtype: jnp.dtype = jnp.float32) -> BertParams:
    std = 0.02
    keys = iter(jax.random.split(rng, 8 + 12 * cfg.num_hidden_layers))

    def dense(key, d_in, d_out):
        return {
            "kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype),
            "bias": jnp.zeros((d_out,), dtype),
        }

    def layer_norm(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    h, ffn = cfg.hidden_size, cfg.intermediate_size
    params: BertParams = {
        "embeddings": {
            "word": (jax.random.normal(next(keys), (cfg.vocab_size, h)) * std).astype(dtype),
            "position": (
                jax.random.normal(next(keys), (cfg.max_position_embeddings, h)) * std
            ).astype(dtype),
            "token_type": (
                jax.random.normal(next(keys), (cfg.type_vocab_size, h)) * std
            ).astype(dtype),
            "ln": layer_norm(h),
        },
        "pooler": dense(next(keys), h, h),
        "classifier": dense(next(keys), h, cfg.num_labels),
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
    layers = params.pop("layers")
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params


def _attention(x, p, mask_bias, cfg: BertConfig):
    b, s, h = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def split_heads(t):
        return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q = split_heads(_dense(x, p["q"]))
    k = split_heads(_dense(x, p["k"]))
    v = split_heads(_dense(x, p["v"]))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=_precision(x.dtype),
    )
    scores = scores / math.sqrt(hd) + mask_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v,
        preferred_element_type=jnp.float32, precision=_precision(x.dtype),
    )
    ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, h)
    out = _dense(ctx, p["o"])
    return _layer_norm(out + x, p["ln"], cfg.layer_norm_eps)


def forward(
    params: BertParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: BertConfig,
    token_type_ids: jnp.ndarray | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Token-level hidden states [batch, seq, hidden] in fp32."""
    b, s = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, s), jnp.int32)
    emb = params["embeddings"]
    pos_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
    x = emb["word"][input_ids] + emb["position"][pos_ids] + emb["token_type"][token_type_ids]
    x = _layer_norm(x.astype(compute_dtype), emb["ln"], cfg.layer_norm_eps)

    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * jnp.finfo(
        jnp.float32
    ).min

    def layer_step(hid, layer_p):
        hid = _attention(hid, layer_p["attn"], mask_bias, cfg)
        hid = _ffn(hid, layer_p["ffn"], cfg)
        return hid, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    return x.astype(jnp.float32)


def classify(
    params: BertParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: BertConfig,
    token_type_ids: jnp.ndarray | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Sequence-classification logits [batch, num_labels] in fp32.

    HF BertForSequenceClassification applies the classifier to the
    *pooled* output (tanh(dense(CLS))).
    """
    hidden = forward(params, input_ids, attention_mask, cfg, token_type_ids, compute_dtype)
    cls = hidden[:, 0, :]
    pooled = jnp.tanh(
        jnp.dot(cls, params["pooler"]["kernel"].astype(jnp.float32))
        + params["pooler"]["bias"].astype(jnp.float32)
    )
    return (
        jnp.dot(pooled, params["classifier"]["kernel"].astype(jnp.float32))
        + params["classifier"]["bias"].astype(jnp.float32)
    )


def encode_sentences(
    params: BertParams,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: BertConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = True,
) -> jnp.ndarray:
    """Mean-pooled L2-normalized sentence embeddings — the
    all-MiniLM-L6-v2 role (the reference's semantic-chunking encoder,
    ``text_processor.py:885``; MiniLM is this BERT architecture at
    hidden=384/layers=6 with sentence-transformers pooling)."""
    from .mpnet import mean_pool

    hidden = forward(params, input_ids, attention_mask, cfg, None, compute_dtype)
    return mean_pool(hidden, attention_mask, normalize)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def from_hf_state_dict(state: dict, cfg: BertConfig, dtype=jnp.float32) -> BertParams:
    """Convert an HF BertForSequenceClassification state dict (numpy
    tensors) into the functional param pytree."""
    import numpy as np

    def strip(sd):
        return { (k[5:] if k.startswith("bert.") else k): v for k, v in sd.items() }

    sd = strip({k: np.asarray(v) for k, v in state.items()})

    def arr(key, transpose=False):
        v = sd[key]
        return jnp.asarray(v.T if transpose else v, dtype)

    def dense(prefix):
        return {"kernel": arr(f"{prefix}.weight", True), "bias": arr(f"{prefix}.bias")}

    def layer_norm(prefix):
        return {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    def dense_or_zero(prefix, d_in, d_out):
        """Sentence-encoder checkpoints (MiniLM) ship no classifier and
        sometimes no pooler; zero-init keeps the pytree shape stable."""
        if f"{prefix}.weight" in sd:
            return dense(prefix)
        return {"kernel": jnp.zeros((d_in, d_out), dtype),
                "bias": jnp.zeros((d_out,), dtype)}

    h = cfg.hidden_size
    params: BertParams = {
        "embeddings": {
            "word": arr("embeddings.word_embeddings.weight"),
            "position": arr("embeddings.position_embeddings.weight"),
            "token_type": arr("embeddings.token_type_embeddings.weight"),
            "ln": layer_norm("embeddings.LayerNorm"),
        },
        "pooler": dense_or_zero("pooler.dense", h, h),
        "classifier": dense_or_zero("classifier", h, cfg.num_labels),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        params["layers"].append(
            {
                "attn": {
                    "q": dense(f"{pre}.attention.self.query"),
                    "k": dense(f"{pre}.attention.self.key"),
                    "v": dense(f"{pre}.attention.self.value"),
                    "o": dense(f"{pre}.attention.output.dense"),
                    "ln": layer_norm(f"{pre}.attention.output.LayerNorm"),
                },
                "ffn": {
                    "in": dense(f"{pre}.intermediate.dense"),
                    "out": dense(f"{pre}.output.dense"),
                    "ln": layer_norm(f"{pre}.output.LayerNorm"),
                },
            }
        )
    layers = params.pop("layers")
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return params
