"""W8A8 Pallas matmul (ops/pallas_matmul.py) vs the XLA int8 reference.

Integer matmul is exact and the dequant mirrors the XLA op order, so
interpret-mode results match ``_dense_int8``'s math to fp32 bitwise (we
assert a tiny tolerance to stay robust to backend reassociation).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arxiv_rag_tpu.ops.pallas_matmul import (
    w8a8_dense,
    w8a8_matmul,
    w8a8_matmul_fused_quant,
)


def _xla_ref(x_q, a_scale, w_q, w_scale, bias):
    y = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return np.asarray(y, np.float32) * np.asarray(a_scale) * np.asarray(
        w_scale
    ) + np.asarray(bias)


@pytest.mark.parametrize(
    "m,k,n",
    [
        (16, 128, 256),     # small: pad-to-tile path
        (64, 768, 768),     # qkv/o shape
        (96, 768, 3072),    # ffn-in shape (odd m)
        (128, 3072, 768),   # ffn-out shape (block_m shrinks at K=3072)
    ],
)
def test_w8a8_matmul_matches_xla(m, k, n):
    rng = np.random.default_rng(m + k + n)
    x_q = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    a_scale = jnp.asarray(rng.uniform(1e-3, 2e-2, (m, 1)), jnp.float32)
    w_scale = jnp.asarray(rng.uniform(1e-4, 1e-2, (1, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, n)), jnp.float32)

    got = np.asarray(
        w8a8_matmul(x_q, a_scale, w_q, w_scale, bias, interpret=True)
    )
    want = _xla_ref(x_q, a_scale, w_q, w_scale, bias)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_w8a8_matmul_no_bias_and_bf16_out():
    rng = np.random.default_rng(0)
    m, k, n = 32, 256, 128
    x_q = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    a_scale = jnp.asarray(rng.uniform(1e-3, 2e-2, (m, 1)), jnp.float32)
    w_scale = jnp.asarray(rng.uniform(1e-4, 1e-2, (1, n)), jnp.float32)
    got = w8a8_matmul(
        x_q, a_scale, w_q, w_scale, None, out_dtype=jnp.bfloat16, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    want = _xla_ref(x_q, a_scale, w_q, w_scale, np.zeros((1, n), np.float32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=1e-2, atol=1e-2
    )


def test_w8a8_matmul_shape_guards():
    x = jnp.zeros((8, 100), jnp.int8)  # K not lane-tiled
    w = jnp.zeros((100, 128), jnp.int8)
    s = jnp.ones((8, 1), jnp.float32)
    ws = jnp.ones((1, 128), jnp.float32)
    with pytest.raises(ValueError, match="multiples of 128"):
        w8a8_matmul(x, s, w, ws, interpret=True)
    with pytest.raises(ValueError, match="contraction mismatch"):
        w8a8_matmul(
            jnp.zeros((8, 128), jnp.int8), s,
            jnp.zeros((256, 128), jnp.int8), ws, interpret=True,
        )


def _quantize_act(x):
    a32 = jnp.asarray(x, jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0, 1e-8)
    return jnp.round(a32 / a_scale).astype(jnp.int8), a_scale


@pytest.mark.parametrize("m,k,n", [(48, 768, 768), (64, 3072, 768)])
def test_fused_quant_matches_prequantized(m, k, n):
    """In-kernel activation quantization == quantize-then-matmul."""
    rng = np.random.default_rng(m + n)
    x = jnp.asarray(rng.normal(0, 0.7, (m, k)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    w_scale = jnp.asarray(rng.uniform(1e-4, 1e-2, (1, n)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (1, n)), jnp.float32)
    x_q, a_scale = _quantize_act(x)
    want = np.asarray(w8a8_matmul(x_q, a_scale, w_q, w_scale, bias, interpret=True))
    got = np.asarray(w8a8_matmul_fused_quant(x, w_q, w_scale, bias, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_w8a8_dense_leading_shape():
    """[B, S, K] path used inside the encoder scan (unquantized input)."""
    rng = np.random.default_rng(7)
    b, s, k, n = 2, 24, 128, 256
    x = jnp.asarray(rng.normal(0, 0.7, (b, s, k)), jnp.float32)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8),
        "kscale": jnp.asarray(rng.uniform(1e-4, 1e-2, (1, n)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.5, (n,)), jnp.float32),
    }
    got = np.asarray(w8a8_dense(x, p, out_dtype=jnp.float32, interpret=True))
    assert got.shape == (b, s, n)
    x_q, a_scale = _quantize_act(x.reshape(-1, k))
    want = _xla_ref(
        x_q,
        a_scale,
        p["kernel_q"],
        p["kscale"],
        np.asarray(p["bias"])[None, :],
    ).reshape(b, s, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_encoder_w8a8_pallas_route_matches_xla_route(monkeypatch):
    """Full quantized encoder: ARAG_W8A8_PALLAS=1 (interpret) must
    reproduce the XLA _dense_int8 embeddings."""
    from arxiv_rag_tpu.models import (
        ModelConfig, encode, init_params, quantize_params_int8,
    )

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256,
        max_position_embeddings=64,
    )
    params = quantize_params_int8(init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)

    monkeypatch.delenv("ARAG_W8A8_PALLAS", raising=False)
    want = np.asarray(encode(params, ids, mask, cfg))
    monkeypatch.setenv("ARAG_W8A8_PALLAS", "1")
    got = np.asarray(encode(params, ids, mask, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
