"""Embedder: bucketed batching must be order-preserving, padding-
invariant, and mesh-shardable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.embed import Embedder
from arxiv_rag_tpu.models import ModelConfig, encode, init_params
from arxiv_rag_tpu.parallel import data_mesh
from arxiv_rag_tpu.tokenize import WordPieceTokenizer

VOCAB = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"] + [
    "the", "quick", "brown", "fox", "jump", "##s", "over", "lazy", "dog",
    "hello", "world", "paper", "model", "data", "##set", ".", ",",
]
CFG = ModelConfig(
    vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(p)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(1), CFG)


TEXTS = [
    "the quick brown fox",
    "hello world",
    "the lazy dog jumps over the quick brown fox " * 3,  # long → bigger bucket
    "paper model dataset",
    "hello",
    "the dog",
] * 3  # 18 texts, mixed buckets


def _direct(params, tok, texts, width=48):
    ids, mask = tok.encode_batch(texts, max_len=width, pad_to=width)
    return np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask), CFG))


def test_order_and_padding_invariance(params, tok):
    emb = Embedder(params, CFG, tok, buckets=(8, 16, 48), batch_size=4,
                   compute_dtype=jnp.float32)
    got = emb.encode_texts(TEXTS)
    want = _direct(params, tok, TEXTS)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert emb.stats.batches >= 3  # multiple buckets exercised


def test_multi_height_batches_match_single(params, tok):
    """batch_sizes=(small, big): small windows pad to the small compiled
    shape (the serving path), with identical embeddings."""
    small = Embedder(params, CFG, tok, buckets=(8, 16, 48),
                     batch_sizes=(2, 8), compute_dtype=jnp.float32)
    big = Embedder(params, CFG, tok, buckets=(8, 16, 48), batch_size=8,
                   compute_dtype=jnp.float32)
    got = small.encode_texts(TEXTS[:3])
    want = big.encode_texts(TEXTS[:3])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # 3 single-bucket... texts split across buckets; every batch of n<=2
    # rows must have padded to height 2, not 8
    assert small.stats.padded_slots < big.stats.padded_slots


def test_encode_texts_device_matches_host(params, tok):
    """The device-resident path (serving encode→scan handoff) must give
    the host path's embeddings in the same order, across buckets and
    batch splits."""
    emb = Embedder(params, CFG, tok, buckets=(8, 16, 48), batch_size=4,
                   compute_dtype=jnp.float32)
    want = emb.encode_texts(TEXTS)
    dev = emb.encode_texts_device(TEXTS)
    assert hasattr(dev, "device")  # still a jax array, not numpy
    np.testing.assert_allclose(np.asarray(dev), want, atol=1e-6)
    assert np.asarray(emb.encode_texts_device([])).shape == (0, CFG.hidden_size)


def test_empty_and_single(params, tok):
    emb = Embedder(params, CFG, tok, buckets=(8, 16), batch_size=4,
                   compute_dtype=jnp.float32)
    assert emb.encode_texts([]).shape == (0, 32)
    one = emb.encode_texts(["hello world"])
    assert one.shape == (1, 32)
    np.testing.assert_allclose(
        np.linalg.norm(one, axis=-1), 1.0, atol=1e-5
    )


def test_batch_padding_rows_do_not_leak(params, tok):
    """5 texts with batch_size 4 → last batch padded; results must equal
    unbatched reference."""
    texts = TEXTS[:5]
    emb = Embedder(params, CFG, tok, buckets=(48,), batch_size=4,
                   compute_dtype=jnp.float32)
    got = emb.encode_texts(texts)
    want = _direct(params, tok, texts)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mesh_data_parallel_matches(params, tok):
    mesh = data_mesh(8)
    emb_mesh = Embedder(params, CFG, tok, buckets=(16, 48), batch_size=8,
                        compute_dtype=jnp.float32, mesh=mesh)
    emb_single = Embedder(params, CFG, tok, buckets=(16, 48), batch_size=8,
                          compute_dtype=jnp.float32)
    got = emb_mesh.encode_texts(TEXTS[:16])
    want = emb_single.encode_texts(TEXTS[:16])
    np.testing.assert_allclose(got, want, atol=1e-5)
