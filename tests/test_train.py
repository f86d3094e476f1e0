"""Contrastive fine-tuning: loss decreases, sharded step matches single."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.models import ModelConfig, init_params
from arxiv_rag_tpu.parallel import data_mesh
from arxiv_rag_tpu.train import contrastive_loss, make_train_step

CFG = ModelConfig(
    vocab_size=96,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=32,
)


def toy_batch(rng, batch=8, seq=12):
    q = rng.integers(4, CFG.vocab_size, (batch, seq)).astype(np.int32)
    # positive = query with light corruption -> learnable alignment
    p = q.copy()
    flip = rng.random(p.shape) < 0.15
    p[flip] = rng.integers(4, CFG.vocab_size, int(flip.sum()))
    mask = np.ones((batch, seq), np.int32)
    return (jnp.asarray(q), jnp.asarray(mask), jnp.asarray(p), jnp.asarray(mask))


def test_contrastive_loss_perfect_alignment():
    e = jnp.eye(4, 8)
    loss_aligned = contrastive_loss(e, e, temperature=0.05)
    rng = np.random.default_rng(0)
    r = rng.standard_normal((4, 8)).astype(np.float32)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    loss_random = contrastive_loss(e, jnp.asarray(r), temperature=0.05)
    assert float(loss_aligned) < float(loss_random)


def test_train_step_reduces_loss():
    rng = np.random.default_rng(0)
    init_state, step = make_train_step(CFG, learning_rate=3e-4,
                                       compute_dtype=jnp.float32)
    state = init_state(init_params(jax.random.PRNGKey(0), CFG))
    batch = toy_batch(rng)
    first = None
    for _ in range(8):
        state, metrics = step(state, *batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert state.step == 8
    assert last < first, (first, last)
    assert np.isfinite(last)


def test_train_step_sharded_matches_single():
    rng = np.random.default_rng(1)
    batch = toy_batch(rng, batch=8)
    params = init_params(jax.random.PRNGKey(0), CFG)

    init_single, step_single = make_train_step(CFG, learning_rate=1e-4,
                                               compute_dtype=jnp.float32)
    s1, m1 = step_single(init_single(params), *batch)

    mesh = data_mesh(4)
    init_mesh, step_mesh = make_train_step(CFG, learning_rate=1e-4,
                                           compute_dtype=jnp.float32, mesh=mesh)
    s2, m2 = step_mesh(init_mesh(params), *batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)
    # updated params identical: data-parallel step is exact
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_checkpoint_roundtrip(tmp_path):
    from arxiv_rag_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    rng = np.random.default_rng(3)
    init_state, step = make_train_step(CFG, learning_rate=3e-4,
                                       compute_dtype=jnp.float32)
    state = init_state(init_params(jax.random.PRNGKey(0), CFG))
    batch = toy_batch(rng)
    for _ in range(3):
        state, m = step(state, *batch)
    save_train_state(tmp_path / "ck", state)
    for _ in range(2):
        state, m = step(state, *batch)
    save_train_state(tmp_path / "ck", state)
    assert latest_checkpoint(tmp_path / "ck").name == "step_00000005"

    template = init_state(init_params(jax.random.PRNGKey(9), CFG))
    restored = restore_train_state(tmp_path / "ck", template)
    assert int(restored.step) == 5
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # resumed training continues bit-identically
    s1, m1 = step(restored, *batch)
    s2, m2 = step(state, *batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-7)


def test_restore_missing_returns_none(tmp_path):
    from arxiv_rag_tpu.train.checkpoint import restore_train_state

    init_state, _ = make_train_step(CFG, compute_dtype=jnp.float32)
    template = init_state(init_params(jax.random.PRNGKey(0), CFG))
    assert restore_train_state(tmp_path / "nope", template) is None
