"""Contrastive fine-tuning of the MPNet encoder (TPU SPMD).

New capability beyond the reference (which only consumes a frozen
sentence-transformers checkpoint): domain-adapt the embedder on
(query, positive) pairs with in-batch negatives — the
MultipleNegativesRankingLoss recipe sentence-transformers models are
trained with, so fine-tuned weights stay drop-in compatible with the
index/search stack.

TPU design:
- pure functional ``train_step`` built once per mesh: params/opt-state
  replicated, batch sharded on the data axis; under ``jit`` with
  NamedSharding constraints XLA inserts the gradient ``psum`` over ICI
  (no hand-written collectives);
- loss needs ALL pair embeddings as negatives: embeddings are computed
  per-shard then (logically) all-gathered by XLA when the [B, B] score
  matrix forms — in-batch negatives span the global batch, not the
  local shard;
- bf16 forward, fp32 loss/softmax, fp32 Adam moments (optax default).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from arxiv_rag_tpu.models import ModelConfig
from arxiv_rag_tpu.models.mpnet import MPNetParams, encode


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("params", "opt_state", "step"),
    meta_fields=(),
)
@dataclass
class TrainState:
    params: MPNetParams
    opt_state: Any
    step: int | jnp.ndarray = 0


def contrastive_loss(
    q_emb: jnp.ndarray,  # [B, H] L2-normalized
    p_emb: jnp.ndarray,  # [B, H] L2-normalized
    temperature: float = 0.05,
) -> jnp.ndarray:
    """InfoNCE with in-batch negatives, symmetric (q→p and p→q)."""
    logits = (q_emb @ p_emb.T) / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (loss_qp + loss_pq).mean() * 0.5


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation | None = None,
    learning_rate: float = 2e-5,
    temperature: float = 0.05,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    mesh=None,
) -> tuple[Callable, Callable]:
    """Returns (init_state, train_step).

    train_step(state, q_ids, q_mask, p_ids, p_mask) -> (state, metrics).
    With ``mesh``, batch inputs are constrained to the data axis and
    params replicated — jit + XLA handle the gradient reduction.
    """
    tx = optimizer or optax.adamw(learning_rate, weight_decay=0.01)

    def init_state(params: MPNetParams) -> TrainState:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = jax.device_put(params, NamedSharding(mesh, P()))
        return TrainState(params=params, opt_state=tx.init(params), step=0)

    def loss_fn(params, q_ids, q_mask, p_ids, p_mask):
        q_emb = encode(params, q_ids, q_mask, cfg, compute_dtype=compute_dtype)
        p_emb = encode(params, p_ids, p_mask, cfg, compute_dtype=compute_dtype)
        loss = contrastive_loss(q_emb, p_emb, temperature)
        acc = jnp.mean(
            jnp.argmax(q_emb @ p_emb.T, axis=1) == jnp.arange(q_emb.shape[0])
        )
        return loss, acc

    def step_fn(state: TrainState, q_ids, q_mask, p_ids, p_mask):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(axis, None))
            q_ids = jax.lax.with_sharding_constraint(q_ids, shard)
            q_mask = jax.lax.with_sharding_constraint(q_mask, shard)
            p_ids = jax.lax.with_sharding_constraint(p_ids, shard)
            p_mask = jax.lax.with_sharding_constraint(p_mask, shard)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, q_ids, q_mask, p_ids, p_mask
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "in_batch_acc": acc}

    return init_state, jax.jit(step_fn)
