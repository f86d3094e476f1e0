"""Numerical parity of the JAX MPNet vs HF torch MPNetModel.

Offline strategy (zero egress): a random-initialized torch MPNetModel
(seeded, deterministic) defines golden outputs on fixed token ids;
goldens are committed (tests/golden/) so routine runs never import
torch. Regenerate with ARAG_ALLOW_TORCH=1 after deleting the files.
This validates both the architecture and models/convert.py. SURVEY §7
acceptance: max-abs-diff < 1e-4 fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.models import ModelConfig, encode, forward, init_params
from arxiv_rag_tpu.models.convert import (
    from_hf_state_dict,
    load_checkpoint,
    save_checkpoint,
)
from arxiv_rag_tpu.models.mpnet import (
    compute_position_bias,
    create_position_ids,
    relative_position_bucket,
)

from _golden import get_npz

SMALL = ModelConfig(
    vocab_size=120,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
)


def _make_batch():
    rng = np.random.default_rng(7)
    ids = rng.integers(3, SMALL.vocab_size, size=(4, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    for row, keep in [(1, 9), (2, 5), (3, 11)]:
        ids[row, keep:] = 1  # <pad>
        mask[row, keep:] = 0
    return ids, mask


def _generate_golden():
    """Runs the HF torch reference (slow import; only for regeneration)."""
    import torch
    import transformers

    torch.manual_seed(0)
    model = transformers.MPNetModel(
        transformers.MPNetConfig(
            vocab_size=SMALL.vocab_size,
            hidden_size=SMALL.hidden_size,
            num_hidden_layers=SMALL.num_hidden_layers,
            num_attention_heads=SMALL.num_attention_heads,
            intermediate_size=SMALL.intermediate_size,
            max_position_embeddings=SMALL.max_position_embeddings,
            layer_norm_eps=SMALL.layer_norm_eps,
        ),
        add_pooling_layer=False,
    ).eval()
    ids, mask = _make_batch()
    out: dict[str, np.ndarray] = {"ids": ids, "mask": mask}
    for k, v in model.state_dict().items():
        out["sd." + k] = v.numpy()
    with torch.no_grad():
        tids = torch.tensor(ids.astype(np.int64))
        tmask = torch.tensor(mask.astype(np.int64))
        hidden = model(input_ids=tids, attention_mask=tmask).last_hidden_state
        out["last_hidden"] = hidden.numpy()
        m = torch.tensor(mask.astype(np.float32)).unsqueeze(-1)
        pooled = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
        out["sentence_emb"] = torch.nn.functional.normalize(pooled, dim=-1).numpy()
        out["position_bias"] = model.encoder.compute_position_bias(
            torch.zeros(1, ids.shape[1], SMALL.hidden_size)
        ).numpy()
    pos = np.arange(40)
    rel = pos[None, :] - pos[:, None]
    out["bucket40"] = (
        transformers.models.mpnet.modeling_mpnet.MPNetEncoder.relative_position_bucket(
            torch.tensor(rel)
        ).numpy()
    )
    out["position_ids"] = (
        transformers.models.mpnet.modeling_mpnet.create_position_ids_from_input_ids(
            tids, 1
        ).numpy()
    )
    return out


@pytest.fixture(scope="module")
def golden():
    return get_npz("mpnet_small", _generate_golden)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: v for k, v in golden.items() if k.startswith("sd.")}
    return from_hf_state_dict(sd, SMALL)


def test_relative_position_bucket_matches_torch(golden):
    pos = np.arange(40)
    rel = pos[None, :] - pos[:, None]
    np.testing.assert_array_equal(relative_position_bucket(rel), golden["bucket40"])


def test_position_ids_match_torch(golden):
    ours = np.asarray(create_position_ids(jnp.asarray(golden["ids"]), 1))
    np.testing.assert_array_equal(ours, golden["position_ids"])


def test_position_bias_matches_torch(golden, params):
    ours = np.asarray(compute_position_bias(params["rel_bias"], 12, SMALL))
    np.testing.assert_allclose(ours[0], golden["position_bias"][0], atol=1e-6)


def test_hidden_states_parity(golden, params):
    ids, mask = golden["ids"], golden["mask"]
    ours = np.asarray(forward(params, jnp.asarray(ids), jnp.asarray(mask), SMALL))
    # compare only unpadded positions (padded positions are unused downstream)
    diff = np.abs(ours - golden["last_hidden"]) * mask[..., None]
    assert diff.max() < 1e-4, f"max diff {diff.max()}"


def test_sentence_embedding_parity(golden, params):
    """Full sentence-transformers contract: mean pool over mask + L2 norm."""
    ids, mask = golden["ids"], golden["mask"]
    ours = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask), SMALL))
    expected = golden["sentence_emb"]
    np.testing.assert_allclose(ours, expected, atol=1e-5)
    norms = np.linalg.norm(ours, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    cos = (ours * expected).sum(-1)
    assert cos.min() > 1.0 - 5e-7, f"cosine {cos.min()}"  # 1-4×fp32 eps


def test_padding_invariance(golden, params):
    """Embeddings must not change when the batch is padded longer — the
    contract that makes length-bucketed batching safe."""
    ids, mask = golden["ids"], golden["mask"]
    e12 = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask), SMALL))
    pad = np.full((4, 20), 1, np.int32)
    pad[:, :12] = ids
    pmask = np.zeros((4, 20), np.int32)
    pmask[:, :12] = mask
    e20 = np.asarray(encode(params, jnp.asarray(pad), jnp.asarray(pmask), SMALL))
    np.testing.assert_allclose(e12, e20, atol=1e-5)


def test_bf16_compute_close_to_fp32(golden, params):
    ids, mask = golden["ids"], golden["mask"]
    e32 = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask), SMALL))
    e16 = np.asarray(
        encode(params, jnp.asarray(ids), jnp.asarray(mask), SMALL,
               compute_dtype=jnp.bfloat16)
    )
    cos = (e32 * e16).sum(-1)
    assert cos.min() > 0.995, f"bf16/fp32 cosine {cos.min()}"


def test_native_checkpoint_roundtrip(tmp_path):
    cfg = SMALL
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint(tmp_path / "ckpt", params, cfg)
    loaded, cfg2 = load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_attention_matches_einsum():
    """jax.nn.dot_product_attention path == explicit einsum path."""
    params = init_params(jax.random.PRNGKey(3), SMALL)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(4, SMALL.vocab_size, (3, 17)), jnp.int32)
    mask = jnp.ones((3, 17), jnp.int32)
    mask = mask.at[1, 12:].set(0)
    a = forward(params, ids, mask, SMALL, fused_attention=False)
    b = forward(params, ids, mask, SMALL, fused_attention=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_from_safetensors_checkpoint_dir(tmp_path):
    """The arag convert input path: model.safetensors + config.json."""
    import os as _os

    if _os.environ.get("ARAG_ALLOW_TORCH") != "1":
        pytest.skip("torch import costs minutes here; run with ARAG_ALLOW_TORCH=1")
    import json as _json

    import torch
    from safetensors.torch import save_file
    from transformers import MPNetConfig, MPNetModel

    pytest.importorskip("safetensors")
    torch.manual_seed(5)
    hf_cfg = MPNetConfig(
        vocab_size=SMALL.vocab_size, hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_hidden_layers,
        num_attention_heads=SMALL.num_attention_heads,
        intermediate_size=SMALL.intermediate_size,
        max_position_embeddings=SMALL.max_position_embeddings,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    model = MPNetModel(hf_cfg).eval()
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if not k.endswith("position_ids")}
    save_file(sd, tmp_path / "model.safetensors")
    (tmp_path / "config.json").write_text(_json.dumps(hf_cfg.to_dict()))

    from arxiv_rag_tpu.models.convert import from_safetensors, load_model_config

    cfg = load_model_config(tmp_path)
    assert cfg.hidden_size == SMALL.hidden_size
    params = from_safetensors(tmp_path, cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(4, cfg.vocab_size, (2, 9)), jnp.int32)
    mask = jnp.ones((2, 9), jnp.int32)
    ours = forward(params, ids, mask, cfg)
    with __import__("torch").no_grad():
        theirs = model(__import__("torch").tensor(np.asarray(ids, np.int64)),
                       attention_mask=__import__("torch").tensor(np.asarray(mask, np.int64))
                       ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_int8_forward_embedding_parity():
    """W8A8 forward (quantize_params_int8) vs the fp32 forward: sentence
    embeddings must stay nearly parallel (the retrieval-relevant
    contract), and self-retrieval ordering must hold on a toy corpus."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.models import (
        ModelConfig, encode, init_params, quantize_params_int8,
    )

    cfg = ModelConfig(vocab_size=512, hidden_size=64, num_hidden_layers=4,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=96)
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params_int8(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (16, 48)), jnp.int32)
    mask = jnp.ones((16, 48), jnp.int32)
    e32 = np.asarray(encode(params, ids, mask, cfg))
    e8 = np.asarray(encode(qparams, ids, mask, cfg))
    cos = (e32 * e8).sum(axis=1)  # both L2-normalized
    assert cos.min() > 0.995, cos.min()
    # ordering: each int8 embedding's nearest fp32 embedding is itself
    sims = e8 @ e32.T
    assert (sims.argmax(axis=1) == np.arange(16)).all()


def test_embedder_quant_int8_flag():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from arxiv_rag_tpu.embed import Embedder
    from arxiv_rag_tpu.models import ModelConfig, init_params
    from arxiv_rag_tpu.tokenize import WordPieceTokenizer

    tok = WordPieceTokenizer.toy()
    cfg = ModelConfig(vocab_size=len(tok.vocab) + 2, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=4,
                      intermediate_size=64, max_position_embeddings=64,
                      pad_token_id=tok.pad_id)
    params = init_params(jax.random.PRNGKey(1), cfg)
    texts = ["dense retrieval on accelerators", "fused kernels stream the index"]
    kw = dict(buckets=(32,), batch_size=4, compute_dtype=jnp.float32)
    base = Embedder(params, cfg, tok, **kw).encode_texts(texts)
    quant = Embedder(params, cfg, tok, quant_int8=True, **kw).encode_texts(texts)
    cos = (base * quant).sum(axis=1)
    assert cos.min() > 0.99, cos
