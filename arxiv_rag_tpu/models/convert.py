"""Checkpoint conversion and native checkpoint IO.

``from_hf_state_dict`` maps an HF torch ``MPNetModel`` state dict (or an
all-mpnet-base-v2 sentence-transformers checkpoint, which embeds the same
model) onto the functional params pytree in models/mpnet.py. torch Linear
weights are [out, in] and are transposed to [in, out] kernels.

Native checkpoints are msgpack (flax.serialization) + a config JSON —
the framework's own format, independent of torch at load time.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from arxiv_rag_tpu.models.mpnet import ModelConfig, MPNetParams, init_params


def _strip_prefix(state: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop common wrapper prefixes ('mpnet.', sentence-transformers
    '0.auto_model.')."""
    out = {}
    for key, value in state.items():
        for prefix in ("0.auto_model.", "auto_model.", "mpnet."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        out[key] = value
    return out


def from_hf_state_dict(
    state: Mapping[str, np.ndarray],
    cfg: ModelConfig,
    dtype: jnp.dtype = jnp.float32,
) -> MPNetParams:
    """Build the functional params pytree from an HF MPNet state dict."""
    sd = _strip_prefix(state)

    def arr(key: str, transpose: bool = False) -> jnp.ndarray:
        value = np.asarray(sd[key])
        if transpose:
            value = value.T
        return jnp.asarray(value, dtype)

    def dense(prefix: str) -> dict:
        return {"kernel": arr(prefix + ".weight", transpose=True), "bias": arr(prefix + ".bias")}

    def layer_norm(prefix: str) -> dict:
        return {"scale": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": dense(f"{base}.attention.attn.q"),
                    "k": dense(f"{base}.attention.attn.k"),
                    "v": dense(f"{base}.attention.attn.v"),
                    "o": dense(f"{base}.attention.attn.o"),
                    "ln": layer_norm(f"{base}.attention.LayerNorm"),
                },
                "ffn": {
                    "in": dense(f"{base}.intermediate.dense"),
                    "out": dense(f"{base}.output.dense"),
                    "ln": layer_norm(f"{base}.output.LayerNorm"),
                },
            }
        )

    import jax

    return {
        "embeddings": {
            "word": arr("embeddings.word_embeddings.weight"),
            "position": arr("embeddings.position_embeddings.weight"),
            "ln": layer_norm("embeddings.LayerNorm"),
        },
        "rel_bias": arr("encoder.relative_attention_bias.weight"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def from_torch_module(module, cfg: ModelConfig, dtype: jnp.dtype = jnp.float32) -> MPNetParams:
    """Convert a live torch MPNetModel (used by the offline parity tests)."""
    state = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
    return from_hf_state_dict(state, cfg, dtype)


def from_safetensors(
    path: str | Path, cfg: ModelConfig, dtype: jnp.dtype = jnp.float32
) -> MPNetParams:
    """Load an HF checkpoint's model.safetensors (file or its dir)."""
    from safetensors.numpy import load_file

    path = Path(path)
    if path.is_dir():
        path = path / "model.safetensors"
    return from_hf_state_dict(load_file(str(path)), cfg, dtype)


def load_model_config(checkpoint_dir: str | Path) -> ModelConfig:
    """Read an HF config.json into our ModelConfig (only known fields)."""
    raw = json.loads((Path(checkpoint_dir) / "config.json").read_text())
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    return ModelConfig(**{k: v for k, v in raw.items() if k in fields})


# --- native checkpoint format ------------------------------------------------


def save_checkpoint(directory: str | Path, params: MPNetParams, cfg: ModelConfig) -> None:
    from flax import serialization

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "params.msgpack").write_bytes(serialization.to_bytes(params))
    (directory / "model_config.json").write_text(json.dumps(dataclasses.asdict(cfg)))


def load_checkpoint(directory: str | Path) -> tuple[MPNetParams, ModelConfig]:
    import jax
    from flax import serialization

    directory = Path(directory)
    cfg = ModelConfig(**json.loads((directory / "model_config.json").read_text()))
    template = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))
    params = serialization.from_bytes(template, (directory / "params.msgpack").read_bytes())
    params = jax.tree.map(jnp.asarray, params)
    return params, cfg
