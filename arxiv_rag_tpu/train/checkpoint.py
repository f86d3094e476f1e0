"""TrainState checkpointing (orbax): resumable fine-tuning.

SURVEY §5.4's TPU mapping calls for orbax-style sharded snapshots; the
fine-tune loop checkpoints (params + optimizer moments + step) every N
steps and resumes exactly — the same resume discipline the reference
applies to downloads/extraction/embedding, extended to training.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax

from arxiv_rag_tpu.logging_utils import get_logger
from arxiv_rag_tpu.train.contrastive import TrainState

log = get_logger("train.ckpt")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(directory: str | Path, state: TrainState) -> Path:
    """Write a step-numbered snapshot; returns its path."""
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = directory / f"step_{step:08d}"
    ckptr = _checkpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": jax.device_get(state.step),
    }
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    log.info("saved train state at step %d -> %s", step, path)
    return path


def latest_checkpoint(directory: str | Path) -> Path | None:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = sorted(directory.glob("step_*"))
    return steps[-1] if steps else None


def restore_train_state(
    directory_or_path: str | Path, template: TrainState
) -> TrainState | None:
    """Restore the latest snapshot; template supplies pytree structure
    (from init_state on the same model/optimizer). None if no snapshot."""
    import orbax.checkpoint as ocp

    path = Path(directory_or_path).resolve()
    if path.is_dir() and not path.name.startswith("step_"):
        latest = latest_checkpoint(path)
        if latest is None:
            return None
        path = latest.resolve()
    elif not path.exists():
        return None
    abstract = {
        "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, template.params),
        "opt_state": jax.tree.map(ocp.utils.to_shape_dtype_struct, template.opt_state),
        "step": jax.device_get(template.step),
    }
    restored = _checkpointer().restore(path, abstract)
    log.info("restored train state from %s (step %s)", path, restored["step"])
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
