"""Golden-file helper for parity tests.

torch+transformers imports cost minutes in this environment, so parity
tests run against committed golden outputs generated once from the HF
reference (deterministic: seeded init, fixed inputs). Regenerate by
deleting tests/golden/* and running pytest with ARAG_ALLOW_TORCH=1 —
the fixtures fall back to live torch generation when goldens are absent.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable

import numpy as np

GOLDEN_DIR = Path(__file__).parent / "golden"


def torch_allowed() -> bool:
    return os.environ.get("ARAG_ALLOW_TORCH", "") == "1"


def get_npz(name: str, generate: Callable[[], dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    path = GOLDEN_DIR / f"{name}.npz"
    if path.exists():
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    if not torch_allowed():
        import pytest

        pytest.skip(f"golden {name} missing; regenerate with ARAG_ALLOW_TORCH=1")
    data = generate()
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.savez(path, **data)
    return data


def get_json(name: str, generate: Callable[[], dict]) -> dict:
    path = GOLDEN_DIR / f"{name}.json"
    if path.exists():
        return json.loads(path.read_text())
    if not torch_allowed():
        import pytest

        pytest.skip(f"golden {name} missing; regenerate with ARAG_ALLOW_TORCH=1")
    data = generate()
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data))
    return data
