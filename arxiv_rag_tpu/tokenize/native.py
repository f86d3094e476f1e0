"""ctypes binding for the C++ WordPiece tokenizer (native/wordpiece.cpp).

``NativeWordPieceTokenizer`` is a drop-in for the encode_batch path of
the pure-Python tokenizer: same vocab file, same specials, same padded
(ids, mask) contract. Build on demand with ``build_native()`` (g++) or
``make -C native``; ``is_available()`` gates callers so the Python
implementation remains the portable fallback.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Sequence

import numpy as np

from arxiv_rag_tpu.logging_utils import get_logger
from arxiv_rag_tpu.tokenize.wordpiece import SpecialTokens

log = get_logger("tokenize.native")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libarag_native.so"
_lib: ctypes.CDLL | None = None


def build_native(force: bool = False) -> bool:
    """Compile the shared library if needed. Returns availability."""
    srcs = sorted(_NATIVE_DIR.glob("*.cpp"))
    if not srcs:
        return False
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= max(s.stat().st_mtime for s in srcs):
            return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "all"],
            check=True, capture_output=True, timeout=240,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as exc:
        log.warning("native tokenizer build failed: %s", exc)
        return False


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p] * 5 + [ctypes.c_int]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


class NativeWordPieceTokenizer:
    """Multithreaded batch encoder backed by the C++ core."""

    def __init__(
        self,
        vocab_path: str | Path,
        specials: SpecialTokens = SpecialTokens(),
        do_lower_case: bool = True,
        n_threads: int = 0,
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable (build failed?)")
        self._lib = lib
        self.specials = specials
        self.n_threads = n_threads
        self._handle = lib.wp_create(
            str(vocab_path).encode(),
            specials.cls.encode(), specials.sep.encode(),
            specials.pad.encode(), specials.unk.encode(),
            1 if do_lower_case else 0,
        )
        if not self._handle:
            raise RuntimeError(f"failed to load vocab {vocab_path} (missing specials?)")
        self.vocab_size = lib.wp_vocab_size(self._handle)

    def __del__(self) -> None:
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.wp_destroy(handle)
            self._handle = None

    def encode_batch(
        self,
        texts: Sequence[str],
        max_len: int,
        pad_to: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        width = pad_to or max_len
        n = len(texts)
        ids = np.empty((n, width), np.int32)
        mask = np.empty((n, width), np.int32)
        if n == 0:
            return ids, mask
        raw = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * n)(*raw)
        lengths = np.array([len(b) for b in raw], np.int64)
        self._lib.wp_encode_batch(
            self._handle,
            arr,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, min(max_len, width), width, self.n_threads,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask
