"""Disk cache of serialized compiled executables (AOT warm start).

Through the tunneled shared pool a Mosaic compile takes 10 s-10 min, and
one serving shape (plain-bf16 Q=32) never lands in XLA's persistent
compile cache at all (CLAUDE.md QUIRK — every process paid 95-320 s).
``jax.experimental.serialize_executable`` round-trips the COMPILED
executable instead: deserialize+load is ~0.1 s (proven in
tools/aot_fused.py / bench.py round 3). This module generalizes that
recipe: a keyed get-or-compile around any jitted function, so `arag
serve --warmup` and bench restarts skip every previously-seen compile.

Keys include shapes, dtypes, static kwargs, the jax version, a format
revision, and a content hash of the jitted function's defining module
source — editing kernel code invalidates its payloads automatically
(like XLA's HLO-keyed persistent cache, but without paying a trace per
call). Any load failure falls back to the plain jit call (the payloads
are a cache, never a correctness dependency).

Enabled on the TPU backend by default; ``ARAG_AOT=0`` disables,
``ARAG_AOT_DIR`` overrides the payload directory (default
``/tmp/arag_aot``). Reference anchor: the reference has no serving
runtime at all (config-only retrieval, ``3-chunks/pipeline/config.yaml``);
this is TPU-deployment infrastructure it never needed.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

_FORMAT_REV = 1
_MEM: dict[str, Callable] = {}
_FAILED: set[str] = set()  # keys whose save/load already failed — don't retry
_SAVING: set[str] = set()  # keys with an in-flight background serialize
_LOCK = threading.Lock()


def enabled() -> bool:
    if os.environ.get("ARAG_AOT", "") == "0":
        return False
    return jax.default_backend() == "tpu"


def _cache_dir() -> Path:
    return Path(os.environ.get("ARAG_AOT_DIR", "/tmp/arag_aot"))


_SRC_HASH: dict[str, str] = {}
# module -> extra source modules its jitted functions depend on (e.g.
# pallas_ivf's jits call the kernel body defined in pallas_topk —
# without this, a kernel edit would leave IVF payloads stale)
_SRC_DEPS: dict[str, tuple[str, ...]] = {}


def register_source_deps(module: str, deps: tuple[str, ...]) -> None:
    """Declare that payloads for jits defined in ``module`` must also be
    invalidated when any of ``deps`` (module names) changes."""
    _SRC_DEPS[module] = tuple(deps)
    _SRC_HASH.pop(module, None)  # recompute with deps folded in


def _module_file_hash(mod: str) -> str:
    try:
        import sys

        src_file = getattr(sys.modules[mod], "__file__", None)
        with open(src_file, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:12]
    except Exception:  # noqa: BLE001 — builtins/REPL: no source to pin
        return "nosrc"


def _code_fingerprint(jit_fn) -> str:
    """Hash of the source file(s) behind the jitted function (memoized
    per module; registered deps folded in). A payload keyed without this
    would silently keep serving OLD compiled code after a kernel edit
    (advisor r3, medium)."""
    fn = getattr(jit_fn, "__wrapped__", jit_fn)
    mod = getattr(fn, "__module__", "") or ""
    h = _SRC_HASH.get(mod)
    if h is None:
        parts = [_module_file_hash(mod)]
        parts += [_module_file_hash(d) for d in _SRC_DEPS.get(mod, ())]
        h = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
        _SRC_HASH[mod] = h
    return h


def _key(name: str, args: tuple, static_kwargs: dict[str, Any],
         jit_fn=None) -> str:
    parts = [name, jax.__version__, str(_FORMAT_REV)]
    if jit_fn is not None:
        parts.append(_code_fingerprint(jit_fn))
    for a in args:
        # None marks an absent optional operand (e.g. the device-planned
        # IVF jit's scales/masks) — keyed distinctly from any array
        parts.append(
            "None" if a is None
            else f"{tuple(a.shape)}:{np.dtype(a.dtype).name}"
        )
    for k in sorted(static_kwargs):
        parts.append(f"{k}={static_kwargs[k]}")
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]
    return f"{name}_{digest}"


def _load(key: str) -> Callable | None:
    path = _cache_dir() / f"{key}.pkl"
    if not path.exists():
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception:  # noqa: BLE001 — stale/incompatible payload
        _FAILED.add(key)
        try:
            path.unlink()
        except OSError:
            pass
        return None


def _save(key: str, jit_fn, args: tuple, static_kwargs: dict[str, Any]) -> Callable | None:
    """Serialize the (already warm) compiled executable. lower+compile on
    a warm jit reuses the cached executable, so this is cheap."""
    import time

    try:
        from jax.experimental import serialize_executable as se

        sds = tuple(
            None if a is None else jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in args
        )
        t0 = time.perf_counter()
        comp = jit_fn.lower(*sds, **static_kwargs).compile()
        lower_s = time.perf_counter() - t0
        if lower_s > 5.0:
            # the warm jit should reuse its cached executable; a slow
            # lower+compile here means this JAX version re-compiled in
            # the background thread (advisor r3: perf risk during live
            # serving for the QUIRK shape) — surface it
            import logging

            logging.getLogger("arxiv_rag_tpu.ops.aot").warning(
                "AOT background lower+compile for %s took %.1fs (expected "
                "sub-second executable reuse; this JAX version may be "
                "recompiling)", key, lower_s,
            )
        payload = se.serialize(comp)
        d = _cache_dir()
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".{key}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        tmp.replace(d / f"{key}.pkl")
        return comp
    except Exception:  # noqa: BLE001 — never let the cache break the call
        _FAILED.add(key)
        return None


def call(name: str, jit_fn, args: tuple, static_kwargs: dict[str, Any]):
    """Invoke ``jit_fn(*args, **static_kwargs)`` through the AOT cache:
    in-memory executable → disk payload → plain jit call (which compiles
    via XLA's own persistent cache), serializing after the first success
    so the NEXT process skips the compile entirely."""
    key = _key(name, args, static_kwargs, jit_fn)
    fn = _MEM.get(key)
    if fn is None:
        with _LOCK:
            fn = _MEM.get(key)
            if fn is None and key not in _FAILED:
                fn = _load(key)
                if fn is not None:
                    _MEM[key] = fn
    if fn is not None:
        try:
            return fn(*args)
        except Exception:  # noqa: BLE001 — stale payload failing at RUN
            # time (e.g. after a libtpu/XLA update): drop it and fall
            # back to the jit, which recompiles and re-serializes
            with _LOCK:
                _MEM.pop(key, None)
                _FAILED.add(key)
            try:
                (_cache_dir() / f"{key}.pkl").unlink()
            except OSError:
                pass
    out = jit_fn(*args, **static_kwargs)

    # serialize in the background: lower+compile on the warm jit is
    # cheap but not free (~100 ms of host work), and the caller may be
    # inside a serving window
    def _bg() -> None:
        with _LOCK:
            if key in _MEM or key in _FAILED or key in _SAVING:
                return
            _SAVING.add(key)
        comp = _save(key, jit_fn, args, static_kwargs)  # slow: not locked
        with _LOCK:
            _SAVING.discard(key)
            _MEM.setdefault(
                key,
                comp if comp is not None
                else (lambda *a: jit_fn(*a, **static_kwargs)),
            )

    with _LOCK:
        if key in _FAILED:
            # payload path is dead for this key — route straight to the
            # jit from now on (no save retries, no thread churn)
            _MEM.setdefault(key, lambda *a: jit_fn(*a, **static_kwargs))
        else:
            threading.Thread(target=_bg, daemon=True).start()
    return out
