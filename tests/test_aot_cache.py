"""AOT executable disk cache (ops/aot.py): get-or-compile correctness,
cross-"process" payload reuse (simulated by clearing the in-memory map),
key sensitivity to statics, and graceful fallback when payloads break."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arxiv_rag_tpu.ops import aot


@pytest.fixture(autouse=True)
def _clean_state(tmp_path, monkeypatch):
    monkeypatch.setenv("ARAG_AOT_DIR", str(tmp_path))
    aot._MEM.clear()
    aot._FAILED.clear()
    yield tmp_path
    aot._MEM.clear()
    aot._FAILED.clear()


def _wait_for_save(tmp_path, pattern, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        hits = list(tmp_path.glob(pattern))
        if hits or aot._FAILED:
            return hits
        time.sleep(0.05)
    return []


@jax.jit
def _noop(x):  # placeholder so jax is initialized before tests time things
    return x


toy = jax.jit(lambda x, s: x * s, static_argnames=("s",))


def test_call_correct_and_saves_payload(_clean_state):
    tmp_path = _clean_state
    x = jnp.arange(8, dtype=jnp.float32)
    out = aot.call("toy", toy, (x,), {"s": 3})
    np.testing.assert_allclose(np.asarray(out), np.arange(8, dtype=np.float32) * 3)
    hits = _wait_for_save(tmp_path, "toy_*.pkl")
    if not hits:
        pytest.skip("executable serialization unsupported on this backend")
    # a fresh process (simulated: clear the memory map) loads from disk —
    # and MUST stay correct even when the payload fails at run time
    # (XLA:CPU AOT results are machine-feature-pinned and can SIGILL-ish
    # fail on a different host; TPU payloads go stale across libtpu
    # updates — either way aot.call falls back to the jit and
    # blacklists the key)
    aot._MEM.clear()
    out2 = aot.call("toy", toy, (x,), {"s": 3})
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))
    key = aot._key("toy", (x,), {"s": 3}, toy)
    if key in aot._FAILED:  # payload executed and failed → must be gone
        assert not (tmp_path / f"{key}.pkl").exists()


def test_key_distinguishes_statics_and_shapes(_clean_state):
    x = jnp.arange(8, dtype=jnp.float32)
    # code fingerprint: a different defining module changes the key
    # (editing kernel source must invalidate payloads — advisor r3)
    assert aot._key("toy", (x,), {"s": 3}, toy) != aot._key(
        "toy", (x,), {"s": 3}, np.sin
    )
    assert aot._key("toy", (x,), {"s": 3}, toy) == aot._key(
        "toy", (x,), {"s": 3}, toy
    )
    assert aot._key("toy", (x,), {"s": 3}) != aot._key("toy", (x,), {"s": 4})
    y = jnp.arange(16, dtype=jnp.float32)
    assert aot._key("toy", (x,), {"s": 3}) != aot._key("toy", (y,), {"s": 3})
    assert aot._key("toy", (x,), {"s": 3}) != aot._key(
        "toy", (x.astype(jnp.int32),), {"s": 3}
    )
    out4 = aot.call("toy", toy, (x,), {"s": 4})
    np.testing.assert_allclose(np.asarray(out4), np.arange(8, dtype=np.float32) * 4)


def test_registered_source_deps_change_key(_clean_state):
    """Declared cross-module deps fold into the code fingerprint (the
    IVF jits trace a kernel body defined in pallas_topk — editing THAT
    file must invalidate their payloads too)."""
    x = jnp.arange(8, dtype=jnp.float32)
    mod = toy.__wrapped__.__module__ if hasattr(toy, "__wrapped__") else toy.__module__
    before = aot._key("toy", (x,), {"s": 3}, toy)
    try:
        aot.register_source_deps(mod, ("arxiv_rag_tpu.ops.pallas_topk",))
        after = aot._key("toy", (x,), {"s": 3}, toy)
        assert before != after
        # idempotent: same deps -> same key
        aot.register_source_deps(mod, ("arxiv_rag_tpu.ops.pallas_topk",))
        assert aot._key("toy", (x,), {"s": 3}, toy) == after
    finally:
        aot._SRC_DEPS.pop(mod, None)
        aot._SRC_HASH.pop(mod, None)


def test_corrupt_payload_falls_back(_clean_state):
    tmp_path = _clean_state
    x = jnp.arange(4, dtype=jnp.float32)
    key = aot._key("toy", (x,), {"s": 2}, toy)
    (tmp_path / f"{key}.pkl").write_bytes(b"not a pickle")
    out = aot.call("toy", toy, (x,), {"s": 2})
    np.testing.assert_allclose(np.asarray(out), np.arange(4, dtype=np.float32) * 2)
    # the bad payload was removed and the key blacklisted from reload
    assert not (tmp_path / f"{key}.pkl").exists()
    assert key in aot._FAILED


def test_enabled_gates_on_backend(monkeypatch):
    monkeypatch.setenv("ARAG_AOT", "0")
    assert not aot.enabled()
    monkeypatch.delenv("ARAG_AOT")
    # CPU backend in tests → disabled by default
    assert aot.enabled() == (jax.default_backend() == "tpu")
