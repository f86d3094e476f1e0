"""AOT executable serialization for the uncacheable fused-kernel shape.

CLAUDE.md QUIRK: the plain-bf16 Q=32 fused kernel's compile never lands
in the persistent compile cache through this tunnel (masked/int8/Q=512
variants cache fine), so every process pays a fresh 95-320s Mosaic
compile. This tool tests the workaround suggested in VERDICT #8:
serialize the COMPILED executable (jax.experimental.serialize_executable)
and reload it in a fresh process.

  python tools/aot_fused.py save   # compile once, serialize to disk
  python tools/aot_fused.py load   # fresh process: deserialize + run

Success = `load` reaches a correct first result in seconds.
"""

from __future__ import annotations

import os
import pickle
import sys
import time
from functools import partial

import numpy as np

T0 = time.perf_counter()
PATH = "/tmp/arag_aot_fused_q32.pkl"
ROWS = int(os.environ.get("ROWS", 2_000_000))
DIM, Q, K, BLOCK = 768, 32, 10, 4096


def log(msg: str) -> None:
    print(f"[aot +{time.perf_counter() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
    import jax.numpy as jnp

    from arxiv_rag_tpu.ops.pallas_topk import _fused_topk_jit

    n_pad = ROWS + ((-ROWS) % BLOCK)
    idx_s = jax.ShapeDtypeStruct((n_pad, DIM), jnp.bfloat16)
    q_s = jax.ShapeDtypeStruct((Q, DIM), jnp.bfloat16)
    nv_s = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    log(f"backend={jax.default_backend()} mode={mode}")

    if mode == "save":
        t0 = time.perf_counter()
        lowered = _fused_topk_jit.lower(
            idx_s, q_s, nv_s, k=K, block_rows=BLOCK, interpret=False
        )
        log(f"lowered in {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        compiled = lowered.compile()
        log(f"compiled in {time.perf_counter() - t0:.1f}s")
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        with open(PATH, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        log(f"serialized {os.path.getsize(PATH) / 1e6:.1f} MB -> {PATH}")
        return

    # mode == "load": fresh process, no compile allowed
    from jax.experimental import serialize_executable as se

    t0 = time.perf_counter()
    with open(PATH, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    compiled = se.deserialize_and_load(payload, in_tree, out_tree)
    log(f"deserialized+loaded in {time.perf_counter() - t0:.1f}s")

    @partial(jax.jit, static_argnums=1)
    def make(key, rows):
        x = jax.random.normal(key, (rows, DIM), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.bfloat16)

    # small index slice padded up — correctness check only needs n_valid
    idx = jnp.zeros((n_pad, DIM), jnp.bfloat16)
    real = make(jax.random.PRNGKey(1), 50_000)
    idx = idx.at[:50_000].set(real)
    q = make(jax.random.PRNGKey(2), Q)
    nv = jnp.full((1, 1), 50_000, jnp.int32)
    t0 = time.perf_counter()
    vals, ids = compiled(idx, q, nv)
    vals = np.asarray(vals)
    log(f"first run (fetched) in {time.perf_counter() - t0:.1f}s")

    # correctness vs the XLA oracle on the real slice
    from arxiv_rag_tpu.ops.topk import flat_search, recall_at_k

    ov, oi = jax.jit(lambda a, b: flat_search(a, b, K))(real, q)
    r = recall_at_k(np.asarray(ids), np.asarray(oi), np.asarray(ov, np.float32),
                    tie_tol=5e-3, candidate_scores=vals.astype(np.float32))
    log(f"recall vs oracle: {r:.4f}")
    assert r > 0.99, r
    print("AOT_LOAD_OK")


if __name__ == "__main__":
    main()
