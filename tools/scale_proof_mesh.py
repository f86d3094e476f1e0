"""2M scale proof, part B (8-device CPU mesh): load the on-disk index
built by scale_proof_tpu.py, row-shard it over the virtual mesh, and
verify exact self-retrieval through the sharded search path.
Run: JAX_PLATFORMS=cpu python tools/scale_proof_mesh.py [root]
"""
import sys as _sys
ROOT = _sys.argv[1] if len(_sys.argv) > 1 else "/tmp/arag_scale"

import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import pathlib as _p
REPO = str(_p.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
import numpy as np

from arxiv_rag_tpu.index.store import DenseIndex
from arxiv_rag_tpu.parallel import data_mesh
from arxiv_rag_tpu.search.engine import SearchEngine

N, D = 2_000_000, 768
t0 = time.perf_counter()
idx = DenseIndex.load(ROOT + "/idx")
t_load = time.perf_counter() - t0
assert idx.num_rows == N
print(f"[scale-B] DenseIndex.load (host-side bf16 view): {t_load:.1f}s", flush=True)

t0 = time.perf_counter()
idx.to_device(mesh=data_mesh(8))
t_put = time.perf_counter() - t0
print(f"[scale-B] row-sharded over 8 CPU devices: {t_put:.1f}s", flush=True)

probes = [0, 4096, 250_000, 262_144, 999_999, 1_500_000, 1_999_998, 1_999_999]
nb = N // 8
mms = [np.load(f"{ROOT}/emb/embeddings_{i:05d}.npy", mmap_mode="r") for i in range(8)]
qs = np.stack([np.asarray(mms[r // nb][r % nb], np.float32) for r in probes])
qs /= np.linalg.norm(qs, axis=1, keepdims=True)

eng = SearchEngine(idx, use_pallas=False)
t0 = time.perf_counter()
vals, rows = eng.search_embeddings(qs, k=10)
t_search = time.perf_counter() - t0
assert (rows[:, 0] == np.array(probes)).all(), list(zip(probes, rows[:, 0]))
assert vals[:, 0].min() > 0.99
print(f"[scale-B] sharded search over 8-dev mesh: {t_search:.1f}s for 8 queries; "
      f"self-retrieval 8/8 exact across shard boundaries", flush=True)
