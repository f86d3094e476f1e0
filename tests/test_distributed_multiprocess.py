"""Multi-process jax.distributed exercise: 2 real CPU processes with a
local coordinator through init_distributed + host_shard + a cross-process
collective (SURVEY §5.8 — the non-no-op branch the single-process tests
can't reach)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize TPU plugin override
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from arxiv_rag_tpu.parallel.distributed import (
    global_mesh, host_shard, init_distributed, is_primary,
)

pid = int(sys.argv[2])
addr = sys.argv[3]
if pid == 0:
    ok = init_distributed(coordinator_address=addr, num_processes=2, process_id=0)
else:
    os.environ["ARAG_COORDINATOR"] = addr  # exercise the env-var branch
    ok = init_distributed(num_processes=2, process_id=1)
assert ok, "init_distributed must initialize the process group"

mesh = global_mesh()
# one shard per process -> summing requires a real cross-process collective
local = np.full((1,), float(jax.process_index() + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local
)
total = float(jax.jit(jnp.sum)(arr))

print(json.dumps({
    "pid": jax.process_index(),
    "nproc": jax.process_count(),
    "global_devices": jax.device_count(),
    "mesh_devices": int(mesh.devices.size),
    "shard": host_shard(list(range(10))),
    "primary": is_primary(),
    "psum_total": total,
}))
"""


def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        addr = f"127.0.0.1:{s.getsockname()[1]}"

    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(REPO), str(i), addr],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        # a worker stuck in jax.distributed init must not outlive the
        # test (a leaked process blocks the whole session on 1 core)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["nproc"] == 2
        assert o["global_devices"] == o["mesh_devices"] == 2
        # the collective saw BOTH processes' shards: 1.0 + 2.0
        assert o["psum_total"] == 3.0
    assert by_pid[0]["primary"] is True
    assert by_pid[1]["primary"] is False
    # host_shard: disjoint, covering, round-robin
    assert by_pid[0]["shard"] == [0, 2, 4, 6, 8]
    assert by_pid[1]["shard"] == [1, 3, 5, 7, 9]


# --------------------------------------------------------------------------
# Full multi-host slice: host-sharded embedding -> distributed index
# assembly -> sharded search, exact parity vs a single-process oracle
# (SURVEY §7 hard part 7 demonstrated, not inferred; round-2 missing #2).
# Reference anchor: the mp.Pool replica-DP it replaces
# (generate_embeddings_parallel.py:40-74,205).

E2E_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from arxiv_rag_tpu.parallel.distributed import init_distributed

pid = int(sys.argv[2]); addr = sys.argv[3]
# before ANY import that might touch the XLA backend
assert init_distributed(coordinator_address=addr, num_processes=2, process_id=pid)

from arxiv_rag_tpu.embed import Embedder
from arxiv_rag_tpu.models import ModelConfig, init_params
from arxiv_rag_tpu.parallel.distributed import global_mesh, host_shard
from arxiv_rag_tpu.parallel.search import sharded_topk
from arxiv_rag_tpu.ops.topk import cosine_topk_numpy
from arxiv_rag_tpu.tokenize import WordPieceTokenizer

# deterministic shared corpus + model (same seeds in both processes)
WORDS = ["neural", "network", "training", "graph", "database", "query",
         "quantum", "physics", "protein", "folding", "image", "vision"]
rng = np.random.default_rng(7)
texts = [" ".join(rng.choice(WORDS, size=10)) + f" tag{i}" for i in range(64)]
tok = WordPieceTokenizer.toy()
cfg = ModelConfig(vocab_size=len(tok.vocab), hidden_size=32,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=64, max_position_embeddings=64)
params = init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
emb = Embedder(params, cfg, tok, buckets=(32,), batch_size=16,
               compute_dtype=jnp.float32)

# 1) host-sharded embedding: THIS process embeds only its shard
my_rows = host_shard(list(range(len(texts))))
local_embs = emb.encode_texts([texts[i] for i in my_rows]).astype(np.float32)

# 2) distributed index assembly: per-process rows -> one row-sharded
#    global array (global row order = process 0's shard then process 1's)
mesh = global_mesh()
index = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local_embs
)
perm = list(range(0, len(texts), 2)) + list(range(1, len(texts), 2))  # global row -> corpus row

# 3) sharded search over the assembled index (one device per process ->
#    the all_gather merge crosses the process boundary)
q_corpus_rows = [5, 17, 40, 63]
q_embs = emb.encode_texts([texts[i] for i in q_corpus_rows]).astype(np.float32)
vals, gids = sharded_topk(index, jnp.asarray(q_embs), 5, mesh, use_pallas=False)
vals, gids = np.asarray(vals), np.asarray(gids)

# 4) single-process oracle: every worker embeds the FULL corpus and
#    scans it exactly (numpy) in corpus row order
full = emb.encode_texts(texts).astype(np.float32)
ov, oi = cosine_topk_numpy(full, q_embs, 5)

hit_corpus_rows = [[perm[g] for g in row] for row in gids.tolist()]
print(json.dumps({
    "pid": jax.process_index(),
    "oracle_rows": oi.tolist(),
    "sharded_rows": hit_corpus_rows,
    "oracle_vals": ov.tolist(),
    "sharded_vals": vals.tolist(),
    "self_top1": [row[0] for row in hit_corpus_rows],
    "queries": q_corpus_rows,
}))
"""


def test_two_process_embed_index_search_parity(tmp_path):
    worker = tmp_path / "e2e_worker.py"
    worker.write_text(E2E_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        addr = f"127.0.0.1:{s.getsockname()[1]}"

    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(REPO), str(i), addr],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)

    import numpy as np

    assert {o["pid"] for o in outs} == {0, 1}
    for o in outs:
        # self-retrieval: each query's own chunk is hit #1
        assert o["self_top1"] == o["queries"]
        # exact parity with the single-process oracle, rows and scores
        assert o["sharded_rows"] == o["oracle_rows"]
        np.testing.assert_allclose(
            np.asarray(o["sharded_vals"]), np.asarray(o["oracle_vals"]), atol=1e-4
        )
    # both processes see the SAME replicated merge result
    assert outs[0]["sharded_rows"] == outs[1]["sharded_rows"]
