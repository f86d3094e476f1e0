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
