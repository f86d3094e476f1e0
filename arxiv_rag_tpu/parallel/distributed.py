"""Multi-host (multi-process) setup: jax.distributed + mesh helpers.

The reference has no comms backend at all — cross-process communication
is pickled executor args and the filesystem (``pipeline.py:954-959``).
The TPU-native equivalent (SURVEY §5.8): ``jax.distributed`` process
groups with XLA collectives over ICI within a slice and DCN across
hosts. This module wraps initialization and host-sharded work division
so CLI stages can run multi-host without bespoke wiring:

- ``init_distributed()``: no-op on a single host; otherwise initializes
  the process group from env/args (standard TPU pod metadata or
  explicit coordinator address);
- ``global_mesh()``: one 1-D mesh over all addressable+remote devices —
  the index's row axis spans every chip in the pod, shard-local top-k
  merges over ICI first by construction (mesh order follows
  ``jax.devices()``, which groups slice-local devices);
- ``host_shard()``: deterministic round-robin split of a host-side work
  list (papers, files) by process index — the ingest/extract stages'
  DCN story is "each host owns a disjoint file set", matching the
  columnar store's shard-per-writer layout.
"""

from __future__ import annotations

import os
from typing import Sequence, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh

from arxiv_rag_tpu.logging_utils import get_logger

log = get_logger("distributed")

T = TypeVar("T")


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if a process group was initialized. Single-host runs
    (no coordinator configured anywhere) are a no-op — all CLI verbs
    call this unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get("ARAG_COORDINATOR")
    in_pod_env = any(
        os.environ.get(k)
        for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not in_pod_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except (RuntimeError, ValueError) as exc:
        log.warning("jax.distributed.initialize failed (%s); single-process", exc)
        return False


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_shard(items: Sequence[T]) -> list[T]:
    """The subset of a host-side work list owned by this process
    (round-robin by process index — deterministic, balanced, and stable
    under append-only growth of the list)."""
    pid, n = jax.process_index(), jax.process_count()
    return list(items[pid::n])


def is_primary() -> bool:
    """True on the process that should write global artifacts
    (manifests, reports)."""
    return jax.process_index() == 0
