"""Device mesh construction and index-row sharding.

The reference's only distribution story is process pools on one host
(SURVEY §2b). The TPU equivalent: a 1-D ``jax.sharding.Mesh`` over all
chips; the corpus/index shards on the row axis (each chip holds N/nd
rows in HBM), queries and model params replicate. Collectives
(all_gather of per-shard top-k candidates) ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_index_rows(
    index: np.ndarray | jnp.ndarray,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    extra_row_multiple: int = 1,
) -> tuple[jax.Array, int]:
    """Pad rows to a per-shard multiple and place the array row-sharded
    on the mesh. Returns (sharded array, n_valid original rows).

    Padding rows are zeros; search paths mask global ids >= n_valid, so
    padding can never surface in results.
    """
    n = index.shape[0]
    nd = mesh.shape[axis_name]
    multiple = nd * max(1, extra_row_multiple)
    pad = (-n) % multiple
    if pad:
        index = jnp.pad(jnp.asarray(index), ((0, pad), (0, 0)))
    sharding = NamedSharding(mesh, P(axis_name, None))
    return jax.device_put(jnp.asarray(index), sharding), n


def replicate(x: np.ndarray | jnp.ndarray, mesh: Mesh) -> jax.Array:
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
