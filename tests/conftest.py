"""Test harness: run JAX on CPU with 8 virtual devices.

This is the SURVEY §4 distributed-without-cluster strategy — the mesh /
shard_map / collective paths are exercised deterministically on CPU
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``), matching how
the driver validates ``dryrun_multichip``. Must run before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
