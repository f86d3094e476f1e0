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

import jax  # noqa: E402

# a sitecustomize in this image registers the TPU PJRT plugin at
# interpreter start and overrides JAX_PLATFORMS; force CPU again
# post-import so the 8-device simulation actually takes effect
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: XLA-CPU compiles of the scan-based encoder
# take tens of seconds in this environment; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/arag_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
