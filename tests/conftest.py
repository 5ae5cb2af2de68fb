"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

This validates every pjit/Mesh path without TPU hardware (SURVEY.md §4) and
keeps unit tests hermetic and fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA-CPU compiles of the render/train programs
# dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
