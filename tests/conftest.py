"""Test configuration: force CPU with 8 virtual devices BEFORE backend init.

This validates every pjit/Mesh path without TPU hardware (SURVEY.md §4) and
keeps unit tests hermetic.  NOTE: this image pre-sets JAX_PLATFORMS=axon in
a way that overrides the env var, so the platform must be forced through
jax.config *after* import but before first device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA-CPU compiles of the render/train programs
# dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
