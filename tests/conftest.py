import os

# Virtual 8-device CPU mesh for sharding tests; f64 for golden oracles.
# Must be set before jax import (SURVEY.md §4.5).
# Force CPU: the image profile exports JAX_PLATFORMS=axon (the TPU tunnel),
# which would remote-compile every jit in the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel via jax.config at
# registration time, ignoring the env var — override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU compiles of the scan-heavy sweep are slow; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
