"""Test harness: run everything on a simulated 8-device CPU mesh.

The reference can only exercise its distributed path by actually launching
8 GPUs (SURVEY.md §4); here every test runs against 8 virtual XLA CPU
devices so sharding and collectives are covered in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by the host's sitecustomize (which registers a
# TPU PJRT plugin); the config update still wins because backends initialize
# lazily on first use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat suite runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
