"""Test configuration: run every test on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md section 4): the same jitted code paths compile for CPU with
`xla_force_host_platform_device_count`, so sharding logic is exercised
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compilation cache: repeated pytest runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
