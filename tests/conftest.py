"""Test configuration: run every test on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md section 4): the same jitted code paths compile for CPU with
`xla_force_host_platform_device_count`, so sharding logic is exercised
without TPU hardware.
"""

import jax
import numpy as np
import pytest

# Force the CPU backend with 8 virtual devices.  NOTE: the JAX_PLATFORMS
# env var is not sufficient here — this environment ships an experimental
# TPU platform plugin ("axon") that wins unless the config is set before
# first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: repeated pytest runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
