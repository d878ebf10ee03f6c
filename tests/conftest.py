"""Test harness: force an 8-fake-device CPU mesh (SURVEY.md §4).

NOTE: this environment pre-registers the experimental 'axon' TPU platform
and prepends it to jax_platforms, so JAX_PLATFORMS=cpu alone is NOT enough —
the config must be overridden after import, before first backend use.
Tests then run on 8 virtual CPU devices so distributed (shard_map) paths are
exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: single-core CPU CI makes XLA compiles the
# dominant test cost; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
