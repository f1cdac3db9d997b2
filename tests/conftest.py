"""Test configuration: force an 8-device CPU-backed mesh.

Multi-device tests run without real hardware via
``--xla_force_host_platform_device_count=8`` — the JAX-native answer to
"test multi-chip without a cluster" (SURVEY.md §4). Must run before any
jax import, hence environment setup at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the remote-TPU plugin regardless of
# the env var; this config update is the reliable way to pin tests to CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache makes repeat test runs fast (first run still pays)
jax.config.update("jax_compilation_cache_dir", "/tmp/m2trans_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(33)
