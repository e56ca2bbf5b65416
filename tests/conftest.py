"""Test env: force CPU with 8 virtual devices BEFORE jax import.

The TPU-native analogue of "test multi-node without a cluster": all
sharding/mesh tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``), per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook may have imported jax (and locked JAX_PLATFORMS) before this
# conftest ran; backends initialize lazily, so overriding via jax.config
# here still wins as long as no device has been touched yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
