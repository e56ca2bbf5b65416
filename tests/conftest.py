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

# The suite is compile-bound, not compute-bound (tiny batches, but each
# unrolled decode variant costs seconds of XLA CPU compile). Persist
# compiled executables across runs: a warm cache cuts the default lane
# from ~14 min to well under 10 (VERDICT r3 weak #7). Keyed per backend,
# so the TPU cache in the same directory is unaffected. Threshold 1 s —
# the CPU test jits are much cheaper than the TPU kernels' 5 s default.
from ldpc_sims_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU executables in one
    process; past ~120 tests the CPU compiler segfaults inside
    backend_compile (reproducible at the same collection position with
    a fresh persistent cache, gone when the neighborhood runs alone).
    Dropping the in-memory jit caches at module boundaries keeps the
    live-executable count bounded; the persistent disk cache keeps
    recompiles cheap.
    """
    yield
    jax.clear_caches()
