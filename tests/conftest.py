import os

# Tests run on a virtual 8-device CPU mesh so all multi-chip sharding paths are
# exercised without TPU hardware. In this image a sitecustomize module imports
# jax and registers a TPU plugin before conftest runs, so setting the env var
# alone is not enough — the config must be updated on the already-imported jax.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU XLA compiles dominate suite wall-clock (~1-2 min per distinct jitted
# config on this 1-core box); a persistent cache makes re-runs compile-free.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
