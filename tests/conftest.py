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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
