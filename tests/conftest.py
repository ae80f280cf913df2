"""Test configuration: run on CPU with 8 virtual devices for sharding tests.

Must set the env vars before jax initializes its backends.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (real TPU); tests run on
# a virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
