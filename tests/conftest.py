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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop jit/compilation caches after each test module.

    The full suite accumulates hundreds of in-process XLA:CPU
    compilations; past a threshold the NEXT GSPMD compile segfaults
    inside backend_compile_and_load (reproducibly at
    test_sharding.py::test_ferrofluid_3d_sharded_matches, but only in
    full-suite order — every subset passes).  Clearing between modules
    keeps the compiler's in-process state bounded; the cost is a handful
    of re-traces for helpers shared across modules.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
