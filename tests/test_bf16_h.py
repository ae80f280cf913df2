"""bf16 h-storage option: runs, stays finite, tracks the f32 solution."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    ferrofluid_step,
    init_ferrofluid_state,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas / long-horizon: fast tier skips


def _scene(h_dtype):
    res = (12, 10, 12)
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4,
        mag_strength=85.0, poisson_iters=10, h_dtype=h_dtype,
    )
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((1, 1, *res), params.rho_gas, np.float32)
    den = np.full((1, 1, *res), params.density_gas, np.float32)
    rho[..., :5, :] = params.rho_fluid
    den[..., :5, :] = params.density_fluid
    state = init_ferrofluid_state(
        params, rho, den, np.zeros((1, 3, *res), np.float32), flags, mflags
    )
    return params, state


def test_bf16_h_tracks_f32():
    p32, s32 = _scene("float32")
    p16, s16 = _scene("bfloat16")
    assert s16.h.dtype == jnp.bfloat16
    for _ in range(5):
        s32 = ferrofluid_step(p32, s32)
        s16 = ferrofluid_step(p16, s16)
    assert bool(jnp.isfinite(s16.f).all())
    d32 = np.asarray(s32.density, np.float64)
    d16 = np.asarray(s16.density, np.float64)
    # density field stays close to the f32 solution
    assert np.abs(d16 - d32).max() < 5e-3 * np.abs(d32).max()
