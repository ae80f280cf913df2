"""Golden parity tests vs the reference CUDA/torch solver.

The npz files under tests/golden/ were produced by tools/gen_golden.py
running the *reference* implementation (torch, float32, CPU) on tiny
non-cubic grids.  These tests run the TPU-native solvers from the same
initial conditions and assert field-level agreement — the BASELINE.json
"density/velocity field parity" metric.
"""

import math
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_ferrofluid_tpu import CellType, KBCType
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    ferrofluid_step,
    hcz_step,
    init_ferrofluid_state,
    init_hcz_state,
    init_sc_state,
    init_singlephase_state,
    sc_step,
    singlephase_step,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"

RES2 = (24, 20)
RES3 = (10, 12, 14)


def _load(name):
    path = GOLDEN / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden data {name} missing — run tools/gen_golden.py")
    return np.load(path)


def _assert_close(got, want, name, atol=2e-5, rtol=2e-4):
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    err = np.abs(got - want).max()
    scale = np.abs(want).max() + 1e-30
    assert err <= atol + rtol * scale, f"{name}: max|err|={err:.3e} scale={scale:.3e}"


# ----------------------------------------------------------------------
# single phase
# ----------------------------------------------------------------------
@pytest.mark.parametrize("variant", ["bgk", "kbc_a"])
def test_singlephase_parity(variant):
    d = _load(f"singlephase_{variant}")
    params = SimulationParams(
        dim=2,
        tau=float(d["tau"]),
        kbc_type=int(KBCType.KBC_A) if variant == "kbc_a" else None,
    )
    flags = np.full((1, 1, *RES2), int(CellType.FLUID), np.uint8)
    rho = np.full((1, 1, *RES2), 0.265, np.float32)
    state = init_singlephase_state(params, rho, d["vel0"].astype(np.float32), flags)
    _assert_close(state.f, d["f0"], "f_init", atol=1e-6)

    for _ in range(20):
        state = singlephase_step(params, state)

    _assert_close(state.f, d["f"], "f")
    _assert_close(state.rho, d["rho"], "rho")
    _assert_close(state.vel, d["vel"], "vel")


# ----------------------------------------------------------------------
# Shan-Chen
# ----------------------------------------------------------------------
def test_sc_parity():
    d = _load("sc")
    params = SimulationParams(
        dim=2,
        tau=1.0,
        density_gas=0.02381,
        density_fluid=0.2508,
        rho_gas=0.02381,
        rho_fluid=0.2508,
    )
    state = init_sc_state(params, d["rho0"], d["den0"], np.zeros((1, 2, *RES2), np.float32), d["flags"])
    _assert_close(state.f, d["f0"], "f_init", atol=1e-6)

    for _ in range(20):
        state = sc_step(params, state)

    _assert_close(state.f, d["f"], "f")
    _assert_close(state.rho, d["rho"], "rho")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")


# ----------------------------------------------------------------------
# HCZ multiphase
# ----------------------------------------------------------------------
def _hcz_params(**kw):
    base = dict(
        dim=2,
        density_gas=0.02381,
        density_fluid=0.2508,
        rho_gas=0.02381,
        rho_fluid=0.2508,
        kappa=0.08,
        tau_f=0.7,
        tau_g=0.8,
        contact_angle=0.5 * math.pi,
    )
    base.update(kw)
    return SimulationParams(**base)


def test_hcz_parity():
    d = _load("hcz")
    params = _hcz_params()
    state = init_hcz_state(
        params, d["rho0"], d["den0"], np.zeros((1, 2, *RES2), np.float32), d["flags"]
    )
    _assert_close(state.f, d["f0"], "f_init", atol=1e-6)
    _assert_close(state.g, d["g0"], "g_init", atol=1e-6)
    _assert_close(state.pressure, d["p0"], "p_init", atol=1e-6)

    for _ in range(20):
        state = hcz_step(params, state)

    _assert_close(state.f, d["f"], "f")
    _assert_close(state.g, d["g"], "g")
    _assert_close(state.rho, d["rho"], "rho")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")
    _assert_close(state.pressure, d["p"], "pressure")


def test_hcz_kbc_wetting_parity():
    """KBC_A on g + gravity + non-neutral contact angle (droplet-spread config)."""
    d = _load("hcz_kbc_wetting")
    params = _hcz_params(
        kbc_type=int(KBCType.KBC_A), gravity=1e-4, contact_angle=0.75 * math.pi
    )
    state = init_hcz_state(
        params, d["rho0"], d["den0"], np.zeros((1, 2, *RES2), np.float32), d["flags"]
    )
    for _ in range(20):
        state = hcz_step(params, state)

    _assert_close(state.f, d["f"], "f")
    _assert_close(state.g, d["g"], "g")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")


# ----------------------------------------------------------------------
# ferrofluid (HCZ + magnetic Poisson sub-solve)
# ----------------------------------------------------------------------
def test_ferro2d_parity():
    d = _load("ferro2d")
    params = _hcz_params(
        kappa=0.5, tau_f=0.68, tau_g=0.68, mag_strength=100.0, poisson_iters=30
    )
    mflags = np.full((1, 1, *RES2), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :] = int(CellType.FLUID)
    state = init_ferrofluid_state(
        params, d["rho0"], d["den0"], np.zeros((1, 2, *RES2), np.float32),
        d["flags"], mflags,
    )
    for _ in range(10):
        state = ferrofluid_step(params, state)

    _assert_close(state.h, d["h"], "h")
    _assert_close(state.f, d["f"], "f")
    _assert_close(state.g, d["g"], "g")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")


def test_hcz3d_parity():
    d = _load("hcz3d")
    params = SimulationParams(
        dim=3,
        density_gas=0.02381,
        density_fluid=0.2508,
        rho_gas=0.02381,
        rho_fluid=0.2508,
        kappa=0.01,
        tau_f=0.68,
        tau_g=0.68,
        gravity=1e-4,
        contact_angle=0.5 * math.pi,
    )
    state = init_hcz_state(
        params, d["rho0"], d["den0"], np.zeros((1, 3, *RES3), np.float32), d["flags"]
    )
    _assert_close(state.f, d["f0"], "f_init", atol=1e-6)
    _assert_close(state.g, d["g0"], "g_init", atol=1e-6)

    for _ in range(10):
        state = hcz_step(params, state)

    _assert_close(state.f, d["f"], "f")
    _assert_close(state.g, d["g"], "g")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")


def test_ferro3d_parity():
    """North-star config (tiny): D3Q19 HCZ + magnetic + gravity."""
    d = _load("ferro3d")
    params = SimulationParams(
        dim=3,
        density_gas=0.02381,
        density_fluid=0.2508,
        rho_gas=0.02381,
        rho_fluid=0.2508,
        kappa=0.01,
        tau_f=0.68,
        tau_g=0.68,
        gravity=1e-4,
        contact_angle=0.5 * math.pi,
        mag_strength=85.0,
        poisson_iters=30,
    )
    mflags = np.full((1, 1, *RES3), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    state = init_ferrofluid_state(
        params, d["rho0"], d["den0"], np.zeros((1, 3, *RES3), np.float32),
        d["flags"], mflags,
    )
    for _ in range(8):
        state = ferrofluid_step(params, state)

    _assert_close(state.h, d["h"], "h")
    _assert_close(state.f, d["f"], "f")
    _assert_close(state.g, d["g"], "g")
    _assert_close(state.vel, d["vel"], "vel")
    _assert_close(state.density, d["den"], "density")
