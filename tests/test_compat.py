"""Reference-compatible facade: a reference-style driver loop reproduces the
models-path results (and therefore the golden parity data)."""

import math

import numpy as np
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType, KBCType
from lbm_ferrofluid_tpu.compat import SimulationParameters, SimulationRunner
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    hcz_step,
    init_hcz_state,
    init_singlephase_state,
    singlephase_step,
)


def test_compat_single_phase_matches_models():
    res = (24, 20)
    # damped tau: the compat path and the jitted whole-step differ by f32
    # rounding (~1e-8/step); an over-relaxed tau amplifies that chaotically
    tau = 0.9
    sp = SimulationParameters(dim=2, simulation_size=(1, 1, *res), tau=tau)
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision()

    rng = np.random.default_rng(0)
    flags = jnp.full((1, 1, *res), int(CellType.FLUID), jnp.uint8)
    density = jnp.full((1, 1, *res), 0.265, jnp.float32)
    vel0 = rng.uniform(-0.05, 0.05, (1, 2, *res)).astype(np.float32)
    vel = jnp.asarray(vel0)
    force = jnp.zeros((1, 2, *res), jnp.float32)

    f = coll.get_feq_(dx=1.0, dt=1.0, rho=density, vel=vel, force=force)
    for _ in range(10):
        f = prop.propagation(f=f)
        density, vel = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=density, vel=vel, flags=flags
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        f = coll.collision(dx=1.0, dt=1.0, f=f, rho=density, vel=vel,
                           flags=flags, force=force, KBC_type=None)
        runner.step()
    assert runner.parameters.frame == 10

    params = SimulationParams(dim=2, tau=tau)
    state = init_singlephase_state(
        params, np.full((1, 1, *res), 0.265, np.float32), vel0, np.asarray(flags)
    )
    for _ in range(10):
        state = singlephase_step(params, state)

    np.testing.assert_allclose(np.asarray(f), np.asarray(state.f), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vel), np.asarray(state.vel), rtol=1e-3, atol=1e-6
    )


def test_compat_hcz_matches_models():
    res = (20, 16)
    sp = SimulationParameters(
        dim=2, simulation_size=(1, 1, *res),
        density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508,
        kappa=0.1, tau_f=0.7, tau_g=0.8,
        contact_angle=0.75 * math.pi,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.preset_KBC(dx=1.0, dt=1.0)
    coll.set_gravity(gravity=1e-4)

    H, W = res
    flags = np.full((1, 1, *res), int(CellType.FLUID), np.uint8)
    flags[..., 0, :] = flags[..., -1, :] = int(CellType.OBSTACLE)
    flags[..., :, 0] = flags[..., :, -1] = int(CellType.OBSTACLE)
    rho0 = np.full((1, 1, *res), sp.rho_gas, np.float32)
    den0 = np.full((1, 1, *res), sp.density_gas, np.float32)
    rho0[..., 6:14, 5:11] = sp.rho_fluid
    den0[..., 6:14, 5:11] = sp.density_fluid
    flags_j = jnp.asarray(flags)

    rho = jnp.asarray(rho0)
    den = jnp.asarray(den0)
    vel = jnp.zeros((1, 2, *res), jnp.float32)
    force = jnp.zeros((1, 2, *res), jnp.float32)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(dx=1.0, dt=1.0, rho=rho, vel=vel, density=den,
                      pressure=pressure, force=force, feq=f)

    for _ in range(8):
        f = prop.propagation(f=f)
        g = prop.propagation(f=g)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags_j, density=den
        )
        f = prop.rebounce_obstacle(f=f, flags=flags_j)
        g = prop.rebounce_obstacle(f=g, flags=flags_j)
        rho, vel, den, pressure, force, dfai, dprho = coll.capillary_process(
            rho=rho, vel=vel, flags=flags_j, force=force, dt=1.0, dx=1.0,
            g=g, density=den, pressure=pressure,
        )
        f, g = coll.collision(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, density=den, flags=flags_j,
            force=force, g=g, pressure=pressure, dfai=dfai, dprho=dprho,
            KBC_type=int(KBCType.KBC_A),
        )

    params = SimulationParams(
        dim=2, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.1,
        tau_f=0.7, tau_g=0.8, contact_angle=0.75 * math.pi,
        gravity=1e-4, kbc_type=int(KBCType.KBC_A),
    )
    state = init_hcz_state(
        params, rho0, den0, np.zeros((1, 2, *res), np.float32), flags
    )
    for _ in range(8):
        state = hcz_step(params, state)

    np.testing.assert_allclose(np.asarray(f), np.asarray(state.f), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g), np.asarray(state.g), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(den), np.asarray(state.density), rtol=1e-5, atol=1e-7
    )
