"""Multiphase solvers: Shan-Chen (single distribution) and He-Chen-Zhang
(two distributions f, g).

Step orders match the reference drivers:
* SC  (demo_2d_LBM_multiphase_SC.py:114-133): stream -> moments(+density) ->
  bounce-back -> [sc force + BGK collide]
* HCZ (demo_2d_LBM_multiphase_HCZ.py:126-163): stream f,g -> moments(+density)
  -> bounce-back f,g -> capillary_process -> hcz collide,
  with optional velocity pinning after moments and after capillary
  (demo_2d_wave.py:125,141).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import (
    bounce_back,
    eos_pressure,
    feq,
    geq,
    hcz_capillary,
    hcz_collide,
    macro_moments,
    rho_to_density,
    sc_collide,
    stream,
    stream_bounce_macro,
    stream_bounce_moments,
)
from ..utils.types import CellType
from .params import SimulationParams
from .state import HCZState

__all__ = ["init_sc_state", "sc_step", "sc_step_impl", "init_hcz_state", "hcz_step", "hcz_step_impl"]


# ----------------------------------------------------------------------
# Shan-Chen
# ----------------------------------------------------------------------
def init_sc_state(params: SimulationParams, rho, density, vel, flags) -> HCZState:
    lat = params.lattice
    rho = jnp.array(rho)
    density = jnp.array(density)
    vel = jnp.array(vel)
    force = jnp.zeros_like(vel)
    f = feq(lat, density, vel, dx=params.dx, dt=params.dt, tau=params.tau, force=force)
    return HCZState(
        f=f,
        g=None,
        rho=rho,
        vel=vel,
        density=density,
        pressure=None,
        force=force,
        flags=jnp.array(flags),
        step=jnp.zeros((), jnp.int32),
    )


def sc_step_impl(params: SimulationParams, state: HCZState) -> HCZState:
    """Un-jitted SC step body."""
    lat = params.lattice
    dx, dt = params.dx, params.dt

    f = stream(lat, state.f)
    rho, vel = macro_moments(lat, f, state.rho, state.vel, state.flags, dx=dx, dt=dt)
    density = rho_to_density(
        rho,
        rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid,
        density_gas=params.density_gas,
        density_fluid=params.density_fluid,
    )
    f = bounce_back(lat, f, state.flags)
    density_wall = 0.5 * (params.density_gas + params.density_fluid)
    f, force = sc_collide(
        lat,
        f,
        rho,
        density,
        vel,
        state.flags,
        tau=params.tau,
        density_wall=density_wall,
        dx=dx,
        dt=dt,
    )
    return HCZState(
        f=f,
        g=None,
        rho=rho,
        vel=vel,
        density=density,
        pressure=None,
        force=force,
        flags=state.flags,
        step=state.step + 1,
    )


# ----------------------------------------------------------------------
# He-Chen-Zhang
# ----------------------------------------------------------------------
def init_hcz_state(
    params: SimulationParams,
    rho,
    density,
    vel,
    flags,
    vel_pin_mask=None,
    vel_pin_value=None,
) -> HCZState:
    """Seed f from feq(rho=density, ...) — the reference's init idiom uses the
    *physical density* as the feq rho even in multiphase
    (demo_2d_LBM_multiphase_HCZ.py:114) — and g from geq."""
    lat = params.lattice
    rho = jnp.array(rho)
    density = jnp.array(density)
    vel = jnp.array(vel)
    force = jnp.zeros_like(vel)
    pressure = eos_pressure(density, dx=params.dx, dt=params.dt)
    f = feq(lat, density, vel, dx=params.dx, dt=params.dt, tau=params.tau, force=force)
    g = geq(
        lat,
        rho,
        density,
        vel,
        pressure,
        dx=params.dx,
        dt=params.dt,
        feq_val=f,
    )
    fg_dt = jnp.dtype(params.fg_dtype)
    f, g = f.astype(fg_dt), g.astype(fg_dt)
    return HCZState(
        f=f,
        g=g,
        rho=rho,
        vel=vel,
        density=density,
        pressure=pressure,
        force=force,
        flags=jnp.array(flags),
        step=jnp.zeros((), jnp.int32),
        vel_pin_mask=vel_pin_mask,
        vel_pin_value=vel_pin_value,
    )


def _maybe_pin(state: HCZState, vel: jnp.ndarray) -> jnp.ndarray:
    if state.vel_pin_mask is not None:
        return jnp.where(state.vel_pin_mask, state.vel_pin_value, vel)
    return vel


sc_step = partial(jax.jit, static_argnums=0, donate_argnums=1)(sc_step_impl)


def hcz_step_impl(
    params: SimulationParams, state: HCZState, mesh=None
) -> HCZState:
    """Un-jitted HCZ step body."""
    return _hcz_step_shared(params, state, mesh=mesh)


hcz_step = partial(
    jax.jit, static_argnums=0, donate_argnums=1, static_argnames="mesh"
)(hcz_step_impl)


def _hcz_step_shared(
    params: SimulationParams,
    state: HCZState,
    H2=None,
    phi=None,
    mesh=None,
) -> HCZState:
    """Shared HCZ body; the ferrofluid solver passes H2/phi for the Kelvin force."""
    lat = params.lattice
    dx, dt = params.dx, params.dt
    c = dx / dt

    f, rho, vel, density = stream_bounce_macro(
        lat, state.f, state.flags, state.rho, state.vel,
        c=c, rho_gas=params.rho_gas, rho_fluid=params.rho_fluid,
        density_gas=params.density_gas, density_fluid=params.density_fluid,
        use_pallas=params.use_pallas, mesh=mesh,
    )
    g, m0g, m1g = stream_bounce_moments(
        lat, state.g, state.flags, params.use_pallas, mesh=mesh
    )
    vel = _maybe_pin(state, vel)

    rho, vel, density, pressure, force, dfai, dprho = hcz_capillary(
        lat,
        rho,
        vel,
        state.flags,
        g,
        density,
        state.pressure,
        kappa=params.kappa,
        gravity=jnp.asarray(params.gravity_vec(), dtype=vel.dtype),
        contact_angle=params.contact_angle,
        rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid,
        density_gas=params.density_gas,
        density_fluid=params.density_fluid,
        dx=dx,
        dt=dt,
        H2=H2,
        phi=phi,
        g_sum=m0g,
        g_mom=m1g,
        use_pallas=params.use_pallas,
        mesh=mesh,
    )
    vel = _maybe_pin(state, vel)

    f, g = hcz_collide(
        lat,
        f,
        g,
        rho,
        vel,
        density,
        pressure,
        state.flags,
        force,
        dfai,
        dprho,
        tau_f=params.tau_f,
        tau_g=params.tau_g,
        kbc_type=params.kbc_type,
        dx=dx,
        dt=dt,
        use_pallas=params.use_pallas,
        mesh=mesh,
    )
    return HCZState(
        f=f,
        g=g,
        rho=rho,
        vel=vel,
        density=density,
        pressure=pressure,
        force=force,
        flags=state.flags,
        step=state.step + 1,
        vel_pin_mask=state.vel_pin_mask,
        vel_pin_value=state.vel_pin_value,
    )
