"""Single-phase solver (BGK or entropic KBC).

Step order matches the reference driver (demo_2d_LBM.py:101-121):
stream -> moments -> bounce-back -> collide.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import (
    bgk_collide,
    feq,
    kbc_collide,
    stream,
    stream_bounce_moments,
)
from ..utils.types import CellType
from ..utils.types import KBCType
from .params import SimulationParams
from .state import SinglePhaseState

__all__ = ["init_state", "step", "step_impl"]


def init_state(
    params: SimulationParams,
    rho,
    vel,
    flags,
    force=None,
) -> SinglePhaseState:
    """Seed f = feq(rho, vel, force), as every reference demo does."""
    lat = params.lattice
    rho = jnp.array(rho)
    vel = jnp.array(vel)
    if force is None:
        force = jnp.zeros_like(vel)
    f = feq(
        lat, rho, vel, dx=params.dx, dt=params.dt, tau=params.tau, force=force
    )
    return SinglePhaseState(
        f=f,
        rho=rho,
        vel=vel,
        force=jnp.asarray(force),
        flags=jnp.array(flags),
        step=jnp.zeros((), jnp.int32),
    )


def step_impl(params: SimulationParams, state: SinglePhaseState) -> SinglePhaseState:
    """Un-jitted step body (for composition under scan/shard_map/graft)."""
    lat = params.lattice
    dx, dt = params.dx, params.dt

    f, m0, m1 = stream_bounce_moments(lat, state.f, state.flags, params.use_pallas)
    is_obs = state.flags == int(CellType.OBSTACLE)
    rho = jnp.where(is_obs, state.rho, m0)
    vel = jnp.where(is_obs, state.vel, m1 * ((dx / dt) / rho))
    if KBCType.is_KBC(params.kbc_type):
        f = kbc_collide(
            lat,
            f,
            rho,
            vel,
            state.flags,
            state.force,
            tau=params.tau,
            kbc_type=params.kbc_type,
            dx=dx,
            dt=dt,
        )
    else:
        f = bgk_collide(
            lat, f, rho, vel, state.flags, state.force, tau=params.tau, dx=dx, dt=dt
        )
    return SinglePhaseState(
        f=f,
        rho=rho,
        vel=vel,
        force=state.force,
        flags=state.flags,
        step=state.step + 1,
    )


step = partial(jax.jit, static_argnums=0, donate_argnums=1)(step_impl)
