"""Reference-compatible API layer.

Users of the original package (src/LBM/simulation/simulation_runner.py:22-195
and the op classes it creates) can port their driver scripts with minimal
changes: the same ``SimulationParameters`` + ``SimulationRunner`` factories
and the same method names/signatures (``propagation``, ``rebounce_obstacle``,
``macro_compute``, ``get_feq_``, ``collision``, ``capillary_process``,
``get_H_int``, ...), with jnp arrays instead of torch tensors.

This is a convenience facade over the pure-function ops; new code should use
``lbm_ferrofluid_tpu.models`` directly (jitted whole-step functions are far
faster than eager per-op dispatch).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .lattice import get_lattice
from .ops import (
    bgk_collide,
    bounce_back,
    eos_pressure,
    feq,
    geq,
    hcz_capillary,
    hcz_collide,
    kbc_collide,
    macro_moments,
    magnetic_sweep,
    rho_to_density,
    sc_collide,
    stream,
    vorticity_2d,
)

__all__ = ["SimulationParameters", "SimulationRunner"]


class SimulationParameters:
    """Drop-in analog of the reference's parameter object
    (simulation_parameters.py:6-83)."""

    def __init__(
        self,
        dtype=jnp.float32,
        dim: int = 2,
        dt: float = 1.0,
        device=None,  # accepted for source compatibility; unused under JAX
        simulation_size=(1, 1, 256, 256),
        density_gas: float = 0.0,
        density_fluid: float = 1.0,
        contact_angle: float = 0.75 * math.pi,
        Q: int = 9,
        tau: float = 1.0,
        rho_gas: float = 0.038,
        rho_fluid: float = 0.265,
        kappa: float = 0.08,
        tau_g: float = 0.7,
        tau_f: float = 0.7,
        k: float = 1.0,
    ):
        self.dim = dim
        self.dtype = dtype
        self.dt = dt
        self.device = device
        self.frame = 0
        self.time_per_frame = 0.0
        self.frame_length = 1.0
        self.time_total = 0.0
        if dim == 2 and len(simulation_size) != 4:
            raise ValueError(
                "For 2d simulation simulation size should have 4 parameters"
                " B x C x H x W"
            )
        self.simulation_size = tuple(simulation_size)
        self.density_gas = density_gas
        self.density_fluid = density_fluid
        self.contact_angle = float(np.asarray(contact_angle).reshape(-1)[0])
        self.Q = Q
        self.tau = tau
        self.rho_gas = rho_gas
        self.rho_fluid = rho_fluid
        self.kappa = kappa
        self.tau_g = tau_g
        self.tau_f = tau_f
        self.k = k

    def step(self):
        self.time_per_frame += self.dt
        self.time_total += self.dt
        if self.time_per_frame >= self.frame_length:
            self.frame += 1
            self.time_total = self.frame * self.frame_length
            self.time_per_frame = 0.0

    def get_dx(self):
        return 1.0 / max(self.simulation_size)

    def is_2d(self):
        return self.dim == 2

    def is_3d(self):
        return self.dim == 3


class _Propagation:
    def __init__(self, lat):
        self._lat = lat
        self.rank = lat.dim

    def propagation(self, f):
        return stream(self._lat, f)

    def rebounce_obstacle(self, f, flags):
        return bounce_back(self._lat, f, flags)


class _MacroCompute:
    def __init__(self, lat, p: SimulationParameters):
        self._lat = lat
        self._p = p

    def macro_compute(self, dx, dt, f, rho, vel, flags, g=None, pressure=None,
                      density=None):
        rho_new, vel_new = macro_moments(self._lat, f, rho, vel, flags, dx=dx, dt=dt)
        if density is not None:
            density = rho_to_density(
                rho_new,
                rho_gas=self._p.rho_gas,
                rho_fluid=self._p.rho_fluid,
                density_gas=self._p.density_gas,
                density_fluid=self._p.density_fluid,
            )
            return [rho_new, vel_new, density]
        return [rho_new, vel_new]

    def get_pressure(self, dx, dt, density):
        return eos_pressure(density, dx=dx, dt=dt)

    def get_vort(self, vel, dx):
        return vorticity_2d(vel, dx)


class _CollisionBase:
    def __init__(self, lat, p: SimulationParameters):
        self._lat = lat
        self._p = p
        self._gravity = np.zeros((1, lat.dim, *([1] * lat.dim)), np.float32)

    def set_gravity(self, gravity: float):
        g = np.zeros((1, self._lat.dim, *([1] * self._lat.dim)), np.float32)
        g[0, 1] = -gravity
        self._gravity = g

    def preset_KBC(self, dx, dt):  # moment tables are built on the fly
        return None

    def get_feq_(self, dx, dt, rho, vel, force=None):
        return feq(self._lat, rho, vel, dx=dx, dt=dt, tau=self._p.tau, force=force)

    def get_geq_(self, dx, dt, rho, density, vel, pressure, force=None, feq=None):
        return geq(
            self._lat, rho, density, vel, pressure, dx=dx, dt=dt,
            feq_val=feq, tau=self._p.tau, force=force,
        )

    def equation_of_states(self, dx, dt, rho):
        return eos_pressure(rho, dx=dx, dt=dt)


class _Collision(_CollisionBase):
    def collision(self, dx, dt, f, rho, vel, flags, force, KBC_type=None):
        # LBMCollision2d accepts and ignores KBC_type (LBM_collision_2d.py:267)
        return bgk_collide(
            self._lat, f, rho, vel, flags, force, tau=self._p.tau, dx=dx, dt=dt
        )


class _CollisionMRT(_CollisionBase):
    def collision(self, dx, dt, f, rho, vel, flags, force, KBC_type=None):
        return kbc_collide(
            self._lat, f, rho, vel, flags, force,
            tau=self._p.tau, kbc_type=KBC_type, dx=dx, dt=dt,
        )


class _CollisionSC(_CollisionBase):
    def collision(self, dx, dt, f, rho, density, vel, flags, force, KBC_type=None):
        density_wall = 0.5 * (self._p.density_gas + self._p.density_fluid)
        f_new, _force = sc_collide(
            self._lat, f, rho, density, vel, flags,
            tau=self._p.tau, density_wall=density_wall, dx=dx, dt=dt,
        )
        return f_new


class _CollisionHCZ(_CollisionBase):
    def capillary_process(self, rho, vel, flags, force, dt=1.0, dx=1.0, g=None,
                          density=None, pressure=None, H2=None, phi=None):
        return list(
            hcz_capillary(
                self._lat, rho, vel, flags, g, density, pressure,
                kappa=self._p.kappa,
                gravity=jnp.asarray(self._gravity, dtype=vel.dtype),
                contact_angle=self._p.contact_angle,
                rho_gas=self._p.rho_gas, rho_fluid=self._p.rho_fluid,
                density_gas=self._p.density_gas,
                density_fluid=self._p.density_fluid,
                dx=dx, dt=dt, H2=H2, phi=phi,
            )
        )

    def collision(self, dx, dt, f, rho, vel, density, flags, force, g=None,
                  pressure=None, dfai=None, dprho=None, KBC_type=None):
        return list(
            hcz_collide(
                self._lat, f, g, rho, vel, density, pressure, flags, force,
                dfai, dprho, tau_f=self._p.tau_f, tau_g=self._p.tau_g,
                kbc_type=KBC_type, dx=dx, dt=dt,
            )
        )


class _Magnetic:
    def __init__(self, lat, p: SimulationParameters):
        self._lat = lat
        self._p = p

    def get_H_int(self, dt, dx, phi, flags, H_ext_mac, h):
        H_int, h_new = magnetic_sweep(
            self._lat, h, phi, flags, list(H_ext_mac),
            tau=self._p.tau, dx=dx, dt=dt,
        )
        return [H_int, h_new]


class SimulationRunner:
    """Factory facade matching the reference runner
    (simulation_runner.py:22-195)."""

    def __init__(self, parameters: SimulationParameters):
        self.parameters = parameters
        self._lat = get_lattice(parameters.dim)

    def create_propagation(self):
        return _Propagation(self._lat)

    def create_macro_compute(self):
        return _MacroCompute(self._lat, self.parameters)

    def create_collision(self):
        return _Collision(self._lat, self.parameters)

    def create_collision_MRT(self):
        # the reference returns None for 3D (simulation_runner.py:107-108)
        if self.parameters.is_3d():
            return None
        return _CollisionMRT(self._lat, self.parameters)

    def create_collision_SC(self):
        if self.parameters.is_3d():
            return None
        return _CollisionSC(self._lat, self.parameters)

    def create_collision_HCZ(self):
        return _CollisionHCZ(self._lat, self.parameters)

    def create_LBM_magnetic(self):
        return _Magnetic(self._lat, self.parameters)

    def step(self):
        self.parameters.step()
