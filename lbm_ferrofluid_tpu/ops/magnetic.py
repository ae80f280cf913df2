"""Magnetic scalar-potential solver: an LBM relaxation of the Poisson equation.

Solves  div((1+chi) grad(psi)) = -div(chi H_ext)  for the induced potential
psi via the Chai et al. (2007) Poisson-LBM scheme, exactly as the reference
(src/LBM/LBM_magnetic/LBM_magnetic_2d.py:88-164, _3d.py:108-188):

* psi  = Σ_{q>0} h_q / (1 - w_0)
* heq  = psi * w, with the rest population getting (w_0 - 1) psi
* rhs  = div(chi H_ext)|_staggered * dx / (1 + chi), zeroed off-fluid
* h'   = (1 - 1/tau) h + heq/tau + dt * w * rhs * cs2 (0.5 - tau) dt
* H_int = -grad(psi)

The reference's 30-iteration inner loop (demo_3d_LBM_Rosensweig_instability.py:
163-173) becomes a ``lax.fori_loop`` inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..utils.types import CellType
from .collide import CHI_K, smooth_phi
from .equilibrium import heq
from .stencils import isotropic_grad, staggered_x, staggered_y, staggered_z
from .stream import bounce_back, stream

__all__ = ["magnetic_sweep", "solve_H_int"]


def magnetic_sweep(
    lat: Lattice,
    h: jnp.ndarray,
    phi: jnp.ndarray,
    flags: jnp.ndarray,
    H_ext_mac: list[jnp.ndarray],
    *,
    tau: float,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """One Poisson-LBM collision sweep; returns (H_int, h_new).

    ``flags`` here is the *magnetic* flag field, which in the ferrofluid demos
    differs from the hydrodynamic one (open in the field direction; reference
    demo_3d_LBM_Rosensweig_instability.py:120-121).
    """
    dim = lat.dim
    c = dx / dt
    cs2 = c * c / 3.0

    w = jnp.asarray(lat.w_bcast(np.float64), dtype=h.dtype)
    w0 = float(lat.weights[0])

    psi = jnp.sum(h[:, 1:], axis=1, keepdims=True) / (1.0 - w0)
    heq_val = heq(lat, psi)

    chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * dx))
    chx = staggered_x(chi) * H_ext_mac[0]
    chy = staggered_y(chi) * H_ext_mac[1]
    rhs = (chx[..., 1:] - chx[..., :-1]) + (chy[..., 1:, :] - chy[..., :-1, :])
    if dim == 3:
        chz = staggered_z(chi) * H_ext_mac[2]
        rhs = rhs + (chz[..., 1:, :, :] - chz[..., :-1, :, :])
    rhs = rhs * dx / (1.0 + chi)
    rhs = jnp.where(flags == int(CellType.FLUID), rhs, jnp.zeros_like(rhs))

    add_h = dt * w * rhs * (cs2 * (0.5 - tau) * dt)
    collision_h = (1.0 - 1.0 / tau) * h + heq_val / tau + add_h
    h_new = jnp.where(flags == int(CellType.OBSTACLE), h, collision_h)

    H_int = -isotropic_grad(psi, dx, flags, dim)
    return H_int, h_new


def solve_H_int(
    lat: Lattice,
    h: jnp.ndarray,
    phi: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    H_ext_mac: list[jnp.ndarray],
    *,
    tau: float,
    n_iters: int = 30,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """Run ``n_iters`` sweeps of [stream -> bounce-back -> magnetic_sweep].

    Mirrors the demos' inner loop (demo_2d_LBM_two_droplets.py:167-177);
    returns (H_int from the last sweep, final h).
    """

    def body(_, carry):
        h, _H = carry
        h = stream(lat, h)
        h = bounce_back(lat, h, magnetic_flags)
        H_int, h = magnetic_sweep(
            lat, h, phi, magnetic_flags, H_ext_mac, tau=tau, dx=dx, dt=dt
        )
        return h, H_int

    H0 = jnp.zeros(phi.shape[:1] + (lat.dim,) + phi.shape[2:], dtype=phi.dtype)
    h, H_int = jax.lax.fori_loop(0, n_iters, body, (h, H0))
    return H_int, h
