"""Macroscopic moments, equation of state, and derived diagnostics.

Reference behavior: src/LBM/LBM_macro_compute/LBM_macro_compute_2d.py:51-117
and LBM_macro_compute_3d.py:9-120.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..utils.types import CellType

__all__ = [
    "macro_moments",
    "rho_to_density",
    "eos_pressure",
    "vorticity_2d",
]


def macro_moments(
    lat: Lattice,
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """Zeroth/first moments of f, frozen on OBSTACLE cells.

    rho = Σ_q f_q;  vel = Σ_q f_q e_q * c / rho
    (reference: LBM_macro_compute_2d.py:65-92).

    Returns:
        (rho_new, vel_new)
    """
    c = dx / dt

    macro_rho = jnp.sum(f, axis=1, keepdims=True)  # [B, 1, *res]
    is_obs = flags == int(CellType.OBSTACLE)
    rho_new = jnp.where(is_obs, rho, macro_rho)

    # first moment per dimension (no [B, Q, dim, *res] intermediate)
    moments = []
    for d in range(lat.dim):
        ed = jnp.asarray(
            lat.e[:, d].reshape(1, lat.q, *([1] * lat.dim)).astype(np.float64),
            dtype=f.dtype,
        )
        moments.append(jnp.sum(f * ed, axis=1, keepdims=True))
    macro_vel = jnp.concatenate(moments, axis=1) * (c / rho_new)  # [B, dim, *res]
    vel_new = jnp.where(is_obs, vel, macro_vel)
    return rho_new, vel_new


def rho_to_density(
    rho: jnp.ndarray,
    *,
    rho_gas: float,
    rho_fluid: float,
    density_gas: float,
    density_fluid: float,
) -> jnp.ndarray:
    """Linear map from order parameter rho to physical density.

    (reference: LBM_macro_compute_2d.py:94-101)
    """
    return density_gas + (density_fluid - density_gas) * (
        (rho - rho_gas) / (rho_fluid - rho_gas)
    )


def eos_pressure(
    density: jnp.ndarray, *, dx: float = 1.0, dt: float = 1.0
) -> jnp.ndarray:
    """Carnahan-Starling equation of state with a=12RT, b=4.

    p = rho RT (4 br/4 - 2 (br/4)^2) / (1 - br/4)^3 + rho RT - a rho^2
    (reference: LBM_macro_compute_2d.py:51-63 / LBM_collision_2d.py:85-102 —
    both expressions are algebraically identical).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    a = 12.0 * RT
    b = 4.0
    eta = b * density / 4.0
    return (
        density * RT * (4.0 * eta - 2.0 * eta * eta) / (1.0 - eta) ** 3
        + density * RT
        - a * density * density
    )


def vorticity_2d(vel: jnp.ndarray, dx: float) -> jnp.ndarray:
    """Central-difference vorticity (viz only), replicate-padded to full size.

    (reference: LBM_macro_compute_2d.py:109-117)
    """
    vort = (
        (vel[:, 0:1, 2:, 1:-1] - vel[:, 0:1, :-2, 1:-1])
        - (vel[:, 1:2, 1:-1, 2:] - vel[:, 1:2, 1:-1, :-2])
    ) / (2.0 * dx)
    return jnp.pad(vort, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
