"""Equilibrium distributions: feq (exact exponential form), geq, Gamma, heq.

The reference uses the *exponential-form* equilibrium (He-Chen-Zhang family)

    feq_q = rho * w_q * prod_d (2 - sqrt(1 + 3 u_d^2/c^2))
                      * prod_d ((2 u_d/c + sqrt(1+3u_d^2/c^2)) / (1 - u_d/c)) ^ e_{q,d}

(reference: LBM_collision_2d.py:113-161, LBM_collision_3d.py:133-187).

The reference evaluates ``pow(x, e)`` with integer-tensor exponents.  Since
e_{q,d} ∈ {-1, 0, 1}, the TPU-native form unrolls the pow into a broadcast
select between ``x``, ``1/x`` and ``1`` — no transcendental pow, no poles
beyond the unavoidable 1/(1-u) ones, and everything fuses into one VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice

__all__ = ["feq", "geq", "gamma_quadratic", "heq"]


def feq(
    lat: Lattice,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    *,
    dx: float = 1.0,
    dt: float = 1.0,
    tau: float | None = None,
    force: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exponential-form equilibrium.

    Args:
        rho: ``[B, 1, *res]``; vel/force: ``[B, dim, *res]``.
        tau, force: if ``force`` is given, the velocity is shifted by
            ``tau * force / rho`` before evaluating feq (the reference's
            forcing-by-equilibrium-shift, LBM_collision_2d.py:121-123).

    Returns:
        ``[B, Q, *res]``.
    """
    if force is not None:
        if tau is None:
            raise ValueError("feq: force shift requires tau")
        vel = vel + tau * force / rho

    c = dx / dt
    u = vel / c  # [B, dim, *res]
    t = jnp.sqrt(1.0 + 3.0 * u * u)  # [B, dim, *res]
    plus = (2.0 * u + t) / (1.0 - u)  # the pow base per axis
    minus = 1.0 / plus

    dtype = rho.dtype
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=dtype)

    out = rho * w
    for d in range(lat.dim):
        out = out * (2.0 - t[:, d : d + 1])
    for d in range(lat.dim):
        ed = lat.e[:, d].reshape(1, lat.q, *([1] * lat.dim))  # static int mask
        pd = plus[:, d : d + 1]
        md = minus[:, d : d + 1]
        fac = jnp.where(ed == 1, pd, jnp.where(ed == -1, md, jnp.ones((), dtype)))
        out = out * fac
    return out


def geq(
    lat: Lattice,
    rho: jnp.ndarray,
    density: jnp.ndarray,
    vel: jnp.ndarray,
    pressure: jnp.ndarray,
    *,
    dx: float = 1.0,
    dt: float = 1.0,
    feq_val: jnp.ndarray | None = None,
    tau: float | None = None,
    force: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Equilibrium of the HCZ pressure distribution g.

    geq = w*(p - cs2*density) + cs2*density/rho * feq
    (reference: LBM_collision_2d.py:163-181).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    if feq_val is None:
        feq_val = feq(lat, rho, vel, dx=dx, dt=dt, tau=tau, force=force)
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=rho.dtype)
    return w * (pressure - cs2 * density) + cs2 * density / rho * feq_val


def gamma_quadratic(
    lat: Lattice, vel: jnp.ndarray, *, dx: float = 1.0, dt: float = 1.0
) -> jnp.ndarray:
    """Quadratic equilibrium shape function Γ(u) used by the HCZ forcing terms.

    Γ_q = w_q (1 + e·u/cs2 + (e·u)^2/(2 cs2^2) - u·u/(2 cs2))
    (reference: LBM_collision_HCZ_2d.py:181-191).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    dtype = vel.dtype
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=dtype)

    uv = jnp.sum(vel * vel, axis=1, keepdims=True)  # [B, 1, *res]
    # accumulate e.u per dimension to avoid a [B, Q, dim, *res] intermediate
    eu = jnp.zeros_like(w * uv)
    for d in range(lat.dim):
        ed = jnp.asarray(
            lat.e[:, d].reshape(1, lat.q, *([1] * lat.dim)).astype(np.float64),
            dtype=dtype,
        )
        eu = eu + vel[:, d : d + 1] * ed * c
    return w * (1.0 + eu / cs2 + 0.5 * eu * eu / (cs2 * cs2) - 0.5 * uv / cs2)


def heq(lat: Lattice, psi: jnp.ndarray) -> jnp.ndarray:
    """Equilibrium of the magnetic-potential Poisson distribution h.

    heq_q = w_q * psi for q>0 and (w_0 - 1) * psi for the rest population
    (Chai et al. 2007 eq. 2.2; reference: LBM_magnetic_2d.py:88-97).
    """
    w = np.copy(lat.weights)
    w[0] -= 1.0
    w = jnp.asarray(w.reshape(1, lat.q, *([1] * lat.dim)), dtype=psi.dtype)
    return psi * w
