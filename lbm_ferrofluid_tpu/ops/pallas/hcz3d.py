"""Fused Pallas kernels for the D3Q19 HCZ collision (LBGK path).

The HCZ collide (ops/collide.py:hcz_collide) evaluates feq/geq/Gamma and two
forcing inner products per cell; composed in jnp this materializes several
19-channel temporaries.  Here the f- and g-updates each run as one local
pass with all equilibria computed in-register.  Collision is purely local
(no halos), so the grid tiles (z, y) freely to fit VMEM.

Split into two kernels (f and g) because all inputs together exceed VMEM at
a 256x128 tile; feq is recomputed in the g kernel (flops are free, HBM is
not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...lattice import D3Q19, Lattice
from ...utils.types import CellType

__all__ = ["hcz_collide_fused", "hcz3d_supported"]

_FLUID = int(CellType.FLUID)


def hcz3d_supported(lat: Lattice, f_shape, kbc_type) -> bool:
    if lat.q != 19 or kbc_type is not None:
        return False
    B, Q, Z, Y, X = f_shape
    return B == 1 and X % 128 == 0 and Y % 8 == 0


def _feq_rows(rho, ux, uy, uz, c):
    """Exponential-form feq per channel, in-register (equilibrium.py:feq)."""
    lat = D3Q19
    axes = []
    for u in (ux, uy, uz):
        un = u / c
        t = jnp.sqrt(1.0 + 3.0 * un * un)
        plus = (2.0 * un + t) / (1.0 - un)
        axes.append((t, plus, 1.0 / plus))
    base = rho * (2.0 - axes[0][0]) * (2.0 - axes[1][0]) * (2.0 - axes[2][0])
    rows = []
    for q in range(19):
        v = base * float(lat.weights[q])
        for d in range(3):
            ev = int(lat.e[q][d])
            if ev == 1:
                v = v * axes[d][1]
            elif ev == -1:
                v = v * axes[d][2]
        rows.append(v)
    return rows


def _gamma_rows(ux, uy, uz, c):
    lat = D3Q19
    cs2 = c * c / 3.0
    uv = ux * ux + uy * uy + uz * uz
    rows = []
    for q in range(19):
        eu = (
            float(lat.e[q][0]) * ux + float(lat.e[q][1]) * uy + float(lat.e[q][2]) * uz
        ) * c
        rows.append(
            float(lat.weights[q])
            * (1.0 + eu / cs2 + 0.5 * eu * eu / (cs2 * cs2) - 0.5 * uv / cs2)
        )
    return rows


def _f_kernel(tau_f, dx, dt, f_ref, rho_ref, vel_ref, dfai_ref, flags_ref, out_ref):
    lat = D3Q19
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    is_fluid = flags_ref[0, 0] == _FLUID
    rho = rho_ref[0, 0]
    ux, uy, uz = vel_ref[0, 0], vel_ref[1, 0], vel_ref[2, 0]
    gx, gy, gz = -dfai_ref[0, 0], -dfai_ref[1, 0], -dfai_ref[2, 0]

    feq = _feq_rows(rho, ux, uy, uz, c)
    gamma = _gamma_rows(ux, uy, uz, c)
    pref = dt * dt * (1.0 - 0.5 / tau_f) / RT
    u_dot_g = ux * gx + uy * gy + uz * gz
    for q in range(19):
        e_dot_g = (
            float(lat.e[q][0]) * gx + float(lat.e[q][1]) * gy + float(lat.e[q][2]) * gz
        ) * c
        fq = f_ref[q, 0].astype(jnp.float32)
        coll = fq + (feq[q] - fq) / tau_f + pref * gamma[q] * (e_dot_g - u_dot_g)
        out_ref[q, 0] = jnp.where(is_fluid, coll, fq).astype(out_ref.dtype)


def _g_kernel(tau_g, dx, dt, g_ref, rho_ref, vel_ref, density_ref, pressure_ref,
              force_ref, dprho_ref, flags_ref, out_ref):
    lat = D3Q19
    c = dx / dt
    cs2 = c * c / 3.0
    is_fluid = flags_ref[0, 0] == _FLUID
    rho = rho_ref[0, 0]
    dens = density_ref[0, 0]
    p = pressure_ref[0, 0]
    ux, uy, uz = vel_ref[0, 0], vel_ref[1, 0], vel_ref[2, 0]
    fx, fy, fz = force_ref[0, 0], force_ref[1, 0], force_ref[2, 0]
    px, py, pz = -dprho_ref[0, 0], -dprho_ref[1, 0], -dprho_ref[2, 0]

    feq = _feq_rows(rho, ux, uy, uz, c)
    gamma = _gamma_rows(ux, uy, uz, c)
    dens_term = cs2 * dens / rho
    p_term = p - cs2 * dens
    u_dot_f = ux * fx + uy * fy + uz * fz
    u_dot_p = ux * px + uy * py + uz * pz
    pref = dt * (1.0 - 0.5 / tau_g)
    for q in range(19):
        wq = float(lat.weights[q])
        ex, ey, ez = (float(lat.e[q][d]) for d in range(3))
        geq = wq * p_term + dens_term * feq[q]
        e_dot_f = (ex * fx + ey * fy + ez * fz) * c
        e_dot_p = (ex * px + ey * py + ez * pz) * c
        gq = g_ref[q, 0].astype(jnp.float32)
        coll = (
            gq
            + (geq - gq) / tau_g
            + pref
            * (
                gamma[q] * (e_dot_f - u_dot_f)
                + (gamma[q] - wq) * (e_dot_p - u_dot_p)
            )
        )
        out_ref[q, 0] = jnp.where(is_fluid, coll, gq).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tau_f", "tau_g", "dx", "dt", "interpret")
)
def hcz_collide_fused(
    f, g, rho, vel, density, pressure, flags, force, dfai, dprho,
    *, tau_f: float, tau_g: float, dx: float = 1.0, dt: float = 1.0,
    interpret: bool = False,
):
    """Fused HCZ LBGK collision; semantics of ops/collide.py:hcz_collide
    with kbc_type None."""
    _, _, Z, Y, X = f.shape
    BY = 128 if Y % 128 == 0 else Y
    grid = (Z, Y // BY)
    flags_i32 = flags[0].astype(jnp.int32)

    bs = lambda ch: pl.BlockSpec(  # noqa: E731
        (ch, 1, BY, X), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    f_new = pl.pallas_call(
        functools.partial(_f_kernel, tau_f, dx, dt),
        grid=grid,
        in_specs=[bs(19), bs(1), bs(3), bs(3), bs(1)],
        out_specs=bs(19),
        out_shape=jax.ShapeDtypeStruct((19, Z, Y, X), f.dtype),
        compiler_params=params,
        interpret=interpret,
    )(f[0], rho[0], vel[0], dfai[0], flags_i32)

    g_new = pl.pallas_call(
        functools.partial(_g_kernel, tau_g, dx, dt),
        grid=grid,
        in_specs=[bs(19), bs(1), bs(3), bs(1), bs(1), bs(3), bs(3), bs(1)],
        out_specs=bs(19),
        out_shape=jax.ShapeDtypeStruct((19, Z, Y, X), g.dtype),
        compiler_params=params,
        interpret=interpret,
    )(g[0], rho[0], vel[0], density[0], pressure[0], force[0], dprho[0], flags_i32)

    return f_new[None], g_new[None]
