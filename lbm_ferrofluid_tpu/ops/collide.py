"""Collision operators: BGK, entropic KBC, Shan-Chen, and He-Chen-Zhang.

All operators are pure functions of (lattice, fields, static params); the
stateful reference classes (src/LBM/LBM_collision/*) map onto them 1:1:

* ``bgk_collide``            <- LBMCollision{2,3}d.collision (LBM_collision_2d.py:258-287)
* ``kbc_moment_split``       <- LBMCollisionMRT2d.get_s_by_KBC (LBM_collision_MRT_2d.py:62-182)
* ``kbc_collide``            <- LBMCollisionMRT2d.collision (:184-226)
* ``sc_force``               <- LBMCollisionSC2d.calculate_force (LBM_collision_SC_2d.py:22-97)
* ``contact_angle_boundary`` <- in-place boundary surgery in capillary_process
                                (LBM_collision_HCZ_2d.py:83-121, _3d.py:84-211),
                                recast as a functional slice-update chain
* ``hcz_capillary``          <- LBMCollisionHCZ{2,3}d.capillary_process
* ``hcz_collide``            <- LBMCollisionHCZ{2,3}d.collision
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..utils.types import CellType, KBCType
from .equilibrium import feq, geq, gamma_quadratic
from .moments import eos_pressure, rho_to_density
from .stencils import isotropic_grad, isotropic_laplacian

__all__ = [
    "bgk_collide",
    "kbc_moment_split",
    "kbc_collide",
    "sc_force",
    "sc_collide",
    "smooth_phi",
    "contact_angle_boundary",
    "hcz_capillary",
    "hcz_collide",
]

MU0 = 4.0 * math.pi * 1e-7  # vacuum permeability (reference: LBM_collision_HCZ_2d.py:142)
CHI_K = 0.33  # susceptibility scale hardcoded in the reference (HCZ_2d.py:143)


# ----------------------------------------------------------------------
# BGK
# ----------------------------------------------------------------------
def bgk_collide(
    lat: Lattice,
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    force: jnp.ndarray | None,
    *,
    tau: float,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """LBGK relaxation f' = (1 - 1/tau) f + feq/tau, frozen on OBSTACLE cells."""
    feq_val = feq(lat, rho, vel, dx=dx, dt=dt, tau=tau, force=force)
    out = (1.0 - 1.0 / tau) * f.astype(feq_val.dtype) + feq_val / tau
    return jnp.where(flags == int(CellType.OBSTACLE), f, out).astype(f.dtype)


# ----------------------------------------------------------------------
# Entropic KBC (D2Q9 only, as in the reference)
# ----------------------------------------------------------------------
def kbc_moment_split(
    lat: Lattice,
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    kbc_type: int | None,
    *,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Shear part ``s`` of the KBC moment decomposition of f.

    Variants (reference: LBM_collision_MRT_2d.py:62-182):
      * A/B use central moments (e - u), C/D raw moments;
      * A/C keep the normal-stress difference N in s;
      * non-KBC (LBGK id) additionally folds Qxxy/Qxyy/A into s.

    Note the reference's scaling quirks are reproduced exactly: central
    moments carry a single factor c per axis regardless of order p, raw
    moments carry c^(p+q).
    """
    if lat.q != 9:
        raise ValueError("KBC moment split is defined for D2Q9 only")
    c = dx / dt
    fr = f / rho  # [B, Q, *res]

    ex = jnp.asarray(
        lat.e[:, 0].reshape(1, lat.q, 1, 1).astype(np.float64), dtype=f.dtype
    )
    ey = jnp.asarray(
        lat.e[:, 1].reshape(1, lat.q, 1, 1).astype(np.float64), dtype=f.dtype
    )

    if KBCType.is_KBC_AB(kbc_type):
        # central moments: m[p,q] = sum_q (c (ex-ux)^p)(c (ey-uy)^q) f_q/rho
        bx = ex - vel[:, 0:1]
        by = ey - vel[:, 1:2]
        c2 = c * c
        m20 = c2 * jnp.sum(bx * bx * fr, axis=1)
        m02 = c2 * jnp.sum(by * by * fr, axis=1)
        m11 = c2 * jnp.sum(bx * by * fr, axis=1)
        m21 = c2 * jnp.sum(bx * bx * by * fr, axis=1)
        m12 = c2 * jnp.sum(bx * by * by * fr, axis=1)
        m22 = c2 * jnp.sum(bx * bx * by * by * fr, axis=1)
    else:
        # raw moments scaled by c^(p+q) (the reference's C_mat, :23-60)
        m20 = (c * c) * jnp.sum(ex * ex * fr, axis=1)
        m02 = (c * c) * jnp.sum(ey * ey * fr, axis=1)
        m11 = (c * c) * jnp.sum(ex * ey * fr, axis=1)
        m21 = (c * c * c) * jnp.sum(ex * ex * ey * fr, axis=1)
        m12 = (c * c * c) * jnp.sum(ex * ey * ey * fr, axis=1)
        m22 = (c * c * c * c) * jnp.sum(ex * ex * ey * ey * fr, axis=1)

    T = m20 + m02
    N = m20 - m02
    PI = m11

    r = rho[:, 0]  # [B, *res]
    zeros = jnp.zeros_like(r)

    s0 = r * (1.0 - T)
    s1 = 0.25 * r * T
    s2 = 0.25 * r * T
    s3 = 0.25 * r * T
    s4 = 0.25 * r * T
    s5 = 0.25 * r * PI
    s6 = -0.25 * r * PI
    s7 = 0.25 * r * PI
    s8 = -0.25 * r * PI

    if KBCType.is_KBC_AC(kbc_type):
        s1 = s1 + 0.25 * r * N
        s3 = s3 + 0.25 * r * N
        s2 = s2 - 0.25 * r * N
        s4 = s4 - 0.25 * r * N

    if not KBCType.is_KBC(kbc_type):
        A = m22
        Qxxy = m21
        Qxyy = m12
        ux = vel[:, 0]
        uy = vel[:, 1]
        s0 = s0 + r * A
        s1 = s1 + 0.5 * r * ((ux - Qxyy) - A)
        s3 = s3 + 0.5 * r * (-(ux - Qxyy) - A)
        s2 = s2 + 0.5 * r * ((uy - Qxxy) - A)
        s4 = s4 + 0.5 * r * (-(uy - Qxxy) - A)
        s5 = s5 + 0.25 * r * (A + Qxyy + Qxxy)
        s6 = s6 + 0.25 * r * (A - Qxyy + Qxxy)
        s7 = s7 + 0.25 * r * (A - Qxyy - Qxxy)
        s8 = s8 + 0.25 * r * (A + Qxyy - Qxxy)

    del zeros
    return jnp.stack([s0, s1, s2, s3, s4, s5, s6, s7, s8], axis=1)


def _entropic_relax(
    lat: Lattice,
    f: jnp.ndarray,
    feq_val: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    kbc_type: int | None,
    tau: float,
    *,
    dx: float,
    dt: float,
) -> jnp.ndarray:
    """Shared entropic-stabilizer update: f + beta(-2 ds - gamma dh).

    Conscious fix over the reference (LBM_collision_MRT_2d.py:219-222 /
    LBM_collision_HCZ_2d.py:253-255): the gamma estimator is a ratio of two
    tiny contractions and is ill-conditioned near equilibrium — where
    f == feq exactly it divides 0/0 (the reference demo_2d_wave.py produces
    NaN in g at step 0 from this), and where dh is float-noise-dominated
    the ratio is garbage that destabilizes quiescent regions (SURVEY.md §7
    flagged this fp32 sensitivity).  gamma = 2 makes the KBC update
    algebraically identical to LBGK (beta(-2ds - 2dh) = -(f - feq)/tau), so
    ill-conditioned cells fall back to plain relaxation; well-resolved
    cells are bit-identical to the reference formula.
    """
    ds = kbc_moment_split(lat, f, rho, vel, kbc_type, dx=dx, dt=dt) - kbc_moment_split(
        lat, feq_val, rho, vel, kbc_type, dx=dx, dt=dt
    )
    dh = (f - feq_val) - ds
    beta = 0.5 / tau
    num = jnp.sum(ds * dh / feq_val, axis=1, keepdims=True)
    den = jnp.sum(dh * dh / feq_val, axis=1, keepdims=True)
    # den ~ (relative deviation)^2 * sum(feq): below ~1e-5 relative the
    # f32 estimator is noise; use the LBGK-equivalent gamma there
    scale = jnp.sum(feq_val, axis=1, keepdims=True)
    ill = den <= 1e-10 * jnp.abs(scale)
    gamma = jnp.where(
        ill,
        2.0,
        1.0 / beta - (2.0 - 1.0 / beta) * num / jnp.where(ill, 1.0, den),
    )
    return f + beta * (-2.0 * ds - gamma * dh)


def kbc_collide(
    lat: Lattice,
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    force: jnp.ndarray | None,
    *,
    tau: float,
    kbc_type: int | None,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Entropic KBC collision (reference: LBM_collision_MRT_2d.py:184-226)."""
    feq_val = feq(lat, rho, vel, dx=dx, dt=dt, tau=tau, force=force)
    out = _entropic_relax(lat, f, feq_val, rho, vel, kbc_type, tau, dx=dx, dt=dt)
    return jnp.where(flags == int(CellType.OBSTACLE), f, out).astype(f.dtype)


# ----------------------------------------------------------------------
# Shan-Chen pseudopotential (D2Q9, as in the reference)
# ----------------------------------------------------------------------
def sc_force(
    lat: Lattice,
    density: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    density_wall: float,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Shan-Chen interaction force from the CS-EOS pseudopotential.

    F = -G1 psi(x) c Σ_q w_q e_q psi(x + e_q), with wall psi substituted on
    OBSTACLE cells and zero padding outside the domain
    (reference: LBM_collision_SC_2d.py:22-97).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    a = 12.0 * cs2
    b = 4.0
    G1 = -1.0 / 3.0

    def _psi(dens):
        eta = dens * b / 4.0
        p = RT * (1.0 + (4.0 * eta - 2.0 * eta * eta) / (1.0 - eta) ** 3) - a * dens - cs2
        return jnp.sqrt(2.0 * dens * p / G1 / cs2)

    psx = _psi(density)
    eta_w = density_wall * b / 4.0
    p_w = (
        RT * (1.0 + (4.0 * eta_w - 2.0 * eta_w * eta_w) / (1.0 - eta_w) ** 3)
        - a * density_wall
        - cs2
    )
    psx_wall = math.sqrt(2.0 * density_wall * p_w / G1 / cs2)

    psx_eff = jnp.where(flags == int(CellType.OBSTACLE), psx_wall, psx)
    dim = lat.dim
    pad = [(0, 0)] * (psx_eff.ndim - dim) + [(1, 1)] * dim
    psx_pad = jnp.pad(psx_eff, pad)  # zero pad, as the reference

    # neighbor value along +e_q for q >= 1
    comps = []
    for d in range(dim):
        acc = None
        for q in range(1, lat.q):
            off = tuple(int(v) for v in lat.e[q][::-1])  # (y, x) / (z, y, x)
            idx = [slice(None)] * (psx_pad.ndim - dim) + [
                slice(1 + o, None if o == 1 else -1 + o) for o in off
            ]
            term = float(lat.weights[q] * lat.e[q, d]) * psx_pad[tuple(idx)]
            acc = term if acc is None else acc + term
        comps.append(acc)
    neigh = jnp.concatenate(comps, axis=1)  # [B, dim, *res]

    force = -G1 * psx * c * neigh
    return jnp.where(flags == int(CellType.FLUID), force, jnp.zeros_like(force))


def sc_collide(
    lat: Lattice,
    f: jnp.ndarray,
    rho: jnp.ndarray,
    density: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    *,
    tau: float,
    density_wall: float,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """Shan-Chen collision: interaction force, then BGK with velocity-shift forcing."""
    force = sc_force(lat, density, flags, density_wall=density_wall, dx=dx, dt=dt)
    f_new = bgk_collide(lat, f, rho, vel, flags, force, tau=tau, dx=dx, dt=dt)
    return f_new, force


# ----------------------------------------------------------------------
# He-Chen-Zhang two-distribution multiphase
# ----------------------------------------------------------------------
def smooth_phi(phi: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Smeared Heaviside of the order parameter (reference: HCZ_2d.py:175-179)."""
    ramp = 0.5 + (0.5 / eps) * phi + (0.5 / np.pi) * jnp.sin((np.pi / eps) * phi)
    return (phi > eps) * 1.0 + (jnp.abs(phi) <= eps) * ramp


def contact_angle_boundary(
    rho: jnp.ndarray,
    flags: jnp.ndarray,
    contact_angle: float,
    dim: int,
    spmd: bool = True,
) -> jnp.ndarray:
    """Rewrite the boundary ring of rho to impose the wetting contact angle.

    Functional translation of the reference's sequential in-place surgery —
    faces, then edges, then corners, each step reading the already-updated
    field exactly as the torch code does (HCZ_2d.py:83-121, HCZ_3d.py:84-211,
    including the 2D corner quirk at :121 that averages rho[-2,-2] twice).

    The ``optimization_barrier`` calls between update groups are required for
    SPMD correctness: XLA's GSPMD partitioner miscompiles two directly-chained
    scatters whose integer indices land on *different sharded axes* (updates
    get applied at shard-local instead of global offsets).  ``spmd=False``
    (single-device callers) drops them: on one chip they are semantically
    free but they block XLA's in-place dynamic-update-slice chaining, which
    costs ~0.35 ms/step of whole-volume copies at 128x256^2.
    """
    t = math.tan(math.pi / 2.0 - contact_angle)
    OBS = int(CellType.OBSTACLE)
    barrier = jax.lax.optimization_barrier if spmd else (lambda x: x)

    if dim == 2:
        # faces
        hlp = jnp.abs(rho[..., 2:, 1] - rho[..., :-2, 1])
        rho = rho.at[..., 1:-1, 0].set(
            jnp.where(
                flags[..., 1:-1, 0] == OBS, rho[..., 1:-1, 2] + t * hlp, rho[..., 1:-1, 0]
            )
        )
        hlp = jnp.abs(rho[..., 2:, -2] - rho[..., :-2, -2])
        rho = rho.at[..., 1:-1, -1].set(
            jnp.where(
                flags[..., 1:-1, -1] == OBS,
                rho[..., 1:-1, -3] + t * hlp,
                rho[..., 1:-1, -1],
            )
        )
        rho = barrier(rho)
        hlp = jnp.abs(rho[..., 1, 2:] - rho[..., 1, :-2])
        rho = rho.at[..., 0, 1:-1].set(
            jnp.where(
                flags[..., 0, 1:-1] == OBS, rho[..., 2, 1:-1] + t * hlp, rho[..., 0, 1:-1]
            )
        )
        hlp = jnp.abs(rho[..., -2, 2:] - rho[..., -2, :-2])
        rho = rho.at[..., -1, 1:-1].set(
            jnp.where(
                flags[..., -1, 1:-1] == OBS,
                rho[..., -3, 1:-1] + t * hlp,
                rho[..., -1, 1:-1],
            )
        )
        # corners (sequential, reading updated faces; last one reproduces the
        # reference quirk of averaging rho[..., -2, -2] with itself)
        rho = barrier(rho)
        rho = rho.at[..., 0, 0].set(0.5 * (rho[..., 1, 0] + rho[..., 0, 1]))
        rho = rho.at[..., -1, 0].set(0.5 * (rho[..., -2, 0] + rho[..., -1, 1]))
        rho = rho.at[..., 0, -1].set(0.5 * (rho[..., 0, -2] + rho[..., 1, -1]))
        rho = rho.at[..., -1, -1].set(0.5 * (rho[..., -2, -2] + rho[..., -2, -2]))
        return rho

    # ------------------------------------------------------------------
    # 3D: 6 faces (z faces are plain copies), 12 edge lines, 8 corners
    # ------------------------------------------------------------------
    eps = 1e-6

    def _face_hlp(a, b, c_, d):
        return jnp.sqrt(eps + (a - b) ** 2 + (c_ - d) ** 2)

    # 1. neg x
    hlp = _face_hlp(
        rho[..., 2:, 1:-1, 1], rho[..., :-2, 1:-1, 1],
        rho[..., 1:-1, 2:, 1], rho[..., 1:-1, :-2, 1],
    )
    rho = rho.at[..., 1:-1, 1:-1, 0].set(
        jnp.where(
            flags[..., 1:-1, 1:-1, 0] == OBS,
            rho[..., 1:-1, 1:-1, 2] + t * hlp,
            rho[..., 1:-1, 1:-1, 0],
        )
    )
    # 2. pos x
    hlp = _face_hlp(
        rho[..., 2:, 1:-1, -2], rho[..., :-2, 1:-1, -2],
        rho[..., 1:-1, 2:, -2], rho[..., 1:-1, :-2, -2],
    )
    rho = rho.at[..., 1:-1, 1:-1, -1].set(
        jnp.where(
            flags[..., 1:-1, 1:-1, -1] == OBS,
            rho[..., 1:-1, 1:-1, -3] + t * hlp,
            rho[..., 1:-1, 1:-1, -1],
        )
    )
    rho = barrier(rho)
    # 3. neg y
    hlp = _face_hlp(
        rho[..., 2:, 1, 1:-1], rho[..., :-2, 1, 1:-1],
        rho[..., 1:-1, 1, 2:], rho[..., 1:-1, 1, :-2],
    )
    rho = rho.at[..., 1:-1, 0, 1:-1].set(
        jnp.where(
            flags[..., 1:-1, 0, 1:-1] == OBS,
            rho[..., 1:-1, 2, 1:-1] + t * hlp,
            rho[..., 1:-1, 0, 1:-1],
        )
    )
    # 4. pos y
    hlp = _face_hlp(
        rho[..., 2:, -2, 1:-1], rho[..., :-2, -2, 1:-1],
        rho[..., 1:-1, -2, 2:], rho[..., 1:-1, -2, :-2],
    )
    rho = rho.at[..., 1:-1, -1, 1:-1].set(
        jnp.where(
            flags[..., 1:-1, -1, 1:-1] == OBS,
            rho[..., 1:-1, -3, 1:-1] + t * hlp,
            rho[..., 1:-1, -1, 1:-1],
        )
    )
    # 5./6. z faces: plain interior copies where OBSTACLE (the reference
    # computes hlp but does not apply it, HCZ_3d.py:143-168)
    rho = barrier(rho)
    rho = rho.at[..., 0, 1:-1, 1:-1].set(
        jnp.where(
            flags[..., 0, 1:-1, 1:-1] == OBS,
            rho[..., 2, 1:-1, 1:-1],
            rho[..., 0, 1:-1, 1:-1],
        )
    )
    rho = rho.at[..., -1, 1:-1, 1:-1].set(
        jnp.where(
            flags[..., -1, 1:-1, 1:-1] == OBS,
            rho[..., -3, 1:-1, 1:-1],
            rho[..., -1, 1:-1, 1:-1],
        )
    )

    # 7. edge lines (12), order as the reference (HCZ_3d.py:170-184)
    rho = barrier(rho)
    rho = rho.at[..., 1:-1, 0, 0].set(0.5 * (rho[..., 1:-1, 0, 1] + rho[..., 1:-1, 1, 0]))
    rho = rho.at[..., 1:-1, 0, -1].set(0.5 * (rho[..., 1:-1, 0, -2] + rho[..., 1:-1, 1, -1]))
    rho = rho.at[..., 1:-1, -1, 0].set(0.5 * (rho[..., 1:-1, -1, 1] + rho[..., 1:-1, -2, 0]))
    rho = rho.at[..., 1:-1, -1, -1].set(0.5 * (rho[..., 1:-1, -1, -2] + rho[..., 1:-1, -2, -1]))

    rho = barrier(rho)
    rho = rho.at[..., 0, 1:-1, 0].set(0.5 * (rho[..., 0, 1:-1, 1] + rho[..., 1, 1:-1, 0]))
    rho = rho.at[..., 0, 1:-1, -1].set(0.5 * (rho[..., 0, 1:-1, -2] + rho[..., 1, 1:-1, -1]))
    rho = rho.at[..., -1, 1:-1, 0].set(0.5 * (rho[..., -1, 1:-1, 1] + rho[..., -2, 1:-1, 0]))
    rho = rho.at[..., -1, 1:-1, -1].set(0.5 * (rho[..., -1, 1:-1, -2] + rho[..., -2, 1:-1, -1]))

    rho = barrier(rho)
    rho = rho.at[..., 0, 0, 1:-1].set(0.5 * (rho[..., 0, 1, 1:-1] + rho[..., 1, 0, 1:-1]))
    rho = rho.at[..., 0, -1, 1:-1].set(0.5 * (rho[..., 0, -2, 1:-1] + rho[..., 1, -1, 1:-1]))
    rho = rho.at[..., -1, 0, 1:-1].set(0.5 * (rho[..., -1, 1, 1:-1] + rho[..., -2, 0, 1:-1]))
    rho = rho.at[..., -1, -1, 1:-1].set(0.5 * (rho[..., -1, -2, 1:-1] + rho[..., -2, -1, 1:-1]))

    # 8. corners (8) (HCZ_3d.py:186-211)
    rho = barrier(rho)
    rho = rho.at[..., 0, 0, 0].set(
        (rho[..., 0, 0, 1] + rho[..., 0, 1, 0] + rho[..., 1, 0, 0]) / 3.0
    )
    rho = rho.at[..., 0, 0, -1].set(
        (rho[..., 0, 0, -2] + rho[..., 0, 1, -1] + rho[..., 1, 0, -1]) / 3.0
    )
    rho = rho.at[..., 0, -1, 0].set(
        (rho[..., 0, -1, 1] + rho[..., 0, -2, 0] + rho[..., 1, -1, 0]) / 3.0
    )
    rho = rho.at[..., 0, -1, -1].set(
        (rho[..., 0, -1, -2] + rho[..., 0, -2, -1] + rho[..., 1, -1, -1]) / 3.0
    )
    rho = rho.at[..., -1, 0, 0].set(
        (rho[..., -1, 0, 1] + rho[..., -1, 1, 0] + rho[..., -2, 0, 0]) / 3.0
    )
    rho = rho.at[..., -1, 0, -1].set(
        (rho[..., -1, 0, -2] + rho[..., -1, 1, -1] + rho[..., -2, 0, -1]) / 3.0
    )
    rho = rho.at[..., -1, -1, 0].set(
        (rho[..., -1, -1, 1] + rho[..., -1, -2, 0] + rho[..., -2, -1, 0]) / 3.0
    )
    rho = rho.at[..., -1, -1, -1].set(
        (rho[..., -1, -1, -2] + rho[..., -1, -2, -1] + rho[..., -2, -1, -1]) / 3.0
    )
    return rho


def hcz_capillary(
    lat: Lattice,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    g: jnp.ndarray,
    density: jnp.ndarray,
    pressure: jnp.ndarray,
    *,
    kappa: float,
    gravity: jnp.ndarray,
    contact_angle: float,
    rho_gas: float,
    rho_fluid: float,
    density_gas: float,
    density_fluid: float,
    dx: float = 1.0,
    dt: float = 1.0,
    H2: jnp.ndarray | None = None,
    phi: jnp.ndarray | None = None,
    g_sum: jnp.ndarray | None = None,
    g_mom: jnp.ndarray | None = None,
    use_pallas: bool = True,
    mesh=None,
    gravity_static: tuple | None = None,
):
    """HCZ capillary step: wetting BC, surface-tension/gravity/Kelvin forces,
    EOS potentials and macro recovery from g.

    ``g_sum``/``g_mom`` optionally supply precomputed Σ_q g_q and Σ_q g_q e_q
    (the fused streaming kernel emits them), avoiding a re-reduction over g.

    Returns (rho, vel, density, pressure, force, dfai, dprho), matching the
    reference's capillary_process (HCZ_2d.py:21-173, HCZ_3d.py:21-263).
    """
    dim = lat.dim
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2

    def _rep_pad_interior(x):
        idx = [slice(None)] * (x.ndim - dim) + [slice(1, -1)] * dim
        pad = [(0, 0)] * (x.ndim - dim) + [(1, 1)] * dim
        return jnp.pad(x[tuple(idx)], pad, mode="edge")

    rho_pre, density_pre = rho, density  # pre-contact-angle (fai/prho basis)
    prho = _rep_pad_interior(pressure - RT * density)
    fai = _rep_pad_interior(eos_pressure(rho, dx=dx, dt=dt) - rho * RT)

    # contact angle: the ring-pipelined kernel twin where it applies (the
    # jnp x-face dynamic-update-slices are whole-tile RMW on TPU layout,
    # ~0.55 ms/step at 128x256^2) — single-device 3D with a concrete angle.
    # Guards: f32 only (the kernel computes and returns f32; a wider rho —
    # the f64 golden-parity runs — must keep the dtype-preserving jnp
    # chain), and on TPU a single visible device (GSPMD-auto shards arrays
    # without a mesh argument; a plain pallas_call must not see them).
    import os as _os

    from .pallas import force_fastpath

    _force_fast = force_fastpath()
    _ca_static = None
    if use_pallas and dim == 3 and rho.dtype == jnp.float32 and (
        mesh is not None
        or (jax.default_backend() == "tpu" and len(jax.devices()) == 1)
        or _force_fast
    ) and not _os.environ.get("LBM_DISABLE_PALLAS"):
        try:
            _ca_static = float(np.asarray(contact_angle).reshape(()))
        except Exception:
            _ca_static = None  # traced angle: keep the jnp chain
    from .pallas.contact3d import contact_angle_3d, contact_angle_3d_supported

    if (
        _ca_static is not None
        and mesh is None
        and contact_angle_3d_supported(rho.shape)
    ):
        rho = contact_angle_3d(
            rho, flags, _ca_static, interpret=_force_fast
        )
    else:
        _ca_done = False
        if _ca_static is not None and mesh is not None:
            # slab twin under shard_map (1 rho ghost plane per side)
            from ..parallel.step3d import (
                contact3d_sharded,
                contact3d_sharded_ok,
                default_interpret,
            )

            _interp = default_interpret()
            if contact3d_sharded_ok(mesh, rho.shape, rho.dtype, _interp):
                rho = contact3d_sharded(
                    rho, flags, _ca_static, mesh, interpret=_interp
                )
                _ca_done = True
        if not _ca_done:
            # the GSPMD-auto path shards arrays without a mesh argument,
            # so only a provably single-device process may drop the
            # scatter barriers
            rho = contact_angle_boundary(
                rho, flags, contact_angle, dim,
                spmd=mesh is not None or len(jax.devices()) > 1,
            )
    density = rho_to_density(
        rho,
        rho_gas=rho_gas,
        rho_fluid=rho_fluid,
        density_gas=density_gas,
        density_fluid=density_fluid,
    )

    import os

    from .pallas.stencil3d import grad_fields, laplacian_field, stencil3d_supported

    pallas_on = (
        use_pallas and dim == 3 and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    sharded = False
    if pallas_on and mesh is not None:
        from ..parallel.step3d import (
            default_interpret,
            grad_fields_sharded,
            laplacian_field_sharded,
            sharded3d_ok,
        )

        interp = default_interpret()
        sharded = sharded3d_ok(mesh, density.shape, interp)
        if sharded:
            laplacian_field = functools.partial(
                laplacian_field_sharded, mesh=mesh, interpret=interp
            )
            grad_fields = functools.partial(
                grad_fields_sharded, mesh=mesh, interpret=interp
            )
    fuse_stencils = sharded or (
        pallas_on
        and mesh is None
        and stencil3d_supported(density.shape)
        and jax.default_backend() == "tpu"
    )
    # Fully fused single-device path: gradients of all stencil fields +
    # force assembly + vel/pressure recovery in ONE ring-pipelined pass
    # (the gradients never hit HBM) — requires the precomputed g moments
    # and a statically-known gravity vector.
    if (
        fuse_stencils
        and g_sum is not None and g_mom is not None
        and (H2 is None) == (phi is None)
    ):
        from .pallas.capmac import capmac_supported, hcz_capillary_gradmac

        if gravity_static is not None:
            grav = tuple(float(gc) for gc in gravity_static)
        else:
            # inside jit `gravity` is a tracer (jnp.asarray constants are
            # traced); only concrete arrays can gate the fused kernel
            try:
                grav = tuple(
                    float(gc) for gc in np.asarray(gravity).reshape(-1)
                )
            except Exception:
                grav = None
        kw = dict(
            kappa=float(kappa), mu0_half=0.5 * MU0, rho_gas=float(rho_gas),
            rho_fluid=float(rho_fluid), density_gas=float(density_gas),
            density_fluid=float(density_fluid), dx=float(dx), dt=float(dt),
        )
        if grav is not None and len(grav) == 3 and sharded:
            from ..parallel.step3d import capmac_sharded, capmac_sharded_ok

            if capmac_sharded_ok(mesh, density.shape, interp):
                lap_density = laplacian_field(density, dx=dx)
                vel, pressure, force, dfai, dprho = capmac_sharded(
                    lap_density, rho_pre, density_pre, pressure, rho,
                    H2, phi, flags, g_sum, g_mom, vel, mesh,
                    gravity=grav, interpret=interp, **kw,
                )
                return rho, vel, density, pressure, force, dfai, dprho
        elif (grav is not None and len(grav) == 3
              and capmac_supported(density.shape)):
            # lap=None: the Laplacian of density(rho_ca) is computed
            # inside the gradmac kernel — no separate pass, no volume
            # round-trip
            vel, pressure, force, dfai, dprho = hcz_capillary_gradmac(
                None, rho_pre, density_pre, pressure, rho,
                H2, phi, flags, g_sum, g_mom, vel, gravity=grav, **kw,
            )
            return rho, vel, density, pressure, force, dfai, dprho

    if fuse_stencils:
        # one Pallas pass for the Laplacian, one for all gradients
        lap_density = laplacian_field(density, dx=dx)

        def _sub(x):  # OBSTACLE-cell substitution, as isotropic_grad does
            return jnp.where(flags == int(CellType.OBSTACLE), _rep_pad_interior(x), x)

        stack = [_sub(lap_density), _sub(fai), _sub(prho)]
        if H2 is not None:
            chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * dx))
            stack.append(_sub(chi))
        grads = grad_fields(jnp.concatenate(stack, axis=1), dx=dx)
        force = kappa * density * grads[:, 0:3] + gravity * density
        if H2 is not None:
            force = force - 0.5 * MU0 * H2 * grads[:, 9:12]
        dfai = grads[:, 3:6]
        dprho = grads[:, 6:9]
    else:
        lap_density = isotropic_laplacian(density, dx, dim)
        force = kappa * density * isotropic_grad(lap_density, dx, flags, dim)
        force = force + gravity * density
        if H2 is not None:
            chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * dx))
            force = force - 0.5 * MU0 * H2 * isotropic_grad(chi, dx, flags, dim)

        dfai = isotropic_grad(fai, dx, flags, dim)
        dprho = isotropic_grad(prho, dx, flags, dim)

    if g_mom is None:
        # first moment of g per dimension (no [B, Q, dim, *res] intermediate)
        gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
        moments = []
        for d in range(dim):
            ed = jnp.asarray(
                lat.e[:, d].reshape(1, lat.q, *([1] * dim)).astype(np.float64),
                dtype=gf.dtype,
            )
            moments.append(jnp.sum(gf * ed, axis=1, keepdims=True))
        g_mom = jnp.concatenate(moments, axis=1)
    macro_vel = (g_mom * c + 0.5 * dt * RT * force) / RT / density
    is_fluid = flags == int(CellType.FLUID)
    vel = jnp.where(is_fluid, macro_vel, vel)

    if g_sum is None:
        g_sum = jnp.sum(
            g.astype(jnp.promote_types(g.dtype, jnp.float32)), axis=1,
            keepdims=True,
        )
    macro_pressure = g_sum - 0.5 * dt * jnp.sum(
        vel * dprho, axis=1, keepdims=True
    )
    pressure = jnp.where(is_fluid, macro_pressure, pressure)

    return rho, vel, density, pressure, force, dfai, dprho


def hcz_collide(
    lat: Lattice,
    f: jnp.ndarray,
    g: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    density: jnp.ndarray,
    pressure: jnp.ndarray,
    flags: jnp.ndarray,
    force: jnp.ndarray,
    dfai: jnp.ndarray,
    dprho: jnp.ndarray,
    *,
    tau_f: float,
    tau_g: float,
    kbc_type: int | None = None,
    dx: float = 1.0,
    dt: float = 1.0,
    use_pallas: bool = True,
    mesh=None,
):
    """HCZ two-distribution collision with Guo-style forcing on f and g.

    With kbc_type set (2D only, as in the reference), g relaxes through the
    entropic stabilizer instead of plain BGK (HCZ_2d.py:244-256).
    Updates apply on FLUID cells only (HCZ_2d.py:282-284).
    """
    import os

    from .pallas.hcz3d import hcz3d_supported, hcz_collide_fused

    pallas_on = (
        use_pallas and lat.dim == 3 and lat.q == 19 and kbc_type is None
        and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    if pallas_on and mesh is not None:
        from ..parallel.step3d import (
            default_interpret, hcz_collide_sharded, sharded3d_ok,
        )

        interp = default_interpret()
        if sharded3d_ok(mesh, f.shape, interp):
            return hcz_collide_sharded(
                f, g, rho, vel, density, pressure, flags, force, dfai, dprho,
                mesh, tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt, interpret=interp,
            )
    elif (
        pallas_on
        and hcz3d_supported(lat, f.shape, kbc_type)
        and jax.default_backend() == "tpu"
    ):
        return hcz_collide_fused(
            f, g, rho, vel, density, pressure, flags, force, dfai, dprho,
            tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt,
        )

    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2

    feq_val = feq(lat, rho, vel, dx=dx, dt=dt)
    geq_val = geq(lat, rho, density, vel, pressure, dx=dx, dt=dt, feq_val=feq_val)
    Gamma = gamma_quadratic(lat, vel, dx=dx, dt=dt)

    w = jnp.asarray(
        lat.w_bcast(np.float64), dtype=jnp.promote_types(f.dtype, jnp.float32)
    )

    # forcing inner products Σ_d (e_qd c - u_d) v_d, accumulated per dimension
    # to avoid materializing [B, Q, dim, *res] intermediates (3x the traffic
    # of the distributions themselves at D3Q19)
    def rel_dot(vec):
        acc = None
        for d in range(lat.dim):
            ed = jnp.asarray(
                lat.e[:, d].reshape(1, lat.q, *([1] * lat.dim)).astype(np.float64),
                dtype=jnp.promote_types(f.dtype, jnp.float32),
            )
            term = (ed * c - vel[:, d : d + 1]) * vec[:, d : d + 1]
            acc = term if acc is None else acc + term
        return acc

    if kbc_type is not None and KBCType.is_KBC(kbc_type):
        collision_g = _entropic_relax(
            lat, g, geq_val, rho, vel, kbc_type, tau_g, dx=dx, dt=dt
        )
    else:
        collision_g = g + (geq_val - g) / tau_g

    collision_f = (
        f
        + (feq_val - f) / tau_f
        + dt * (1.0 - 0.5 / tau_f) * Gamma / RT * rel_dot(-dfai) * dt
    )

    collision_g = collision_g + (
        (1.0 - 0.5 / tau_g)
        * (Gamma * rel_dot(force) + (Gamma - w) * rel_dot(-dprho))
        * dt
    )

    is_fluid = flags == int(CellType.FLUID)
    # storage dtype preserved (bf16 turbo mode computes in f32 via promotion)
    f_new = jnp.where(is_fluid, collision_f, f).astype(f.dtype)
    g_new = jnp.where(is_fluid, collision_g, g).astype(g.dtype)
    return f_new, g_new
