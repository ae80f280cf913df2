"""Scene builders replicating every reference demo's initial conditions.

Each builder returns ``(params, state)`` ready for the matching step
function.  Geometry, boundary flags, and physics constants are taken
verbatim from the reference drivers (file:line cited per scene), so running
N steps from a scene reproduces the reference field-for-field.

Resolution convention matches the reference argparse ``--res``: 2D scenes
take ``(H, W) = (y, x)``, 3D scenes ``(D, H, W) = (z, y, x)``.
"""

from __future__ import annotations

import math

import numpy as np

from ..utils.types import CellType, KBCType
from .ferrofluid import init_ferrofluid_state
from .multiphase import init_hcz_state, init_sc_state
from .params import SimulationParams
from .singlephase import init_state as init_singlephase_state

__all__ = [
    "shear_layer",
    "wave",
    "multiphase_drop_sc",
    "multiphase_drop_hcz",
    "droplet_spread_2d",
    "two_droplets_2d",
    "rosensweig_2d",
    "multiphase_3d",
    "droplet_spread_3d",
    "two_droplets_3d",
    "rosensweig_3d",
    "rosensweig_3d_tpu",
    "phys_view",
]

# the multiphase demos share one fluid (reference: demo_*_HCZ.py headers)
_MP = dict(
    density_gas=0.02381,
    density_fluid=0.2508,
    rho_gas=0.02381,
    rho_fluid=0.2508,
)
_WALL_RHO = 0.2508
_WALL_DEN = 0.2508


def _obstacle_frame(res, batch=1):
    """All-FLUID domain wrapped in a 1-cell OBSTACLE frame."""
    flags = np.full((batch, 1, *res), int(CellType.OBSTACLE), np.uint8)
    inner = (Ellipsis,) + tuple(slice(1, -1) for _ in res)
    flags[inner] = int(CellType.FLUID)
    return flags


def _apply_wall(rho, density, flags):
    obs = flags == int(CellType.OBSTACLE)
    rho[obs] = _WALL_RHO
    density[obs] = _WALL_DEN
    return rho, density


# ----------------------------------------------------------------------
# single phase
# ----------------------------------------------------------------------
def shear_layer(res=(130, 130), *, kbc: bool = False, vmax=0.2, re=3000.0,
                sigma=0.05, kappa_pert=80.0, batch=1):
    """Double shear layer + sinusoidal perturbation (demo_2d_LBM.py:80-99)."""
    tau = SimulationParams.tau_from_reynolds(re, vmax, max(res))
    params = SimulationParams(
        dim=2, tau=tau, kbc_type=int(KBCType.KBC_A) if kbc else None
    )
    H, W = res
    flags = np.full((batch, 1, H, W), int(CellType.FLUID), np.uint8)
    rho = np.full((batch, 1, H, W), 0.265, np.float32)
    j = np.arange(H)[:, None]
    i = np.arange(W)[None, :]
    vel = np.zeros((batch, 2, H, W), np.float32)
    vel[:, 1] = sigma * vmax * np.sin(2.0 * np.pi * (i / W + 0.25))
    vel[:, 0] = np.where(
        j <= H / 2.0,
        vmax * np.tanh(kappa_pert * (j / H - 0.25)),
        vmax * np.tanh(kappa_pert * (-j / H + 0.75)),
    )
    return params, init_singlephase_state(params, rho, vel, flags)


# ----------------------------------------------------------------------
# 2D multiphase
# ----------------------------------------------------------------------
def _box_drop(res, batch=1):
    """Square box of fluid in gas (demo_2d_LBM_multiphase_*.py:101-112)."""
    H, W = res
    rho = np.full((batch, 1, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, H, W), _MP["density_gas"], np.float32)
    r = 0.4 * max(res) / 2
    j = np.arange(H)[:, None]
    i = np.arange(W)[None, :]
    box = (np.abs(j - H / 2) <= r) & (np.abs(i - W / 2) <= r)
    rho[:, 0][..., box] = _MP["rho_fluid"]
    den[:, 0][..., box] = _MP["density_fluid"]
    return rho, den


def multiphase_drop_sc(res=(130, 130), batch=1):
    """Shan-Chen square drop (demo_2d_LBM_multiphase_SC.py)."""
    params = SimulationParams(dim=2, tau=1.0, kappa=0.08, tau_f=0.7, tau_g=0.7, **_MP)
    flags = _obstacle_frame(res, batch)
    rho, den = _box_drop(res, batch)
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 2, *res), np.float32)
    return params, init_sc_state(params, rho, den, vel, flags)


def multiphase_drop_hcz(res=(130, 130), batch=1):
    """HCZ square drop (demo_2d_LBM_multiphase_HCZ.py: kappa=0.1, tau 0.7/0.8,
    contact 0.75pi, KBC off)."""
    params = SimulationParams(
        dim=2, kappa=0.1, tau_f=0.7, tau_g=0.8,
        contact_angle=0.75 * math.pi, **_MP,
    )
    flags = _obstacle_frame(res, batch)
    rho, den = _box_drop(res, batch)
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 2, *res), np.float32)
    return params, init_hcz_state(params, rho, den, vel, flags)


def wave(res=(130, 130), vel_max=0.2, batch=1):
    """Half-full pool with a velocity-forced inflow column
    (demo_2d_wave.py:96-141): KBC_A on g, contact 0.55pi, kappa=0.01."""
    params = SimulationParams(
        dim=2, kappa=0.01, tau_f=0.7, tau_g=0.7,
        contact_angle=0.55 * math.pi, kbc_type=int(KBCType.KBC_A), **_MP,
    )
    H, W = res
    flags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, H, W), _MP["density_gas"], np.float32)
    rho[..., : H // 2, :] = _MP["rho_fluid"]
    den[..., : H // 2, :] = _MP["density_fluid"]
    vel = np.zeros((batch, 2, H, W), np.float32)
    vel[:, 0, :, 0] = vel_max
    pin_mask = np.zeros((batch, 2, H, W), bool)
    pin_mask[:, 0, :, 0] = True
    pin_value = np.zeros((batch, 2, H, W), np.float32)
    pin_value[:, 0, :, 0] = vel_max
    import jax.numpy as jnp

    return params, init_hcz_state(
        params, rho, den, vel, flags,
        vel_pin_mask=jnp.asarray(pin_mask), vel_pin_value=jnp.asarray(pin_value),
    )


def droplet_spread_2d(res=(130, 130), gravity=1e-5, batch=1):
    """Half-disc on the floor, wetting contact angle 0.75pi + gravity + KBC_A
    (demo_2d_LBM_droplet_spread.py:100-114)."""
    params = SimulationParams(
        dim=2, kappa=0.1, tau_f=0.7, tau_g=0.8, gravity=gravity,
        contact_angle=0.75 * math.pi, kbc_type=int(KBCType.KBC_A), **_MP,
    )
    H, W = res
    flags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, H, W), _MP["density_gas"], np.float32)
    r = 0.6 * max(res) / 2
    j = np.arange(H)[:, None]
    i = np.arange(W)[None, :]
    disc = j * j + (i - W / 2) ** 2 <= r * r
    rho[:, 0][..., disc] = _MP["rho_fluid"]
    den[:, 0][..., disc] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 2, H, W), np.float32)
    return params, init_hcz_state(params, rho, den, vel, flags)


# ----------------------------------------------------------------------
# 2D ferrofluid
# ----------------------------------------------------------------------
def two_droplets_2d(res=(98, 384), mag_strength=100.0, gravity=0.0, batch=1):
    """Two discs side by side under a vertical field
    (demo_2d_LBM_two_droplets.py:101-134)."""
    params = SimulationParams(
        dim=2, kappa=0.5, tau_f=0.68, tau_g=0.68, gravity=gravity,
        contact_angle=0.5 * math.pi, mag_strength=mag_strength,
        poisson_iters=30, **_MP,
    )
    H, W = res
    flags = _obstacle_frame(res, batch)
    mflags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, H, W), _MP["density_gas"], np.float32)
    radius = min(res) // 4
    j = np.arange(H)[:, None]
    i = np.arange(W)[None, :]
    for cy, cx in [(H // 2, 3 * W // 8), (H // 2, 5 * W // 8)]:
        disc = (j - cy) ** 2 + (i - cx) ** 2 <= radius * radius
        rho[:, 0][..., disc] = _MP["rho_fluid"]
        den[:, 0][..., disc] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 2, H, W), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)


def rosensweig_2d(res=(130, 130), mag_strength=100.0, gravity=1e-4, batch=1):
    """2D Rosensweig: 45%-full pool, magnetic walls open along y, KBC_A on g
    (demo_2d_LBM_Rosensweig_instability.py:94-112)."""
    params = SimulationParams(
        dim=2, kappa=0.01, tau_f=0.7, tau_g=0.8, gravity=gravity,
        contact_angle=0.75 * math.pi, mag_strength=mag_strength,
        poisson_iters=30, kbc_type=int(KBCType.KBC_A), **_MP,
    )
    H, W = res
    flags = _obstacle_frame(res, batch)
    mflags = np.full((batch, 1, H, W), int(CellType.OBSTACLE), np.uint8)
    mflags[..., :, 1:-1] = int(CellType.FLUID)  # open along y
    rho = np.full((batch, 1, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, H, W), _MP["density_gas"], np.float32)
    rho[..., : int(0.45 * H), :] = _MP["rho_fluid"]
    den[..., : int(0.45 * H), :] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 2, H, W), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)


# ----------------------------------------------------------------------
# 3D
# ----------------------------------------------------------------------
def multiphase_3d(res=(130, 130, 130), batch=1):
    """Centered cube of fluid (demo_3d_LBM_multiphase.py:101-131)."""
    params = SimulationParams(
        dim=3, kappa=0.1, tau_f=0.7, tau_g=0.7,
        contact_angle=0.75 * math.pi, **_MP,
    )
    D, H, W = res
    flags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, D, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, D, H, W), _MP["density_gas"], np.float32)
    box = (
        Ellipsis,
        slice(int(D / 4), int(3 * D / 4)),
        slice(int(H / 4), int(3 * H / 4)),
        slice(int(W / 4), int(3 * W / 4)),
    )
    rho[box] = _MP["rho_fluid"]
    den[box] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 3, D, H, W), np.float32)
    return params, init_hcz_state(params, rho, den, vel, flags)


def droplet_spread_3d(res=(130, 130, 130), gravity=1e-5, batch=1):
    """Box of fluid on the floor (demo_3d_LBM_droplet_spread.py:119-135)."""
    params = SimulationParams(
        dim=3, kappa=0.1, tau_f=0.7, tau_g=0.7, gravity=gravity,
        contact_angle=0.75 * math.pi, **_MP,
    )
    D, H, W = res
    flags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, D, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, D, H, W), _MP["density_gas"], np.float32)
    box = (
        Ellipsis,
        slice(int(D / 4), int(3 * D / 4)),
        slice(0, int(H / 2)),
        slice(int(W / 4), int(3 * W / 4)),
    )
    rho[box] = _MP["rho_fluid"]
    den[box] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 3, D, H, W), np.float32)
    return params, init_hcz_state(params, rho, den, vel, flags)


def two_droplets_3d(res=(50, 50, 193), mag_strength=100.0, gravity=0.0, batch=1):
    """Two spheres along x under a vertical field
    (demo_3d_LBM_two_droplets.py:115-152)."""
    params = SimulationParams(
        dim=3, kappa=0.5, tau_f=0.68, tau_g=0.68, gravity=gravity,
        contact_angle=0.5 * math.pi, mag_strength=mag_strength,
        poisson_iters=30, **_MP,
    )
    D, H, W = res
    flags = _obstacle_frame(res, batch)
    mflags = _obstacle_frame(res, batch)
    rho = np.full((batch, 1, D, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, D, H, W), _MP["density_gas"], np.float32)
    radius = min(res) // 4
    r = np.arange(D)[:, None, None]
    j = np.arange(H)[None, :, None]
    i = np.arange(W)[None, None, :]
    for cz, cy, cx in [(D // 2, H // 2, 3 * W // 8), (D // 2, H // 2, 5 * W // 8)]:
        ball = (r - cz) ** 2 + (j - cy) ** 2 + (i - cx) ** 2 <= radius * radius
        rho[:, 0][..., ball] = _MP["rho_fluid"]
        den[:, 0][..., ball] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 3, D, H, W), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)


def _ceil(n, m):
    return ((n + m - 1) // m) * m


def rosensweig_3d_tpu(res=(130, 66, 130), mag_strength=100.0, gravity=1e-4,
                      batch=1):
    """The native-resolution Rosensweig scene in the TRANSPOSED + PADDED
    TPU layout: same physics as :func:`rosensweig_3d` at the reference's
    own demo default (demo_3d_LBM_Rosensweig_instability.py:253), but the
    state arrays reach the fused Pallas fast path.

    Two obstructions keep the plain layout off the fast path at native
    resolution: the lane/sublane alignment (X % 128, Y % 8) and the
    magnetic domain being OPEN (periodic, via the streaming rolls) along
    the field axis y — an axis can only be OBSTACLE-padded if it is
    walled (full-way bounce-back is absorbing: the lag-2 self-reflection
    makes interior physics exactly invariant under wall thickening,
    ops/scalar_poisson.py), so y itself must not be padded.  The fix is a
    layout rotation: map the open physical axis onto the array's z
    (outer) axis, which has NO alignment constraint and which every fused
    kernel already treats periodically (the z-wrap ring reads), and pad
    the two walled axes to alignment:

        physical (z_p, y_p, x_p) = (130, 66, 130), open y_p
        array    (z_a, y_a, x_a) = (y_p, z_p -> 136, x_p -> 256)

    Gravity and H_ext act along array z (gravity_axis=2, h_ext_axis=2);
    ``params.phys_extent = (66, 130, 130)`` marks the physical box so the
    step reproduces the reference's ARRAY-FACE-tied behaviors (contact-
    angle surgery, stencil boundary-ring fixes, magnetic-gradient
    substitution) at the physical seams instead of the padded faces.
    Slice results back with :func:`phys_view`.
    """
    D, H, W = res  # physical (z_p, y_p, x_p), reference argparse order
    Za, Ya, Xa = H, _ceil(D, 8), _ceil(W, 128)
    params = SimulationParams(
        dim=3, kappa=0.01, tau_f=0.68, tau_g=0.68, gravity=gravity,
        gravity_axis=2, contact_angle=0.5 * math.pi,
        mag_strength=mag_strength, h_ext_axis=2, poisson_iters=30,
        phys_extent=(Za, D, W), **_MP,
    )
    # all-OBSTACLE padded arrays; the physical box lives at
    # [..., :Za, :D, :W] with array (z_a, y_a, x_a) = phys (y_p, z_p, x_p)
    flags = np.full((batch, 1, Za, Ya, Xa), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:Za - 1, 1:D - 1, 1:W - 1] = int(CellType.FLUID)
    mflags = np.full((batch, 1, Za, Ya, Xa), int(CellType.OBSTACLE), np.uint8)
    mflags[..., :, 1:D - 1, 1:W - 1] = int(CellType.FLUID)  # open along z_a
    rho = np.full((batch, 1, Za, Ya, Xa), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, Za, Ya, Xa), _MP["density_gas"], np.float32)
    # pool fills the lower half of the physical vertical (y_p = z_a)
    rho[..., : int(0.5 * H), :, :] = _MP["rho_fluid"]
    den[..., : int(0.5 * H), :, :] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 3, Za, Ya, Xa), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)


def phys_view(params, field, vector=False):
    """Physical-orientation view of a padded transposed-state field.

    Slices the physical box out of a ``phys_extent`` array and swaps the
    (z_a, y_a) axes back to the reference's (z_p, y_p, x_p) order; with
    ``vector=True`` the channel components are permuted to physical
    (x, y, z) order (array channel 2 = physical y, channel 1 = physical
    z).  Identity for states without phys_extent."""
    if params.phys_extent is None:
        return field
    pz, py, px = params.phys_extent
    box = field[..., :pz, :py, :px]
    out = box.swapaxes(-3, -2)
    if vector and out.shape[1] == 3:
        out = out[:, (0, 2, 1)]
    return out


def rosensweig_3d(res=(130, 66, 130), mag_strength=100.0, gravity=1e-4, batch=1):
    """North-star scene: pool at y < 0.5, field along y, magnetic domain open
    in y (demo_3d_LBM_Rosensweig_instability.py:115-149)."""
    params = SimulationParams(
        dim=3, kappa=0.01, tau_f=0.68, tau_g=0.68, gravity=gravity,
        contact_angle=0.5 * math.pi, mag_strength=mag_strength,
        poisson_iters=30, mag_flags_shell=True, **_MP,
    )
    D, H, W = res
    flags = _obstacle_frame(res, batch)
    mflags = np.full((batch, 1, D, H, W), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((batch, 1, D, H, W), _MP["rho_gas"], np.float32)
    den = np.full((batch, 1, D, H, W), _MP["density_gas"], np.float32)
    rho[..., : int(0.5 * H), :] = _MP["rho_fluid"]
    den[..., : int(0.5 * H), :] = _MP["density_fluid"]
    _apply_wall(rho, den, flags)
    vel = np.zeros((batch, 3, D, H, W), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)
