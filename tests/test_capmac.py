"""Fused capillary gradients+assembly kernel vs the grad_fields
composition it replaces (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.ops.collide import CHI_K, MU0, smooth_phi
from lbm_ferrofluid_tpu.ops.moments import eos_pressure
from lbm_ferrofluid_tpu.ops.moments import rho_to_density
from lbm_ferrofluid_tpu.ops.pallas.capmac import (
    capmac_supported,
    hcz_capillary_gradmac,
)
from lbm_ferrofluid_tpu.ops.pallas.stencil3d import (
    grad_fields,
    laplacian_field,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas / long-horizon: fast tier skips

RG, RF = 0.02381, 0.2508
DX = DT = 1.0
RT = (DX / DT) ** 2 / 3.0
KAPPA = 0.01
GRAV = (0.0, -1e-4, 0.0)


def _setup():
    Z, Y, X = 8, 8, 128
    rng = np.random.default_rng(3)
    rho_pre = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    density_pre = rho_to_density(
        rho_pre, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    pressure = jnp.asarray(rng.uniform(0.0, 0.05, (1, 1, Z, Y, X)), jnp.float32)
    rho_ca = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    H2 = jnp.asarray(rng.uniform(0.0, 100.0, (1, 1, Z, Y, X)), jnp.float32)
    phi = -(2.0 * (density_pre - RG) / (RF - RG) - 1.0)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    g_sum = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    g_mom = jnp.asarray(rng.uniform(-1e-2, 1e-2, (1, 3, Z, Y, X)), jnp.float32)
    vel_old = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)), jnp.float32)
    return (rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
            g_mom, vel_old)


def _rep_pad_interior(x):
    idx = (Ellipsis,) + (slice(1, -1),) * 3
    pad = [(0, 0)] * 2 + [(1, 1)] * 3
    return jnp.pad(x[idx], pad, mode="edge")


def _reference(rho_pre, density_pre, pressure_old, rho_ca, H2, phi, flags,
               g_sum, g_mom, vel_old, has_h2):
    """The composition the kernel replaces: lap -> _sub/stack ->
    grad_fields -> jnp assembly + recovery (collide.py fuse_stencils)."""
    density_ca = rho_to_density(
        rho_ca, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    prho = _rep_pad_interior(pressure_old - RT * density_pre)
    fai = _rep_pad_interior(
        eos_pressure(rho_pre, dx=DX, dt=DT) - rho_pre * RT
    )
    lap = laplacian_field(density_ca, dx=DX, interpret=True)

    def _sub(x):
        return jnp.where(
            flags == int(CellType.OBSTACLE), _rep_pad_interior(x), x
        )

    stack = [_sub(lap), _sub(fai), _sub(prho)]
    if has_h2:
        chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * DX))
        stack.append(_sub(chi))
    grads = grad_fields(jnp.concatenate(stack, axis=1), dx=DX,
                        interpret=True)
    gravity = jnp.asarray(GRAV, jnp.float32).reshape(1, 3, 1, 1, 1)
    force = KAPPA * density_ca * grads[:, 0:3] + gravity * density_ca
    if has_h2:
        force = force - 0.5 * MU0 * H2 * grads[:, 9:12]
    dfai = grads[:, 3:6]
    dprho = grads[:, 6:9]

    c = DX / DT
    is_fluid = flags == int(CellType.FLUID)
    macro_vel = (g_mom * c + 0.5 * DT * RT * force) / RT / density_ca
    vel = jnp.where(is_fluid, macro_vel, vel_old)
    macro_p = g_sum - 0.5 * DT * jnp.sum(vel * dprho, axis=1, keepdims=True)
    pres = jnp.where(is_fluid, macro_p, pressure_old)
    return vel, pres, force, dfai, dprho


@pytest.mark.parametrize("has_h2", [True, False])
def test_gradmac_matches_composition(has_h2):
    (rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
     g_mom, vel_old) = _setup()
    assert capmac_supported(rho_pre.shape)

    want = _reference(rho_pre, density_pre, pressure, rho_ca, H2, phi,
                      flags, g_sum, g_mom, vel_old, has_h2)

    density_ca = rho_to_density(
        rho_ca, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    lap = laplacian_field(density_ca, dx=DX, interpret=True)
    got = hcz_capillary_gradmac(
        lap, rho_pre, density_pre, pressure, rho_ca,
        H2 if has_h2 else None, phi if has_h2 else None,
        flags, g_sum, g_mom, vel_old,
        kappa=KAPPA, gravity=GRAV, mu0_half=0.5 * MU0,
        rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF,
        dx=DX, dt=DT, interpret=True,
    )
    names = ["vel", "pressure", "force", "dfai", "dprho"]
    for g, w, n in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=1e-8,
            err_msg=n,
        )


@pytest.mark.parametrize("has_h2", [True, False])
@pytest.mark.parametrize("Z", [4, 8])
def test_gradmac_compute_lap_matches_explicit(has_h2, Z):
    """lap=None (in-kernel Laplacian, lag-2 pipeline) matches passing the
    separate laplacian_field output to within XLA FMA-contraction noise
    (the same tap expressions can contract differently across the two
    compilations — observed max 1 ULP on a handful of cells)."""
    (rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
     g_mom, vel_old) = _setup()
    sl = (slice(None), slice(None), slice(0, Z))
    (rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
     g_mom, vel_old) = (
        x[sl] for x in (rho_pre, density_pre, pressure, rho_ca, H2, phi,
                        flags, g_sum, g_mom, vel_old)
    )
    kw = dict(
        kappa=KAPPA, gravity=GRAV, mu0_half=0.5 * MU0,
        rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF,
        dx=DX, dt=DT, interpret=True,
    )
    density_ca = rho_to_density(
        rho_ca, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    lap = laplacian_field(density_ca, dx=DX, interpret=True)
    h2a = H2 if has_h2 else None
    phia = phi if has_h2 else None
    want = hcz_capillary_gradmac(
        lap, rho_pre, density_pre, pressure, rho_ca, h2a, phia,
        flags, g_sum, g_mom, vel_old, **kw,
    )
    got = hcz_capillary_gradmac(
        None, rho_pre, density_pre, pressure, rho_ca, h2a, phia,
        flags, g_sum, g_mom, vel_old, **kw,
    )
    names = ["vel", "pressure", "force", "dfai", "dprho"]
    for g, w, n in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-6, atol=2e-8, err_msg=n
        )
