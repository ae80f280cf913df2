"""Fused capillary+collide+emission kernel vs the capmac -> epilogue
composition it replaces (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.ops.collide import MU0
from lbm_ferrofluid_tpu.ops.moments import rho_to_density
from lbm_ferrofluid_tpu.ops.pallas.capillogue import (
    capillogue_fits,
    lbm_capillogue,
)
from lbm_ferrofluid_tpu.ops.pallas.capmac import hcz_capillary_gradmac
from lbm_ferrofluid_tpu.ops.pallas.fused_step import lbm_epilogue

pytestmark = pytest.mark.slow  # interpret-mode Pallas / long-horizon: fast tier skips

RG, RF = 0.02381, 0.2508
DX = DT = 1.0
KAPPA = 0.01
GRAV = (0.0, -1e-4, 0.0)
TAU_F = TAU_G = 0.68


def _setup(Z, dtype):
    Y, X = 8, 128
    rng = np.random.default_rng(7)
    dt_ = jnp.dtype(dtype)
    f = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)),
                    jnp.float32).astype(dt_)
    g = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)),
                    jnp.float32).astype(dt_)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rho_pre = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    density_pre = rho_to_density(
        rho_pre, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    pressure = jnp.asarray(rng.uniform(0.0, 0.05, (1, 1, Z, Y, X)),
                           jnp.float32)
    rho_ca = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    H2 = jnp.asarray(rng.uniform(0.0, 100.0, (1, 1, Z, Y, X)), jnp.float32)
    phi = -(2.0 * (density_pre - RG) / (RF - RG) - 1.0)
    g_sum = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    g_mom = jnp.asarray(rng.uniform(-1e-2, 1e-2, (1, 3, Z, Y, X)),
                        jnp.float32)
    vel_old = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)),
                          jnp.float32)
    return (f, g, flags, rho_pre, density_pre, pressure, rho_ca, H2, phi,
            g_sum, g_mom, vel_old)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("Z", [4, 8])
@pytest.mark.parametrize("emit_rhs", [None, (1, 85.0, 0.8), (0, -7.5, 0.8)])
def test_capillogue_matches_composition(dtype, Z, emit_rhs):
    (f, g, flags, rho_pre, density_pre, pressure, rho_ca, H2, phi,
     g_sum, g_mom, vel_old) = _setup(Z, dtype)
    mflags = flags  # any flag field works for the equivalence check

    kw = dict(
        kappa=KAPPA, gravity=GRAV, mu0_half=0.5 * MU0,
        rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF,
        dx=DX, dt=DT, interpret=True,
    )
    # the composition: capmac (in-kernel lap) -> emit_mac epilogue
    w_vel, w_pres, w_force, w_dfai, w_dprho = hcz_capillary_gradmac(
        None, rho_pre, density_pre, pressure, rho_ca, H2, phi,
        flags, g_sum, g_mom, vel_old, **kw,
    )
    den_ca = rho_to_density(
        rho_ca, rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF
    )
    mk = (DX / DT, RG, RF, RG, RF)
    w_f, w_g, w_mac = lbm_epilogue(
        f, g, flags, rho_ca, w_vel, den_ca, w_pres, w_force, w_dfai,
        w_dprho, tau_f=TAU_F, tau_g=TAU_G, dx=DX, dt=DT,
        emit_mac=True, mac_consts=mk, interpret=True,
    )

    g_f, g_g, g_vel, g_pres, g_force, g_den, g_mac = lbm_capillogue(
        f, g, flags, rho_pre, density_pre, pressure, rho_ca, H2,
        g_sum, g_mom, vel_old, mflags if emit_rhs else None,
        tau_f=TAU_F, tau_g=TAU_G, emit_rhs=emit_rhs, **kw,
    )
    if emit_rhs is not None:
        from lbm_ferrofluid_tpu.ops.magnetic import poisson_rhs_scaled

        assert len(g_mac) == 6
        # next step's rhs from the emitted density, vs the jnp helper
        phi_n = -(2.0 * (g_mac[2] - RG) / (RF - RG) - 1.0)
        axis, hm, tau_mag = emit_rhs
        h2e = tuple(hm if d == axis else 0.0 for d in range(3))
        want_rhs = poisson_rhs_scaled(
            phi_n, mflags, None, h2e,
            tau=tau_mag, dx=DX, dt=DT, dim=3,
        )
        # atol at chi's ULP scale: rhs is a DIFFERENCE of O(1) chi
        # averages, so 1-2 ULP FMA-contraction differences between the
        # two compilations are amplified by the cancellation (a wrong
        # shift or scale would show at the 1e-3 level of |rhs| itself)
        np.testing.assert_allclose(
            np.asarray(g_mac[5]), np.asarray(want_rhs),
            rtol=3e-6, atol=2e-6, err_msg="mac_rhs",
        )
        g_mac = g_mac[:5]

    pairs = [
        ("vel", g_vel, w_vel), ("pressure", g_pres, w_pres),
        ("force", g_force, w_force), ("density", g_den, den_ca),
        ("f", g_f.astype(jnp.float32), w_f.astype(jnp.float32)),
        ("g", g_g.astype(jnp.float32), w_g.astype(jnp.float32)),
    ] + [
        (f"mac_{n}", gm, wm)
        for n, gm, wm in zip(("rho", "vel", "den", "m0g", "m1g"),
                             g_mac, w_mac)
    ]
    for n, got, want in pairs:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-8,
            err_msg=n,
        )


@pytest.mark.parametrize("emit_rhs", [None, (1, 85.0, 0.8)])
def test_capillogue_emit_force_off(emit_rhs):
    """emit_force=False drops ONLY the force output (returned None); every
    other output is bit-identical to emit_force=True — the in-register
    force still drives the collision."""
    (f, g, flags, rho_pre, density_pre, pressure, rho_ca, H2, phi,
     g_sum, g_mom, vel_old) = _setup(4, "float32")
    kw = dict(
        kappa=KAPPA, gravity=GRAV, mu0_half=0.5 * MU0,
        rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF,
        dx=DX, dt=DT, tau_f=TAU_F, tau_g=TAU_G, emit_rhs=emit_rhs,
        interpret=True,
    )
    args = (f, g, flags, rho_pre, density_pre, pressure, rho_ca, H2,
            g_sum, g_mom, vel_old, flags if emit_rhs else None)
    a = lbm_capillogue(*args, emit_force=True, **kw)
    b = lbm_capillogue(*args, emit_force=False, **kw)
    assert a[4] is not None and b[4] is None
    for i, n in ((0, "f"), (1, "g"), (2, "vel"), (3, "pressure"),
                 (5, "density")):
        np.testing.assert_array_equal(
            np.asarray(a[i], np.float32), np.asarray(b[i], np.float32),
            err_msg=n,
        )
    assert len(a[6]) == len(b[6])
    for i, (ma, mb) in enumerate(zip(a[6], b[6])):
        np.testing.assert_array_equal(
            np.asarray(ma), np.asarray(mb), err_msg=f"mac[{i}]"
        )


def test_capillogue_fits_gate():
    assert capillogue_fits((1, 19, 256, 256, 256), jnp.bfloat16)
    assert not capillogue_fits((1, 19, 256, 256, 256), jnp.float32)
    assert not capillogue_fits((1, 19, 64, 34, 64), jnp.bfloat16)
