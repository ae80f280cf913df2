"""Physics property tests (SURVEY.md §4): Laplace law, entropic stability,
Poisson fixed point, Galilean invariance of streaming."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType, D2Q9, KBCType
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    SimulationRunner,
    hcz_step_impl,
    init_hcz_state,
    init_singlephase_state,
    singlephase_step,
    singlephase_step_impl,
)
from lbm_ferrofluid_tpu.ops import eos_pressure, solve_H_int


def test_laplace_law_static_droplet():
    """A static HCZ droplet carries a pressure jump Δp that grows with
    curvature (Laplace law Δp = σ/R in 2D): smaller droplet -> larger jump."""
    jumps = {}
    for radius_frac in (0.18, 0.30):
        res = (64, 64)
        params = SimulationParams(
            dim=2, density_gas=0.02381, density_fluid=0.2508,
            rho_gas=0.02381, rho_fluid=0.2508, kappa=0.1,
            tau_f=0.7, tau_g=0.8, contact_angle=0.5 * math.pi,
        )
        H, W = res
        flags = np.full((1, 1, *res), int(CellType.FLUID), np.uint8)
        flags[..., 0, :] = flags[..., -1, :] = int(CellType.OBSTACLE)
        flags[..., :, 0] = flags[..., :, -1] = int(CellType.OBSTACLE)
        j, i = np.mgrid[0:H, 0:W]
        r = radius_frac * H
        disc = (j - H / 2) ** 2 + (i - W / 2) ** 2 <= r * r
        rho = np.where(disc, params.rho_fluid, params.rho_gas)[None, None].astype(np.float32)
        den = np.where(disc, params.density_fluid, params.density_gas)[None, None].astype(np.float32)
        rho[0, 0][np.asarray(flags[0, 0]) == 2] = params.rho_fluid
        den[0, 0][np.asarray(flags[0, 0]) == 2] = params.density_fluid
        state = init_hcz_state(params, rho, den, np.zeros((1, 2, *res), np.float32), flags)
        runner = SimulationRunner(params, hcz_step_impl)
        state = runner.run(state, 400)
        p = np.asarray(state.pressure)[0, 0]
        p_in = p[H // 2, W // 2]
        p_out = p[H // 4, W // 8]
        jumps[radius_frac] = p_in - p_out
        assert np.isfinite(p).all()
    # both droplets sustain a positive pressure jump; smaller R -> larger Δp
    assert jumps[0.18] > 0 and jumps[0.30] > 0
    assert jumps[0.18] > jumps[0.30]


def test_kbc_stabilizes_high_re():
    """At a Reynolds number where plain BGK's tau is unstable, the entropic
    KBC run must stay finite (the KBC selling point)."""
    res = (48, 48)
    # tau very close to 0.5: BGK marginal/unstable, KBC stabilized
    tau = 0.5 + 1e-4
    H, W = res
    j, i = np.mgrid[0:H, 0:W]
    vmax = 0.1
    vel = np.zeros((1, 2, *res), np.float32)
    vel[0, 1] = 0.05 * vmax * np.sin(2 * np.pi * (i / W + 0.25))
    vel[0, 0] = np.where(j <= H / 2, vmax * np.tanh(80 * (j / H - 0.25)),
                         vmax * np.tanh(80 * (-j / H + 0.75)))
    rho = np.full((1, 1, *res), 0.265, np.float32)
    flags = np.full((1, 1, *res), int(CellType.FLUID), np.uint8)

    params = SimulationParams(dim=2, tau=tau, kbc_type=int(KBCType.KBC_A))
    state = init_singlephase_state(params, rho, vel, flags)
    runner = SimulationRunner(params, singlephase_step_impl)
    state = runner.run(state, 300)
    assert bool(jnp.isfinite(state.f).all()), "KBC run blew up"
    assert float(jnp.abs(state.vel).max()) < 1.0


def test_poisson_solver_fixed_point_and_symmetry():
    """The magnetic Poisson-LBM sweep converges to a fixed point, and a
    symmetric source yields a symmetric potential / antisymmetric H_int."""
    from lbm_ferrofluid_tpu.models import ferrofluid
    from lbm_ferrofluid_tpu.lattice import D3Q19
    from lbm_ferrofluid_tpu.ops import staggered

    res = (16, 16, 16)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    mflags = jnp.asarray(mflags)
    # symmetric phi blob in the center
    z, y, x = np.mgrid[0:16, 0:16, 0:16]
    r2 = (z - 7.5) ** 2 + (y - 7.5) ** 2 + (x - 7.5) ** 2
    phi = jnp.asarray((2.0 / (1.0 + np.exp(-(r2 - 16) / 8.0)) - 1.0)[None, None],
                      jnp.float32)
    H_ext = jnp.zeros((1, 3, *res), jnp.float32).at[:, 1].set(50.0)
    H_mac = staggered(H_ext)

    h = jnp.zeros((1, 19, *res), jnp.float32)
    H1, h1 = solve_H_int(D3Q19, h, phi, mflags, H_mac, tau=1.0, n_iters=400)
    H2, h2 = solve_H_int(D3Q19, h1, phi, mflags, H_mac, tau=1.0, n_iters=20)
    # fixed point: more sweeps change nothing
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=2e-4)
    # symmetric problem -> H_int x-component antisymmetric about the center
    Hx = np.asarray(H1)[0, 0, 8, 8, :]
    np.testing.assert_allclose(Hx[1:8], -Hx[14:7:-1], atol=2e-3)


def test_momentum_conserved_without_forces():
    """Periodic BGK run approximately conserves total momentum.

    The exponential-form equilibrium satisfies Σ feq e = ρu only to O(u^4)
    (reference LBM_collision_2d.py:127-145 — it is not the quadratic
    Maxwellian), so momentum drifts slowly rather than being exact; assert
    the drift stays at the discretization level over 50 steps."""
    res = (32, 32)
    params = SimulationParams(dim=2, tau=0.8)
    rng = np.random.default_rng(0)
    rho = np.full((1, 1, *res), 1.0, np.float32)
    vel = rng.uniform(-0.02, 0.02, (1, 2, *res)).astype(np.float32)
    flags = np.full((1, 1, *res), int(CellType.FLUID), np.uint8)
    state = init_singlephase_state(params, rho, vel, flags)
    mom0 = np.asarray(jnp.sum(state.f[:, :, None] *
                              jnp.asarray(D2Q9.e_bcast()), axis=(0, 1, 3, 4)))
    for _ in range(50):
        state = singlephase_step(params, state)
    mom1 = np.asarray(jnp.sum(state.f[:, :, None] *
                              jnp.asarray(D2Q9.e_bcast()), axis=(0, 1, 3, 4)))
    drift = np.abs(mom1 - mom0).max()
    scale = np.abs(mom0).max()
    assert drift < 2e-3 * max(scale, 1.0), f"momentum drift {drift} too large"


def test_wave_kbc_on_g_stays_finite():
    """The reference's wave config (KBC_A on g, velocity-pinned inflow) NaNs
    at step 0 in the reference because the entropic gamma divides 0/0 where
    g == geq exactly; our guarded stabilizer keeps the whole state finite."""
    from lbm_ferrofluid_tpu.models import hcz_step, scenes

    params, state = scenes.wave((32, 32))
    for _ in range(50):
        state = hcz_step(params, state)
    assert bool(jnp.isfinite(state.g).all()), "g went non-finite"
    assert bool(jnp.isfinite(state.f).all())
    assert bool(jnp.isfinite(state.vel).all())
    # the pinned inflow column is held at vel_max
    np.testing.assert_allclose(np.asarray(state.vel)[0, 0, :, 0], 0.2, atol=1e-6)
