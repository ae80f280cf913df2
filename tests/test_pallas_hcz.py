"""Fused HCZ collide kernel vs the jnp path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops.collide import hcz_collide
from lbm_ferrofluid_tpu.ops.pallas.hcz3d import hcz3d_supported, hcz_collide_fused


def test_supported_gate():
    assert hcz3d_supported(D3Q19, (1, 19, 4, 8, 128), None)
    assert not hcz3d_supported(D3Q19, (1, 19, 4, 8, 128), 0b10000101)  # KBC
    assert not hcz3d_supported(D3Q19, (1, 19, 4, 8, 130), None)


def test_kernel_matches_jnp():
    Z, Y, X = 4, 8, 128
    rng = np.random.default_rng(11)
    shape1 = (1, 1, Z, Y, X)
    shape3 = (1, 3, Z, Y, X)
    f = jnp.asarray(rng.uniform(0.01, 0.05, (1, 19, Z, Y, X)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.01, 0.05, (1, 19, Z, Y, X)), jnp.float32)
    rho = jnp.asarray(rng.uniform(0.1, 0.3, shape1), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.02, 0.02, shape3), jnp.float32)
    density = jnp.asarray(rng.uniform(0.1, 0.3, shape1), jnp.float32)
    pressure = jnp.asarray(rng.uniform(0.0, 0.05, shape1), jnp.float32)
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, shape3), jnp.float32)
    dfai = jnp.asarray(rng.uniform(-1e-3, 1e-3, shape3), jnp.float32)
    dprho = jnp.asarray(rng.uniform(-1e-3, 1e-3, shape3), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)

    f_ref, g_ref = hcz_collide(
        D3Q19, f, g, rho, vel, density, pressure, flags, force, dfai, dprho,
        tau_f=0.68, tau_g=0.68, use_pallas=False,
    )
    f_k, g_k = hcz_collide_fused(
        f, g, rho, vel, density, pressure, flags, force, dfai, dprho,
        tau_f=0.68, tau_g=0.68, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-5, atol=1e-7)
