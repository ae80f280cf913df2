"""Explicit shard_map halo-exchange Poisson loop vs the single-device loop."""

import numpy as np
import jax
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops import bounce_back, heq, stream
from lbm_ferrofluid_tpu.parallel.halo import sharded_poisson_sweeps
from lbm_ferrofluid_tpu.parallel.mesh import make_mesh


def _reference_sweeps(h, flags, rhs_scaled, tau, n_iters):
    lat = D3Q19
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=h.dtype)
    w0 = float(lat.weights[0])
    add_h = w * rhs_scaled
    is_obs = flags == int(CellType.OBSTACLE)
    psi = jnp.zeros_like(rhs_scaled)
    for _ in range(n_iters):
        h = stream(lat, h)
        h = bounce_back(lat, h, flags)
        psi = jnp.sum(h[:, 1:], axis=1, keepdims=True) / (1.0 - w0)
        heq_val = heq(lat, psi)
        coll = (1.0 - 1.0 / tau) * h + heq_val / tau + add_h
        h = jnp.where(is_obs, h, coll)
    return h, psi


def test_sharded_poisson_matches_reference():
    Z, Y, X = 16, 8, 16
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 1, Z, Y, X)), jnp.float32)

    h_ref, psi_ref = _reference_sweeps(h, flags, rhs, tau=1.0, n_iters=6)

    mesh = make_mesh(("z",), (8,))
    h_sh, psi_sh = sharded_poisson_sweeps(
        h, flags, rhs, mesh, tau=1.0, n_iters=6
    )
    np.testing.assert_allclose(
        np.asarray(h_sh), np.asarray(h_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(psi_sh), np.asarray(psi_ref), rtol=1e-5, atol=1e-6
    )


def test_sharded_poisson_4way():
    Z, Y, X = 8, 8, 8
    rng = np.random.default_rng(8)
    h = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = jnp.full((1, 1, Z, Y, X), int(CellType.FLUID), jnp.uint8)
    rhs = jnp.zeros((1, 1, Z, Y, X), jnp.float32)

    h_ref, _ = _reference_sweeps(h, flags, rhs, tau=0.8, n_iters=3)
    mesh = make_mesh(("z",), (4,), devices=jax.devices()[:4])
    h_sh, _ = sharded_poisson_sweeps(h, flags, rhs, mesh, tau=0.8, n_iters=3)
    np.testing.assert_allclose(
        np.asarray(h_sh), np.asarray(h_ref), rtol=1e-5, atol=1e-7
    )
