"""Pallas scalar Poisson wavefront kernel (interpret mode on CPU).

The kernel pipelines k scalar sweeps (ops/pallas/scalar_poisson.py) with
per-plane cached stencil partials; its tap association differs from both
the jnp fast order and the channel form at the ulp level (module
docstring), so assertions are tolerance-based like the fast-order tests
in test_scalar_poisson.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops.magnetic import solve_H_int
from lbm_ferrofluid_tpu.ops.scalar_poisson import (
    fluid_mask,
    make_cmask,
)
from lbm_ferrofluid_tpu.ops.pallas.scalar_poisson import (
    _sp_plan,
    scalar_sweeps_cmask,
    scalar_wavefront,
    scalar_wavefront_hint_ok,
    scalar_wavefront_supported,
)

Z, Y, X = 16, 8, 128


def _shell_flags(z=Z, y=Y, x=X, interior_blob=False):
    mf = np.full((1, 1, z, y, x), int(CellType.OBSTACLE), np.uint8)
    mf[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    if interior_blob:
        mf[..., 5:8, 2:5, 30:40] = int(CellType.OBSTACLE)
    return jnp.asarray(mf)


def _inputs(seed, interior_blob=False, warm=True):
    rng = np.random.default_rng(seed)
    mf = _shell_flags(interior_blob=interior_blob)
    mask = np.asarray(fluid_mask(mf))
    s = rng.uniform(-1.0, 1.0, (1, 1, Z, Y, X)).astype(np.float32) * mask
    sp = rng.uniform(-1.0, 1.0, (1, 1, Z, Y, X)).astype(np.float32) * mask
    if not warm:
        s[:] = 0.0
        sp[:] = 0.0
    s2 = jnp.asarray(np.concatenate([s, sp], axis=1))
    rhs = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (1, 1, Z, Y, X)).astype(np.float32)
    )
    return s2, make_cmask(mf), rhs, mf


def test_supported_and_plan():
    assert scalar_wavefront_supported((1, 2, Z, Y, X), jnp.float32, 6)
    assert not scalar_wavefront_supported((2, 2, Z, Y, X), jnp.float32, 6)
    assert not scalar_wavefront_supported((1, 2, Z, Y, 130), jnp.float32, 6)
    assert not scalar_wavefront_supported((1, 2, Z, Y, X), jnp.bfloat16, 6)
    # kmax = (Z-2)//2 = 7; prefers divisors of n_iters, then deeper
    assert _sp_plan((1, 2, Z, Y, X), 6) == 6
    assert _sp_plan((1, 2, Z, Y, X), 12) == 6
    assert _sp_plan((1, 2, Z, Y, X), 9) == 3
    assert _sp_plan((1, 2, Z, Y, X), 11) == 7  # remainder schedule


@pytest.mark.parametrize(
    "n_iters, blob",
    [(1, False), (4, False), (6, False), (12, False), (9, True), (11, False)],
)
def test_wavefront_matches_jnp(n_iters, blob):
    """Single-pass, multi-pass and remainder schedules vs the jnp sweeps,
    warm (s, s_prev) carry, shell and interior-obstacle geometries."""
    s2, cmask, rhs, _ = _inputs(7 + n_iters, interior_blob=blob)
    s2_j, psi_j = scalar_sweeps_cmask(s2, cmask, rhs, n_iters)
    s2_k, psi_k = scalar_wavefront(
        s2, cmask, rhs, n_iters=n_iters, emit="psi", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(s2_k), np.asarray(s2_j), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(psi_k), np.asarray(psi_j), rtol=2e-5, atol=1e-6
    )


@pytest.mark.slow
def test_wavefront_h2_matches_channel_solve_two_steps():
    """emit='h2' vs the channel-form jnp solve_H_int at tau==1, including
    the warm (s, s_prev) <-> h carry across two outer steps."""
    n_iters = 6
    h_ext = (0.0, 0.3, 0.1)
    s2, cmask, rhs, mf = _inputs(3, warm=False)
    assert scalar_wavefront_hint_ok(s2.shape, s2.dtype, n_iters)
    h = jnp.zeros((1, 19, Z, Y, X), jnp.float32)
    rhs2 = rhs * 0.7 + 1e-3  # a second, different source term

    for step_rhs in (rhs, rhs2):
        H2_c, h = solve_H_int(
            D3Q19, h, None, mf, None, tau=1.0, n_iters=n_iters,
            use_pallas=False, rhs_scaled=step_rhs, h2_ext=h_ext,
        )
        s2, H2_s = scalar_wavefront(
            s2, cmask, step_rhs, n_iters=n_iters, emit="h2",
            h_ext=h_ext, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(H2_s), np.asarray(H2_c), rtol=2e-5, atol=1e-6
        )
