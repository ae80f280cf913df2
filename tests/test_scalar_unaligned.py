"""Round-5: the tau==1 scalar Poisson collapse on every grid.

Rounds 3-4 built the collapse for the lane-aligned Pallas wavefront shapes
only; the reference's native demo resolutions are all unaligned
(demo_3d_LBM_Rosensweig_instability.py:253 -> [130, 66, 130],
demo_2d_LBM_two_droplets.py:256 -> [98, 384]), so the flagship algorithm
never reached the configurations a reference user runs.  These tests cover
the round-5 generalization:

* D2Q9 collapse (ops/scalar_poisson.py lattice inference) vs the channel
  jnp solve,
* exact-order jnp dispatch in solve_H_int_scalar for unaligned 3D shapes,
* prime_premac engaging the carry on unaligned 3D / 2D states (and the
  step tracking the channel path at ulp level),
* the carry NOT engaging where it must not: f64 h storage (the f64
  golden-parity configs), interior obstacles, tau != 1.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_ferrofluid_tpu.lattice import D2Q9
from lbm_ferrofluid_tpu.models import scenes
from lbm_ferrofluid_tpu.models.ferrofluid import (
    _mag_boundary_only,
    _scalar_convert,
    ferrofluid_step_impl,
    prime_premac,
)
from lbm_ferrofluid_tpu.ops.magnetic import solve_H_int, solve_H_int_scalar
from lbm_ferrofluid_tpu.ops.scalar_poisson import (
    make_cmask,
    s_prev_from_h,
    scalar_from_h,
    wall_weight_field,
)
from lbm_ferrofluid_tpu.utils.types import CellType

OBS, FLUID = int(CellType.OBSTACLE), int(CellType.FLUID)


def frame_flags_2d(H, W, batch=1):
    mf = np.full((batch, 1, H, W), OBS, np.uint8)
    mf[..., 1:-1, 1:-1] = FLUID
    return mf


def test_d2q9_collapse_vs_channel_jnp():
    """Two emulated outer steps through the public solvers: the D2Q9
    (s, s_prev) carry reproduces the 9-channel warm-started solve at
    tolerance level (jnp.sum reduction order differs)."""
    rng = np.random.default_rng(3)
    H, W = 18, 40
    mf = frame_flags_2d(H, W)
    flags = jnp.asarray(mf)
    h = jnp.zeros((1, 9, H, W), jnp.float32)
    mask = (mf != OBS).astype(np.float32)
    rhs = jnp.asarray(
        rng.normal(size=(1, 1, H, W)).astype(np.float32) * 0.01 * mask
    )
    s2 = jnp.zeros((1, 2, H, W), jnp.float32)
    cmask = make_cmask(flags)
    h2e = (0.0, 2.5)
    for scale in (1.0, 0.7):
        r = rhs * scale
        H2_c, h = solve_H_int(
            D2Q9, h, None, flags, None, tau=1.0, n_iters=6,
            use_pallas=False, rhs_scaled=r, h2_ext=h2e,
        )
        H2_s, s2 = solve_H_int_scalar(
            s2, cmask, flags, r, n_iters=6, h2_ext=h2e, use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(H2_s), np.asarray(H2_c), rtol=2e-5, atol=1e-6
        )
    # the carried pair round-trips against the channel h
    s_rt = scalar_from_h(h, flags)
    np.testing.assert_allclose(
        np.asarray(s_rt), np.asarray(s2[:, :1]), rtol=1e-5, atol=2e-7
    )
    wmask = np.asarray(wall_weight_field(flags)) > 0
    sp_rt = np.asarray(s_prev_from_h(h, flags))
    np.testing.assert_allclose(
        sp_rt[wmask], np.asarray(s2[:, 1:2])[wmask], rtol=1e-5, atol=2e-7
    )


def test_unaligned_3d_solver_matches_channel():
    """solve_H_int_scalar's exact-order jnp dispatch on a lane-unaligned
    3D shape vs the warm-started 19-channel jnp solve."""
    from lbm_ferrofluid_tpu.lattice import D3Q19

    rng = np.random.default_rng(11)
    Z, Y, X = 10, 7, 18  # X % 128 != 0: the wavefront cannot take this
    mf = np.full((1, 1, Z, Y, X), OBS, np.uint8)
    mf[..., 1:-1, :, 1:-1] = FLUID
    flags = jnp.asarray(mf)
    mask = (mf != OBS).astype(np.float32)
    rhs = jnp.asarray(
        rng.normal(size=(1, 1, Z, Y, X)).astype(np.float32) * 0.01 * mask
    )
    h = jnp.zeros((1, 19, Z, Y, X), jnp.float32)
    s2 = jnp.zeros((1, 2, Z, Y, X), jnp.float32)
    cmask = make_cmask(flags)
    h2e = (0.0, 2.5, 0.0)
    for scale in (1.0, 0.6):
        r = rhs * scale
        H2_c, h = solve_H_int(
            D3Q19, h, None, flags, None, tau=1.0, n_iters=6,
            use_pallas=False, rhs_scaled=r, h2_ext=h2e,
        )
        H2_s, s2 = solve_H_int_scalar(
            s2, cmask, flags, r, n_iters=6, h2_ext=h2e, use_pallas=True,
        )
        np.testing.assert_allclose(
            np.asarray(H2_s), np.asarray(H2_c), rtol=2e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "scene,res",
    [
        ("rosensweig_3d", (18, 17, 34)),
        ("two_droplets_3d", (14, 14, 48)),
        ("two_droplets_2d", (40, 96)),
    ],
)
def test_prime_engages_scalar_carry_and_tracks_channel(scene, res):
    """prime_premac converts unaligned/2D states to the (s, s_prev) carry
    and the stepped fields track the un-primed channel path at ulp level
    (exact-order sweeps: FMA-contraction-class shift only)."""
    params, state = getattr(scenes, scene)(res=res)
    sc = state
    for _ in range(5):
        sc = ferrofluid_step_impl(params, sc)
    sp = prime_premac(params, state)
    assert sp.h.shape[:2] == (1, 2), "scalar carry did not engage"
    assert sp.cmask is not None
    for _ in range(5):
        sp = ferrofluid_step_impl(params, sp)
    for name in ("density", "vel", "pressure", "rho"):
        a = np.asarray(getattr(sc, name))
        b = np.asarray(getattr(sp, name))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 3e-5, name


def test_no_convert_f64():
    """f64 h storage (the golden-parity configs) must stay channel-form:
    the scalar carry is f32."""
    params, state = scenes.two_droplets_2d(res=(20, 48))
    params = dataclasses.replace(
        params, fg_dtype="float64", h_dtype="float64"
    )
    state = dataclasses.replace(
        state, h=state.h.astype(jnp.float64)
    )
    assert _scalar_convert(params, state) is None
    sp = prime_premac(params, state)
    assert sp.h.shape[1] == state.h.shape[1]


def test_no_convert_interior_obstacle():
    """An interior magnetic obstacle breaks the collapse's grad-
    substitution precondition; the concrete boundary-only check must
    reject it (and accept the full-frame two-droplets geometry)."""
    params, state = scenes.two_droplets_3d(res=(12, 12, 24))
    assert _mag_boundary_only(state.magnetic_flags)
    bad = np.asarray(state.magnetic_flags).copy()
    bad[..., 5, 5, 7] = OBS
    assert not _mag_boundary_only(jnp.asarray(bad))
    state2 = dataclasses.replace(state, magnetic_flags=jnp.asarray(bad))
    assert _scalar_convert(params, state2) is None


def test_no_convert_tau_not_one():
    params, state = scenes.two_droplets_2d(res=(20, 48))
    params = dataclasses.replace(params, tau=0.8)
    assert _scalar_convert(params, state) is None
