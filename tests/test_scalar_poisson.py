"""The tau=1 scalar collapse of the Poisson solve (ops/scalar_poisson.py).

The load-bearing assertion is BIT-exactness: in f32, scalar sweeps with
order="exact" must reproduce the sequential channel-form sweep
(ops/pallas/poisson.py:_sweep_math semantics) to the last bit at every
fluid cell — for ARBITRARY obstacle geometry (the lag-2 self-reflection
identity), which is what licenses replacing the 19-channel kernel with
the 1-channel stencil on the production path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_ferrofluid_tpu.lattice import D3Q19
from lbm_ferrofluid_tpu.ops.scalar_poisson import (
    fluid_mask,
    h_from_scalar,
    s_prev_from_h,
    scalar_from_h,
    scalar_sweeps_jnp,
    wall_weight_field,
)
from lbm_ferrofluid_tpu.utils.types import CellType

OBS, FLUID = int(CellType.OBSTACLE), int(CellType.FLUID)


def shell_flags(Z, Y, X, batch=1, blob=False):
    """Flagship magnetic geometry: z-plane + x-column shell, open y
    (models/scenes.py:313-314); blob=True adds an interior obstacle."""
    mf = np.full((batch, 1, Z, Y, X), OBS, np.uint8)
    mf[..., 1:-1, :, 1:-1] = FLUID
    if blob:
        mf[..., 4:6, 2:4, 5:7] = OBS
    return mf


def make_fields(Z=10, Y=6, X=12, seed=0, blob=False):
    rng = np.random.default_rng(seed)
    mf = shell_flags(Z, Y, X, blob=blob)
    mask = fluid_mask(jnp.asarray(mf))
    s0 = jnp.asarray(rng.normal(size=(1, 1, Z, Y, X)).astype(np.float32)) * mask
    rhs = jnp.asarray(
        rng.normal(size=(1, 1, Z, Y, X)).astype(np.float32)
    ) * 0.01 * mask
    return mf, mask, s0, rhs


def channel_sweeps_seq(h, rhs, flags, n_iters):
    """Sequential-summation channel-form sweep at tau == 1 — the exact
    arithmetic of ops/pallas/poisson.py:_sweep_math (pull-stream, psi from
    pre-bounce-back values in ascending q order, w_q*(psi+rhs) collision,
    obstacle cells keep the bounce-backed populations)."""
    lat = D3Q19
    shifts = lat.shifts()
    is_obs = flags == OBS
    for _ in range(n_iters):
        streamed = [
            jnp.roll(h[:, q], shifts[q], axis=(-3, -2, -1))
            if any(shifts[q]) else h[:, q]
            for q in range(19)
        ]
        acc = streamed[1]
        for q in range(2, 19):
            acc = acc + streamed[q]
        psi = acc * np.float32(1.5)
        u = psi + rhs[:, 0]
        out = []
        for q in range(19):
            coll = np.float32(lat.weights[q]) * u
            if q == 0:
                coll = coll - psi
            out.append(jnp.where(is_obs[:, 0], streamed[int(lat.opposite[q])], coll))
        h = jnp.stack(out, axis=1)
    return psi[:, None], h


def scalar_sweeps_barriered(s, s_prev, rhs, mf, n_iters):
    """scalar_sweeps_jnp(order="exact") with every per-tap product
    materialized through an optimization_barrier — XLA cannot FMA-contract
    the product into the following add, exactly like the channel path's
    h-store does.  Proves TRUE bit-identity of the collapse; the shipped
    scalar_sweeps_jnp omits the barriers (FMA-level shift, fusable)."""
    lat = D3Q19
    shifts = lat.shifts()
    mask = fluid_mask(jnp.asarray(mf))
    obs_f = 1.0 - mask
    wall_m = [None] + [
        jnp.roll(obs_f, shifts[q], axis=(-3, -2, -1)) for q in range(1, 19)
    ]
    psi = None
    for _ in range(n_iters):
        acc = None
        for q in range(1, 19):
            tap = (
                jnp.roll(s, shifts[q], axis=(-3, -2, -1))
                + wall_m[q] * s_prev
            )
            c = jax.lax.optimization_barrier(
                np.float32(lat.weights[q]) * tap
            )
            acc = c if acc is None else acc + c
        psi = acc * np.float32(1.5)
        s, s_prev = (psi + rhs) * mask, s
    return psi, s, s_prev


@pytest.mark.parametrize("blob", [False, True])
@pytest.mark.parametrize("n_iters", [1, 4, 7])
def test_scalar_exact_bitwise_vs_channel(n_iters, blob):
    mf, mask, s0, rhs = make_fields(blob=blob)
    w = jnp.asarray(D3Q19.w_bcast(np.float64), jnp.float32)
    # canonical start: h0 = w_q * s0 at fluid, zero elsewhere (the
    # init_ferrofluid_state h=0 invariant corresponds to s0 = 0; a random
    # masked s0 with zero wall channels is the s_prev=0 canonical state)
    h0 = (w * s0 * mask).astype(jnp.float32)
    sp0 = jnp.zeros_like(s0)
    psi_c, h_c = channel_sweeps_seq(h0, rhs, jnp.asarray(mf), n_iters)
    psi_s, s_last, sp_last = scalar_sweeps_barriered(s0, sp0, rhs, mf, n_iters)

    fluid = np.asarray(mf[:, 0] != OBS)
    np.testing.assert_array_equal(
        np.asarray(psi_s)[:, 0][fluid], np.asarray(psi_c)[:, 0][fluid]
    )
    # the full h reconstruction matches the carried channel h bitwise at
    # every channel any dynamics read: fluid channels AND the wall
    # channels fluid pulls through (obstacle cells with fluid at x+e_q)
    h_rec = h_from_scalar(s_last, sp_last, rhs, jnp.asarray(mf), jnp.float32)
    hc, hr = np.asarray(h_c), np.asarray(h_rec)
    shifts = D3Q19.shifts()
    for q in range(1, 19):
        np.testing.assert_array_equal(hr[:, q][fluid], hc[:, q][fluid])
        # wall channels: obstacle x with fluid reader at x+e_q
        reader_fluid = np.roll(
            fluid, tuple(-v for v in shifts[q]), axis=(-3, -2, -1)
        )
        m = (~fluid) & reader_fluid
        np.testing.assert_array_equal(hr[:, q][m], hc[:, q][m])
    # s/s_prev recovery from the channel h round-trips to ulp
    s_rt = scalar_from_h(h_c, jnp.asarray(mf))
    np.testing.assert_allclose(
        np.asarray(s_rt), np.asarray(s_last), rtol=1e-5, atol=2e-7
    )
    sp_rt = s_prev_from_h(h_c, jnp.asarray(mf))
    cw = np.asarray(wall_weight_field(jnp.asarray(mf)))
    walled = (cw > 0)
    np.testing.assert_allclose(
        np.asarray(sp_rt)[walled], np.asarray(sp_last)[walled],
        rtol=1e-5, atol=2e-7,
    )
    # the shipped (fusable) exact-order sweep differs only by XLA's
    # FMA-contraction choices: ulp-level
    psi_j, s_j, _ = scalar_sweeps_jnp(
        s0, sp0, rhs, None, jnp.asarray(mf), n_iters, order="exact"
    )
    np.testing.assert_allclose(
        np.asarray(psi_j), np.asarray(psi_s), rtol=3e-6, atol=3e-8
    )
    np.testing.assert_allclose(
        np.asarray(s_j), np.asarray(s_last), rtol=3e-6, atol=3e-8
    )


def test_scalar_vs_solve_H_int_jnp_two_steps():
    """Through the public solver across two emulated outer steps (different
    rhs per step, h carried): the (s, s_prev) carry reproduces the channel
    solver's warm start.  Tolerance-level — the jnp fallback sums psi with
    jnp.sum (reduction order differs) and splits w*psi + w*rhs."""
    from lbm_ferrofluid_tpu.ops.magnetic import solve_H_int

    mf, mask, s0, rhs = make_fields(Z=12, Y=8, X=10, seed=5)
    flags = jnp.asarray(mf)
    h = jnp.zeros((1, 19, 12, 8, 10), jnp.float32)
    s = jnp.zeros_like(s0)
    sp = jnp.zeros_like(s0)
    cw = wall_weight_field(flags)
    h2e = (0.0, 2.5, 0.0)
    for step, scale in enumerate((1.0, 0.7)):
        r = rhs * scale
        H2_c, h = solve_H_int(
            D3Q19, h, None, flags, None, tau=1.0, n_iters=6,
            use_pallas=False, rhs_scaled=r, h2_ext=h2e,
        )
        psi, s, sp = scalar_sweeps_jnp(s, sp, r, cw, flags, 6, order="fast")
        # same gradient composition as the fallback
        from lbm_ferrofluid_tpu.ops.magnetic import _maybe_h2
        from lbm_ferrofluid_tpu.ops.stencils import isotropic_grad

        H2_s = _maybe_h2(-isotropic_grad(psi, 1.0, flags, 3), h2e)
        np.testing.assert_allclose(
            np.asarray(H2_s), np.asarray(H2_c), rtol=2e-5, atol=1e-6
        )
    # reconstructed h matches the carried channel h at fluid cells
    h_rec = h_from_scalar(s, sp, rhs * 0.7, flags, jnp.float32)
    fluid = np.asarray(mf != OBS)[:, 0]
    for q in range(1, 19):
        np.testing.assert_allclose(
            np.asarray(h_rec)[:, q][fluid], np.asarray(h)[:, q][fluid],
            rtol=3e-6, atol=1e-8,
        )


def test_fast_order_close_to_exact():
    mf, mask, s0, rhs = make_fields(Z=14, Y=8, X=16, seed=7)
    flags = jnp.asarray(mf)
    cw = wall_weight_field(flags)
    sp0 = jnp.zeros_like(s0)
    psi_e, s_e, _ = scalar_sweeps_jnp(s0, sp0, rhs, cw, flags, 30, order="exact")
    psi_f, s_f, _ = scalar_sweeps_jnp(s0, sp0, rhs, cw, flags, 30, order="fast")
    np.testing.assert_allclose(
        np.asarray(psi_f), np.asarray(psi_e), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s_f), np.asarray(s_e), rtol=1e-5, atol=1e-7
    )


def test_wall_weight_field_values():
    """c(x) is 1.5 * sum of wall-tap weights: for a cell directly above the
    bottom z-plane (away from x edges) the 5 e_z=+1 taps hit the wall:
    c = 1.5 * (1/18 + 4/36) = 1.5 * 1/6 = 0.25."""
    mf = shell_flags(8, 6, 12)
    cw = np.asarray(wall_weight_field(jnp.asarray(mf)))
    assert cw[0, 0, 1, 3, 6] == pytest.approx(1.5 * (1 / 18 + 4 / 36))
    # interior: no wall taps
    assert cw[0, 0, 4, 3, 6] == 0.0
    # obstacle cells masked
    assert cw[0, 0, 0, 3, 6] == 0.0
    # corner cell (above bottom plane AND next to x column): z-taps + x-taps
    # minus the double-counted (±1,0,+1)-style shared diagonals
    e = D3Q19.e
    expect = 1.5 * sum(
        float(D3Q19.weights[q])
        for q in range(1, 19)
        if e[q][2] == 1 or e[q][0] == 1  # tap source z=0 plane or x=0 col
    )
    assert cw[0, 0, 1, 3, 1] == pytest.approx(expect)
