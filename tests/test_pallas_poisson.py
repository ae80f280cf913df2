"""Pallas Poisson kernel vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops import bounce_back, heq, stream
from lbm_ferrofluid_tpu.ops.pallas.poisson import poisson_supported, poisson_sweeps


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


def test_poisson_supported():
    assert poisson_supported(D3Q19, (1, 19, 16, 8, 128))
    assert not poisson_supported(D3Q19, (2, 19, 16, 8, 128))  # batch
    assert not poisson_supported(D3Q19, (1, 19, 16, 8, 130))  # lanes
    assert not poisson_supported(D3Q19, (1, 19, 16, 9, 128))  # sublanes


@pytest.mark.parametrize("n_iters", [1, 4])
def test_poisson_kernel_matches_reference(n_iters):
    Z, Y, X = 6, 8, 128
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 1, Z, Y, X)), jnp.float32)
    tau = 1.0

    h_ref, psi_ref = _reference_sweeps(h, flags, rhs, tau, n_iters)
    h_ker, psi_ker = poisson_sweeps(
        h, flags, rhs, tau=tau, n_iters=n_iters, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(h_ker), np.asarray(h_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(psi_ker), np.asarray(psi_ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
@pytest.mark.parametrize("n_iters", [7, 30])
def test_multisweep_matches_single_sweep(n_iters, variant, dtype):
    """Temporally-blocked kernels (k sweeps per HBM pass: v1/v2 VMEM-resident
    z-window, v3 time-skewed wavefront with ring buffers) are bit-identical
    to the one-sweep kernel — including the storage rounding of intermediate
    sweeps at bfloat16 and the remainder sweeps when k does not divide
    n_iters."""
    from lbm_ferrofluid_tpu.ops.pallas.poisson import (
        poisson_multisweep,
        poisson_multisweep2,
        poisson_sweeps,
        poisson_wavefront,
    )

    if dtype == "bfloat16" and variant != "v3":
        pytest.skip("bf16 storage rounding covered on the current fast path")

    ms = {
        "v1": poisson_multisweep,
        "v2": poisson_multisweep2,
        "v3": poisson_wavefront,
    }[variant]

    Z, Y, X = 16, 8, 16
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    h = h.astype(jnp.dtype(dtype))
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    kw = {}
    if variant == "v3":
        # pin stage rings to the storage dtype: the bit-exact composition
        # (auto mode upgrades bf16 stages to f32 — tested separately below)
        kw["stage_dtype"] = jnp.dtype(dtype)
    h_ref, psi_ref = poisson_sweeps(
        h, flags, rhs, tau=0.8, n_iters=n_iters, interpret=True
    )
    h_ms, psi_ms = ms(
        h, flags, rhs, tau=0.8, n_iters=n_iters, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(h_ms), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(psi_ms), np.asarray(psi_ref))


@pytest.mark.slow
def test_wavefront_f32_stages_track_f32_solution():
    """The explicit f32-stage-ring option (benched ~10% slower on TPU, so
    not the default — see _wf_plan_full) must be at least as close to the
    all-f32 solve as the bf16-staged composition (fewer roundings inside
    each pass)."""
    from lbm_ferrofluid_tpu.ops.pallas.poisson import (
        poisson_sweeps,
        poisson_wavefront,
    )

    Z, Y, X = 16, 8, 16
    rng = np.random.default_rng(7)
    h32 = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    h16 = h32.astype(jnp.bfloat16)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    ref, _ = poisson_sweeps(h32, flags, rhs, tau=0.8, n_iters=12,
                            interpret=True)
    ref = np.asarray(ref, np.float64)

    hi, _ = poisson_wavefront(h16, flags, rhs, tau=0.8, n_iters=12,
                              interpret=True, stage_dtype=jnp.float32)
    lo, _ = poisson_wavefront(h16, flags, rhs, tau=0.8, n_iters=12,
                              interpret=True)  # auto = storage dtype
    err_hi = np.abs(np.asarray(hi, np.float64) - ref).max()
    err_lo = np.abs(np.asarray(lo, np.float64) - ref).max()
    assert err_hi <= err_lo + 1e-12, (err_hi, err_lo)
    # and it is a genuine bf16-storage result: error dominated by storage
    # rounding, not divergence
    assert err_hi < 2e-3, err_hi


@pytest.mark.slow
def test_wavefront_hint_matches_psi_grad_composition():
    """emit='hint' (trailing in-kernel grad stage) must reproduce the
    psi-substitution + grad_fields(ring_fix) composition it replaces
    (solve_H_int tail) to f32 tolerance."""
    from lbm_ferrofluid_tpu.ops.pallas.poisson import (
        poisson_wavefront,
        poisson_wavefront_hint_ok,
    )
    from lbm_ferrofluid_tpu.ops.pallas.stencil3d import grad_fields

    Z, Y, X = 16, 8, 16
    DX = 0.5
    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    assert poisson_wavefront_hint_ok(h.shape, h.dtype, 12)
    h_psi, psi = poisson_wavefront(h, flags, rhs, tau=0.8, n_iters=12,
                                   interpret=True)
    idx = (Ellipsis,) + (slice(1, -1),) * 3
    pad = [(0, 0)] * 2 + [(1, 1)] * 3
    psi_obs = jnp.pad(psi[idx], pad, mode="edge")
    psi_sub = jnp.where(flags == int(CellType.OBSTACLE), psi_obs, psi)
    want = -grad_fields(psi_sub, dx=DX, interpret=True)

    h_hint, hint = poisson_wavefront(h, flags, rhs, tau=0.8, n_iters=12,
                                     interpret=True, emit="hint", dx=DX)
    np.testing.assert_array_equal(np.asarray(h_hint), np.asarray(h_psi))
    np.testing.assert_allclose(
        np.asarray(hint), np.asarray(want), rtol=2e-5, atol=1e-8
    )


@pytest.mark.slow
def test_wavefront_h2_matches_hint_composition():
    """emit='h2' must equal |h_ext + H_int|^2 of the emit='hint' output
    (the in-register fold of the constant external field)."""
    from lbm_ferrofluid_tpu.ops.pallas.poisson import (
        poisson_wavefront,
        poisson_wavefront_hint_ok,
    )

    Z, Y, X = 16, 8, 16
    DX = 0.5
    HEXT = (0.0, 85.0, 0.0)
    rng = np.random.default_rng(12)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    assert poisson_wavefront_hint_ok(h.shape, h.dtype, 12)
    h_hint, hint = poisson_wavefront(h, flags, rhs, tau=0.8, n_iters=12,
                                     interpret=True, emit="hint", dx=DX)
    hext = jnp.asarray(HEXT, jnp.float32).reshape(1, 3, 1, 1, 1)
    want = jnp.sum((hint + hext) ** 2, axis=1, keepdims=True)

    h_h2, h2 = poisson_wavefront(h, flags, rhs, tau=0.8, n_iters=12,
                                 interpret=True, emit="h2", dx=DX,
                                 h_ext=HEXT)
    np.testing.assert_array_equal(np.asarray(h_h2), np.asarray(h_hint))
    assert h2.shape == (1, 1, Z, Y, X)
    np.testing.assert_allclose(
        np.asarray(h2), np.asarray(want), rtol=2e-5, atol=1e-6
    )


def test_solve_H_int_h2_ext_consistency():
    """solve_H_int(h2_ext=...) == |h_ext + solve_H_int()|^2 on the jnp
    fallback path (the exact composition ferrofluid_step used to open-code
    against the stored constant H_ext array)."""
    from lbm_ferrofluid_tpu.ops import solve_H_int
    from lbm_ferrofluid_tpu.ops.stencils import staggered

    Z, Y, X = 8, 8, 16
    HEXT = (0.0, 85.0, 0.0)
    rng = np.random.default_rng(13)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    phi = jnp.asarray(rng.uniform(-1, 1, (1, 1, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    H = jnp.zeros((1, 3, Z, Y, X), jnp.float32).at[:, 1].set(85.0)
    H_mac = list(staggered(H, mode="replicate"))

    H_int, h1 = solve_H_int(D3Q19, h, phi, flags, H_mac, tau=1.0, n_iters=5)
    want = jnp.sum((H + H_int) ** 2, axis=1, keepdims=True)
    H2, h2 = solve_H_int(D3Q19, h, phi, flags, H_mac, tau=1.0, n_iters=5,
                         h2_ext=HEXT)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h1))
    np.testing.assert_allclose(
        np.asarray(H2), np.asarray(want), rtol=1e-6, atol=1e-6
    )
