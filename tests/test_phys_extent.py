"""Padded transposed TPU layout (params.phys_extent) equivalence.

Round-4 verdict #2: the reference's native demo resolutions are
lane-unaligned, so the fused fast path never engaged on them.
scenes.rosensweig_3d_tpu maps the OPEN (periodic) field axis onto the
array z axis (no alignment constraint; the kernels' z-wrap IS the right
boundary condition) and OBSTACLE-pads the two walled axes to lane/sublane
alignment — full-way bounce-back is absorbing (the lag-2 self-reflection),
so interior physics is invariant under wall thickening, PROVIDED the
reference's array-face-tied behaviors are reproduced at the physical box
faces: contact-angle surgery, fai/prho/laplacian boundary-ring fixes,
magnetic-gradient substitution.  These tests compare the padded layout
against the plain rosensweig_3d scene at the same physical resolution
(fields transposed back via scenes.phys_view); agreement is at the
reassociation/FMA level (the transposed lattice visits the q taps in a
different physical order), the hw_validate class of bars.
"""

import os

import numpy as np
import pytest

from lbm_ferrofluid_tpu.models import scenes
from lbm_ferrofluid_tpu.models.ferrofluid import (
    ferrofluid_step_impl,
    prime_premac,
)

RES = (18, 10, 18)  # physical (z_p, y_p, x_p)

FIELDS = (("density", 0), ("pressure", 0), ("rho", 0), ("vel", 1))


def run_plain(steps):
    params, s = scenes.rosensweig_3d(res=RES)
    s = prime_premac(params, s)
    for _ in range(steps):
        s = ferrofluid_step_impl(params, s)
    return params, s


def check(params_a, sa, sb, rtol):
    for name, vec in FIELDS:
        a = np.asarray(
            scenes.phys_view(params_a, getattr(sa, name), vector=bool(vec))
        )
        b = np.asarray(getattr(sb, name))
        scale = np.abs(b).max() + 1e-30
        d = np.abs(a - b).max() / scale
        assert d < rtol, (name, d)


def test_padded_layout_matches_plain_jnp():
    """Generic (jnp) path on the padded layout vs the plain scene."""
    params_a, sa = scenes.rosensweig_3d_tpu(res=RES)
    assert sa.rho.shape[2:] == (10, 24, 128)
    sa = prime_premac(params_a, sa)
    assert sa.h.shape[1] == 2, "scalar carry must engage on the padded layout"
    for _ in range(8):
        sa = ferrofluid_step_impl(params_a, sa)
    _, sb = run_plain(8)
    check(params_a, sa, sb, 3e-5)


@pytest.mark.slow
def test_padded_layout_fused_matches_plain_jnp():
    """FUSED path (interpret-mode capillogue with phys-extent bounds,
    mac-carry, scalar wavefront) on the padded layout vs the plain jnp
    scene — the round-5 probe: the full fast machinery at a native
    (unaligned) physical resolution."""
    os.environ["LBM_FORCE_FASTPATH"] = "interpret"
    try:
        params_a, sa = scenes.rosensweig_3d_tpu(res=RES)
        sa = prime_premac(params_a, sa)
        assert sa.premac is not None and len(sa.premac) == 5
        assert sa.h.shape[1] == 2
        for _ in range(8):
            sa = ferrofluid_step_impl(params_a, sa)
    finally:
        del os.environ["LBM_FORCE_FASTPATH"]
    _, sb = run_plain(8)
    check(params_a, sa, sb, 5e-5)


def test_phys_view_roundtrip():
    params, s = scenes.rosensweig_3d_tpu(res=RES)
    v = scenes.phys_view(params, s.vel, vector=True)
    assert v.shape == (1, 3, 18, 10, 18)
    d = scenes.phys_view(params, s.density)
    assert d.shape == (1, 1, 18, 10, 18)
    # density matches the plain scene's init exactly
    _, sb = scenes.rosensweig_3d(res=RES)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(sb.density))


def test_no_convert_outside_box_fluid():
    """A padded layout whose pad is not all-OBSTACLE must not engage the
    collapse (the _mag_boundary_only phys_extent contract)."""
    import dataclasses

    import jax.numpy as jnp

    from lbm_ferrofluid_tpu.models.ferrofluid import _scalar_convert

    params, s = scenes.rosensweig_3d_tpu(res=RES)
    bad = np.asarray(s.magnetic_flags).copy()
    bad[..., 5, 20, 60] = 1  # FLUID cell in the pad
    s2 = dataclasses.replace(s, magnetic_flags=jnp.asarray(bad))
    assert _scalar_convert(params, s2) is None
