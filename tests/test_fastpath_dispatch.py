"""Step-level dispatch tests of the single-device fused fast path, off-TPU.

The single-device fastpath (fused prologue/epilogue, mac-carry, capillogue)
gates on ``jax.default_backend() == "tpu"`` and so was previously reachable
only on hardware.  ``LBM_FORCE_FASTPATH=interpret`` threads Pallas interpret
mode through the SAME dispatch code (models/ferrofluid.py), letting pytest
exercise the full capillogue steady state: priming, the 6-tuple premac rhs
carry, the elided phi materialization (state.phi is None; models.phi_field
derives it), and multi-step agreement with the jnp path.

Kernel-level equivalence is covered elsewhere (test_capillogue.py,
test_fused_step.py); this file covers the MODEL-level wiring between them.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    ferrofluid_step_impl,
    init_ferrofluid_state,
    phi_field,
    prime_premac,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas: fast tier skips

RES = (8, 16, 128)  # z, y, x — lane/sublane aligned so the kernels engage


def _params(**kw):
    return SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=4, **kw,
    )


def _state(params):
    res = RES
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((1, 1, *res), params.rho_gas, np.float32)
    den = np.full((1, 1, *res), params.density_gas, np.float32)
    rho[..., : res[1] // 2, :] = params.rho_fluid
    den[..., : res[1] // 2, :] = params.density_fluid
    rho[0, 0][flags[0, 0] == int(CellType.OBSTACLE)] = params.rho_fluid
    den[0, 0][flags[0, 0] == int(CellType.OBSTACLE)] = params.density_fluid
    vel = np.zeros((1, 3, *res), np.float32)
    return init_ferrofluid_state(params, rho, den, vel, flags, mflags)


def test_forced_fastpath_capillogue_steady_state(monkeypatch):
    monkeypatch.setenv("LBM_FORCE_FASTPATH", "interpret")

    params = _params()
    state = prime_premac(params, _state(params))
    # capillogue config at this size: premac carries the pre-scaled rhs
    # as a 6th leaf and phi is not materialized
    assert state.premac is not None and len(state.premac) == 6
    assert state.phi is None and state.force is None

    import jax

    step = jax.jit(lambda s: ferrofluid_step_impl(params, s))
    for _ in range(3):
        state = step(state)
    assert state.premac is not None and len(state.premac) == 6
    # structure-stable carry (lax.scan safe): elided diagnostics stay None
    assert state.phi is None and state.force is None

    # jnp reference path from the same init
    monkeypatch.delenv("LBM_FORCE_FASTPATH")
    pj = _params(use_pallas=False)
    sj = _state(pj)
    step_j = jax.jit(lambda s: ferrofluid_step_impl(pj, s))
    for _ in range(3):
        sj = step_j(sj)

    for name in ("f", "g", "density", "vel", "pressure"):
        a = np.asarray(getattr(state, name), np.float64)
        b = np.asarray(getattr(sj, name), np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert rel <= 2e-5, f"{name}: max rel dev {rel:.2e}"
    # round 5: the fastpath rides the scalar carry even where the jnp
    # reference (use_pallas=False, never primed) keeps channel h —
    # compare through the collapse contract, as hw_validate does
    from lbm_ferrofluid_tpu.ops.scalar_poisson import compare_views

    assert state.h.shape[1] == 2 and sj.h.shape[1] == 19
    av, bv = compare_views(state.h, sj.h, state.magnetic_flags)
    rel = (
        np.abs(np.asarray(av) - np.asarray(bv)).max()
        / max(np.abs(np.asarray(bv)).max(), 1e-30)
    )
    assert rel <= 2e-5, f"h (collapse contract): max rel dev {rel:.2e}"

    # phi_field derives phi from the carried density; matches the jnp
    # definition applied to the SAME density exactly
    phi = np.asarray(phi_field(params, state))
    expect = np.asarray(
        -(2.0 * (state.density - params.density_gas)
          / (params.density_fluid - params.density_gas) - 1.0)
    )
    np.testing.assert_array_equal(phi, expect)
    assert np.isfinite(phi).all()

    # non-carried states still store phi directly
    assert sj.phi is not None
    np.testing.assert_array_equal(np.asarray(phi_field(pj, sj)), sj.phi)


def test_forced_fastpath_epilogue_emit_mac(monkeypatch):
    """With the capillogue gated off, the forced fastpath must take the
    epilogue emit_mac route: premac stays a 5-tuple and phi a real array."""
    import lbm_ferrofluid_tpu.models.ferrofluid as ff
    import lbm_ferrofluid_tpu.ops.pallas.capillogue as cap

    monkeypatch.setenv("LBM_FORCE_FASTPATH", "interpret")
    monkeypatch.setattr(cap, "capillogue_fits", lambda shape, dtype: False)

    params = _params()
    state = prime_premac(params, _state(params))
    assert state.premac is not None and len(state.premac) == 5
    assert state.phi is not None

    import jax

    step = jax.jit(lambda s: ff.ferrofluid_step_impl(params, s))
    for _ in range(2):
        state = step(state)
    assert state.premac is not None and len(state.premac) == 5
    assert state.phi is not None

    monkeypatch.delenv("LBM_FORCE_FASTPATH")
    pj = _params(use_pallas=False)
    sj = _state(pj)
    step_j = jax.jit(lambda s: ferrofluid_step_impl(pj, s))
    for _ in range(2):
        sj = step_j(sj)
    for name in ("f", "g", "density", "vel"):
        a = np.asarray(getattr(state, name), np.float64)
        b = np.asarray(getattr(sj, name), np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert rel <= 2e-5, f"{name}: max rel dev {rel:.2e}"
    np.testing.assert_allclose(
        np.asarray(state.phi), np.asarray(sj.phi), rtol=1e-6, atol=1e-6
    )


def test_forced_fastpath_h_ext_axis_z_scan_stable(monkeypatch):
    """h_ext_axis=2 (z-directed field): no rhs carry (the staggered
    difference is out-of-plane, _capillogue_rhs_cfg is None), so the
    capillogue path must KEEP phi/force as arrays — regression for the
    scan-carry structure flip (the branch once passed emit_force=False
    unconditionally while prime_premac primed force as an array)."""
    from lbm_ferrofluid_tpu.models import SimulationRunner

    monkeypatch.setenv("LBM_FORCE_FASTPATH", "interpret")
    params = _params(h_ext_axis=2)
    state = prime_premac(params, _state(params))
    assert state.premac is not None and len(state.premac) == 5
    assert state.phi is not None and state.force is not None

    runner = SimulationRunner(params, ferrofluid_step_impl)
    state = runner.run(state, 2)  # lax.scan: carry structure must hold
    assert state.phi is not None and state.force is not None
    assert np.isfinite(np.asarray(state.density)).all()


def _h_pair_scalar(state, sj):
    """Comparable views of the scalar-carry h vs the channel-form
    reference (shared collapse-contract helper — same masking as
    tools/hw_validate.py)."""
    from lbm_ferrofluid_tpu.ops.scalar_poisson import compare_views

    a, b = compare_views(state.h, sj.h, sj.magnetic_flags)
    return np.asarray(a, np.float64), np.asarray(b, np.float64)


def _run_scalar_carry_case(monkeypatch, premac_len, gate_off_capillogue):
    """Shared body: prime with mag_flags_shell=True, assert the scalar
    (s, s_prev) carry engages, run 3 steps, compare against the jnp
    channel-form path through the collapse contract."""
    import jax

    import lbm_ferrofluid_tpu.ops.pallas.capillogue as cap

    monkeypatch.setenv("LBM_FORCE_FASTPATH", "interpret")
    if gate_off_capillogue:
        monkeypatch.setattr(
            cap, "capillogue_fits", lambda shape, dtype: False
        )

    params = _params(mag_flags_shell=True)
    state = prime_premac(params, _state(params))
    # the tau==1 scalar collapse must engage regardless of the capillogue
    # gate (round-4 decoupling): h is the fused (s, s_prev) pair
    assert state.h.shape[1] == 2 and state.h.dtype == jnp.float32
    assert state.cmask is not None
    assert state.premac is not None and len(state.premac) == premac_len

    step = jax.jit(lambda s: ferrofluid_step_impl(params, s))
    for _ in range(3):
        state = step(state)
    assert state.h.shape[1] == 2
    assert state.premac is not None and len(state.premac) == premac_len

    monkeypatch.delenv("LBM_FORCE_FASTPATH")
    pj = _params(use_pallas=False, mag_flags_shell=True)
    sj = _state(pj)
    step_j = jax.jit(lambda s: ferrofluid_step_impl(pj, s))
    for _ in range(3):
        sj = step_j(sj)

    for name in ("f", "g", "density", "vel", "pressure"):
        a = np.asarray(getattr(state, name), np.float64)
        b = np.asarray(getattr(sj, name), np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert rel <= 2e-5, f"{name}: max rel dev {rel:.2e}"
    a, b = _h_pair_scalar(state, sj)
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
    assert rel <= 2e-5, f"h (collapse contract): max rel dev {rel:.2e}"
    return params, state


def test_forced_fastpath_scalar_carry_capillogue(monkeypatch, tmp_path):
    params, state = _run_scalar_carry_case(
        monkeypatch, premac_len=6, gate_off_capillogue=False
    )
    # steady-state elisions hold alongside the scalar carry
    assert state.phi is None and state.force is None

    # checkpoint round-trip of the scalar-carry state (2-ch h + cmask)
    from lbm_ferrofluid_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    path = tmp_path / "ck_scalar.npz"
    save_checkpoint(path, state)
    back = load_checkpoint(path, state)
    assert back.h.shape[1] == 2
    np.testing.assert_array_equal(np.asarray(back.h), np.asarray(state.h))
    np.testing.assert_array_equal(
        np.asarray(back.cmask), np.asarray(state.cmask)
    )


def test_forced_fastpath_scalar_carry_epilogue(monkeypatch):
    """The decoupled combination: capillogue gated OFF (as for f32 at
    256^3 planes), scalar carry still primes — the step runs the scalar
    wavefront + capmac/hcz_capillary + emit_mac epilogue."""
    params, state = _run_scalar_carry_case(
        monkeypatch, premac_len=5, gate_off_capillogue=True
    )
    # non-capillogue path keeps phi/force as arrays (scan structure)
    assert state.phi is not None and state.force is not None


def test_checkpoint_roundtrip_phi_none(monkeypatch, tmp_path):
    """The capillogue steady-state (phi=None, 6-leaf premac) checkpoints."""
    from lbm_ferrofluid_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    monkeypatch.setenv("LBM_FORCE_FASTPATH", "interpret")
    params = _params()
    state = prime_premac(params, _state(params))
    assert state.phi is None
    path = tmp_path / "ck.npz"
    save_checkpoint(path, state)
    back = load_checkpoint(path, state)
    assert back.phi is None
    np.testing.assert_array_equal(
        np.asarray(back.premac[5]), np.asarray(state.premac[5])
    )
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))
