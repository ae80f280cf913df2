"""Long-horizon physics tracking: bf16 f/g/h storage vs f32 (turbo mode).

VERDICT r1 #3: bf16 storage halves the dominant HBM traffic but is not
bit-parity with the reference — so the claim that it is *physically*
faithful needs long-horizon evidence, not an 8-step golden.  This runs
2000 steps of the 2D Rosensweig configuration (HCZ + 30-sweep magnetic
Poisson + KBC_A on g + gravity + Kelvin force — every term of the flagship
physics) in both precisions.

What to assert is physics-driven: the Rosensweig instability amplifies ANY
perturbation, so beyond its onset pointwise trajectories in different
precisions must diverge in spike *phase* (measured here: <=1 cell interface
difference at step 1000, ~4 cells by step 2000 as spikes pick positions).
The honest long-horizon claims are therefore (a) trajectory tracking through
instability onset, and (b) conserved/statistical agreement beyond it.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.models import SimulationRunner, ferrofluid_step_impl
from lbm_ferrofluid_tpu.models.scenes import rosensweig_2d

pytestmark = pytest.mark.slow  # interpret-mode Pallas / long-horizon: fast tier skips

CHECKPOINTS = (1000, 2000)


def _run(fg_dtype, h_dtype):
    params, state = rosensweig_2d(res=(64, 64), mag_strength=100.0)
    params = params.replace(fg_dtype=fg_dtype, h_dtype=h_dtype)
    state = dataclasses.replace(
        state,
        f=state.f.astype(jnp.dtype(fg_dtype)),
        g=state.g.astype(jnp.dtype(fg_dtype)),
        h=state.h.astype(jnp.dtype(h_dtype)),
    )
    runner = SimulationRunner(params, ferrofluid_step_impl)
    mid = 0.5 * (params.density_gas + params.density_fluid)
    fluid = np.asarray(state.flags) == int(CellType.FLUID)

    out, done = {}, 0
    for t in CHECKPOINTS:
        state = runner.run(state, t - done)
        done = t
        den = np.asarray(state.density, np.float64)
        rho = np.asarray(state.rho, np.float64)
        out[t] = {
            "finite": bool(np.isfinite(den).all()),
            # pool fill height per column (cells above the density midpoint)
            "heights": (den[0, 0] > mid).sum(axis=0).astype(float),
            "mass": (rho[0, 0] * fluid[0, 0]).sum(),
        }
    return out


def test_bf16_storage_tracks_f32_interface_dynamics():
    a = _run("float32", "float32")
    b = _run("bfloat16", "bfloat16")

    for t in CHECKPOINTS:
        assert b[t]["finite"], f"bf16 non-finite at step {t}"
        # conserved mass tracks at every horizon
        np.testing.assert_allclose(b[t]["mass"], a[t]["mass"], rtol=5e-3)

    # the dynamics are live: the interface corrugated away from the flat pool
    h32_2k = a[2000]["heights"]
    assert h32_2k.max() - h32_2k.min() >= 2

    # (a) pointwise tracking through instability onset
    d1k = np.abs(b[1000]["heights"] - a[1000]["heights"])
    assert d1k.max() <= 2, (b[1000]["heights"].tolist(), a[1000]["heights"].tolist())

    # (b) statistical agreement beyond onset: mean interface level matches,
    # and the corrugation amplitude is in the same growth regime (during
    # exponential spike growth a fixed-time amplitude is sensitive to any
    # perturbation, so compare scale, not value)
    h16_2k = b[2000]["heights"]
    assert abs(h16_2k.mean() - h32_2k.mean()) <= 1.0
    amp32 = h32_2k.max() - h32_2k.min()
    amp16 = h16_2k.max() - h16_2k.min()
    assert amp16 >= 2 and amp32 >= 2, "no corrugation developed"
    assert 0.3 * amp32 <= amp16 <= 3.0 * amp32, (amp16, amp32)
    assert np.abs(h16_2k - h32_2k).mean() <= 3.0
