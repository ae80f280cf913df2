"""3D Rosensweig SPIKE-PATTERN parity vs the CUDA/torch reference.

Closes BASELINE.json's "spike-pattern parity vs CUDA ref" clause for the
north-star scene (demo_3d_LBM_Rosensweig_instability.py:151-207) at
64x33x64, mag=100, gravity=1e-4, 4000 steps — through spike FORMATION
(amp_std grows 0.3 -> 3.5 interface cells; the dominant wavenumber
transitions k=4 -> k=3 as spikes coarsen past the linear stage).

Both runs start from the SAME stored +/-1-cell perturbed pool height
(tools/run_rosensweig_spikes_ref.py seeds and stores it), so the
instability's growth is comparable rather than seeded by each
implementation's rounding noise.  Metrics (tools/spike_metric.py) on the
sub-cell interface height field per 500-step snapshot:

  * same dominant FFT wavenumber (exact bin, including the 4->3
    transition at step 3000),
  * roughness amplitude ratio,
  * height-field correlation.

Measured (ours: f32 with the tau==1 scalar carry's exact-order jnp
sweeps — the round-5 production path at this unaligned resolution; ref:
torch CPU f32): amp_ratio within 4.4e-4 of 1, correlation >=
0.99999987, identical k at every snapshot (regenerated 2026-08-20; the
pre-scalar-carry channel path measured 7e-5 / 0.99999996 — the shift is
the FMA-contraction-class difference of the collapse, amplified over
4000 chaotic steps).  Tolerances sit ~20x above the measured deviation
and still far below any physically meaningful pattern difference (a
one-bin k shift or a 1% amplitude error would fail).

The compared .npz files are committed; regenerate with
tools/run_rosensweig_spikes_{ref,ours}.py if scene semantics change.
"""

import pathlib
import sys

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
REF = GOLDEN / "rosensweig3d_spikes_ref.npz"
OURS = GOLDEN / "rosensweig3d_spikes_ours_f32.npz"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


@pytest.mark.skipif(
    not (REF.exists() and OURS.exists()), reason="spike goldens not generated"
)
def test_rosensweig3d_spike_pattern_parity():
    from tools.spike_metric import compare_runs

    ref = np.load(REF)
    ours = np.load(OURS)
    steps = sorted(
        int(k.split("_")[1]) for k in ref.files if k.startswith("den_")
    )
    assert steps and steps[-1] >= 4000, steps
    checked = 0
    for step in steps:
        key = f"den_{step}"
        if key not in ours.files:
            continue
        m = compare_runs(ref[key][0, 0], ours[key][0, 0])
        assert m["ref"]["k_dominant"] == m["ours"]["k_dominant"], (
            step, m["ref"]["k_dominant"], m["ours"]["k_dominant"])
        assert abs(m["amp_ratio"] - 1.0) <= 1e-2, (step, m["amp_ratio"])
        assert m["height_correlation"] >= 0.999, (
            step, m["height_correlation"])
        checked += 1
    assert checked >= 8  # every 500-step snapshot through spike formation

    # the coarsening transition itself is reproduced: k drops 4 -> 3
    from tools.spike_metric import interface_height, spike_stats

    k_of = {
        s: spike_stats(interface_height(ours[f"den_{s}"][0, 0]))["k_dominant"]
        for s in (2500, 3000)
    }
    assert k_of[2500] == 4 and k_of[3000] == 3, k_of


TURBO = GOLDEN / "rosensweig3d_spikes_ours_turbo.npz"


@pytest.mark.skipif(
    not (REF.exists() and TURBO.exists()),
    reason="turbo spike golden not generated",
)
def test_rosensweig3d_spike_turbo_same_regime():
    """bf16 (turbo) storage on the chaotic spike scene: the trajectory is
    legitimately offset (bf16 rounding seeds the instability harder — the
    k=4->3 coarsening happens earlier), but by step 4000 the run must sit
    in the SAME regime as the f32 reference: identical dominant
    wavenumber, amplitude within a factor ~1.3 (measured 1.29), interface
    still substantially correlated (measured 0.83)."""
    from tools.spike_metric import compare_runs

    ref = np.load(REF)
    turbo = np.load(TURBO)
    m = compare_runs(ref["den_4000"][0, 0], turbo["den_4000"][0, 0])
    assert m["ref"]["k_dominant"] == m["ours"]["k_dominant"], m
    assert 0.6 < m["amp_ratio"] < 1.7, m["amp_ratio"]
    assert m["height_correlation"] > 0.5, m["height_correlation"]
