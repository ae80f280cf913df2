"""Measure whether the f32 capillogue fusion fits VMEM at 256^2 planes.

VERDICT r3 #6 asked for the f32 capillogue (via compact-ring techniques)
"or a measured OOM/negative result documented".  The ring arithmetic says
it cannot fit (docs/PERFORMANCE.md): the f/g input rings are structurally
4-slot minimal — the collide window p = t-2 spans planes t-3..t-1 with
plane t in flight, so a 3-slot ring would overwrite a plane still read by
the NEXT body (unlike the emit_mac epilogue, whose window tracks the
landing plane and admits the compact 3-slot layout) — leaving fixed rings
at ~100 MB even with the seam stash moved to HBM, plus ~20 MB of Mosaic
scoped temporaries (the 38 re-streamed f32 collide planes + the grad
stage) against the 120 MB budget.

This tool forces capillogue_fits True for f32 at the given resolution and
attempts ONE compiled step on the real chip, recording the Mosaic error
(expected: VMEM OOM) or — if it surprisingly fits — a timing.

Usage:  python tools/probe_capillogue_f32.py [Z Y X]
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    res = (256, 256, 256)
    if len(sys.argv) >= 4:
        res = tuple(int(x) for x in sys.argv[1:4])

    import jax

    import bench
    import lbm_ferrofluid_tpu.ops.pallas.capillogue as cap
    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        ferrofluid_step_impl,
        prime_premac,
    )
    from lbm_ferrofluid_tpu.models.runner import sync
    from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"probe: f32 capillogue at {res} (gate forced True)", flush=True)
    cap.capillogue_fits = lambda shape, dtype: True

    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=30, h_dtype="float32", fg_dtype="float32",
        mag_flags_shell=True,
    )
    state = bench.build_state(params, res)
    state = prime_premac(params, state)
    assert state.premac is not None and len(state.premac) == 6, (
        "forced capillogue priming did not engage"
    )
    step = jax.jit(lambda s: ferrofluid_step_impl(params, s),
                   donate_argnums=0)
    try:
        t0 = time.time()
        state = step(state)
        sync(state)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            state = step(state)
        sync(state)
        dt = (time.time() - t0) / 5
        cells = float(np.prod(res))
        print(f"SURPRISE: f32 capillogue COMPILED AND RAN: "
              f"{dt * 1e3:.1f} ms/step = {cells / dt / 1e6:.1f} MLUPS "
              f"[compile+1st {tc:.0f}s]", flush=True)
    except Exception as e:
        msg = str(e)
        print(f"RESULT: f32 capillogue fails as predicted: "
              f"{type(e).__name__}: {msg[:600]}", flush=True)


if __name__ == "__main__":
    main()
