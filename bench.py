#!/usr/bin/env python
"""Benchmark: MLUPS/chip on the 256^3 D3Q19 Rosensweig ferrofluid workload.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MLUPS", "vs_baseline": N}

The workload is the reference's north-star configuration
(demo_3d_LBM_Rosensweig_instability.py defaults scaled to 256^3): D3Q19
HCZ multiphase + magnetic Poisson sub-solve (30 inner sweeps/step) +
gravity + Kelvin force.  MLUPS counts *outer* steps x cells.

Falls back to smaller grids on OOM so the bench always reports a number;
the resolution used is included in the JSON.
"""

from __future__ import annotations

import json
import sys

import numpy as np

BASELINE_TARGET_MLUPS = 2000.0  # driver-set north star (BASELINE.json)


def build_state(params, res):
    from lbm_ferrofluid_tpu import CellType
    from lbm_ferrofluid_tpu.models import init_ferrofluid_state

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


def run(res, n_steps=20, warmup=3, h_dtype="float32"):
    import jax

    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        SimulationRunner,
        ferrofluid_step_impl,
    )

    params = SimulationParams(
        dim=3,
        density_gas=0.02381,
        density_fluid=0.2508,
        rho_gas=0.02381,
        rho_fluid=0.2508,
        kappa=0.01,
        tau_f=0.68,
        tau_g=0.68,
        gravity=1e-4,
        mag_strength=85.0,
        poisson_iters=30,
        h_dtype=h_dtype,
    )
    state = build_state(params, res)
    runner = SimulationRunner(params, ferrofluid_step_impl)
    state, stats = runner.benchmark(state, n_steps=n_steps, warmup=warmup)
    if not bool(jax.numpy.isfinite(state.density).all()):
        raise FloatingPointError("bench produced non-finite fields")
    return stats


def main():
    res = (256, 256, 256)
    if len(sys.argv) > 1:
        res = tuple(int(x) for x in sys.argv[1:4])

    stats = None
    tried = []
    for candidate in [res, (192, 192, 192), (128, 128, 128), (64, 64, 64)]:
        try:
            # headline: bf16-storage h (f32 in-register compute; documented
            # non-bit-parity production mode), plus the f32 parity-mode number
            stats = run(candidate, h_dtype="bfloat16")
            stats_f32 = run(candidate, h_dtype="float32")
            res = candidate
            break
        except Exception as e:  # OOM or compile failure: shrink
            tried.append(f"{candidate}: {type(e).__name__}")
            continue
    if stats is None:
        print(json.dumps({"metric": "MLUPS_2563_rosensweig", "value": 0.0,
                          "unit": "MLUPS", "vs_baseline": 0.0, "error": tried}))
        return

    value = round(stats["mlups"], 2)
    out = {
        "metric": "MLUPS/chip D3Q19 Rosensweig (HCZ+mag, 30 Poisson iters/step)",
        "value": value,
        "unit": "MLUPS",
        "vs_baseline": round(value / BASELINE_TARGET_MLUPS, 4),
        "res": list(res),
        "steps": stats["steps"],
        "seconds": round(stats["seconds"], 3),
        "h_storage": "bfloat16 (f32 compute); f32 parity mode below",
        "f32_parity_mlups": round(stats_f32["mlups"], 2),
    }
    if tried:
        out["fallbacks"] = tried
    print(json.dumps(out))


if __name__ == "__main__":
    main()
