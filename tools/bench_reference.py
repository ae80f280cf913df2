"""Measure the torch REFERENCE implementation's step rate, side by side
with ours, on the same configuration — round-4 verdict #6: make
"matching-or-beating the reference on performance" a measured fact.

The reference publishes no numbers (BASELINE.md) and no GPU exists in this
environment, but the torch implementation runs on this box's CPU (the same
harness tools/gen_golden.py uses for goldens).  This times:

  * reference (torch CPU, f32): the exact demo step loop
    (demo_3d_LBM_Rosensweig_instability.py:151-207) at the spike-parity
    config 64x33x64, 30 Poisson iters/step,
  * ours on the SAME config: CPU jnp (channel + scalar-carry legs) and,
    when run under the TPU backend, the TPU jnp path.

Usage:
    python tools/bench_reference.py ref          # torch reference (CPU)
    JAX_PLATFORMS=cpu python tools/bench_reference.py ours
    python tools/bench_reference.py ours         # TPU backend
One JSON line per leg; paste results into BASELINE.md.
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
import time

import numpy as np

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin overrides the env var alone (CLAUDE.md)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


RES = (64, 33, 64)  # (z, y, x) — the spike-parity / golden config
STEPS = 10
MAG = 100.0
GRAVITY = 1e-4


def bench_ref():
    import types

    for name in ("mcubes",):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, "/root/reference")
    import torch

    from src.LBM.simulation import SimulationParameters, SimulationRunner
    from src.LBM.utils import CellType, get_staggered

    res = RES
    dt32 = torch.float32
    sp = SimulationParameters(
        dim=3, dtype=dt32, device=torch.device("cpu"),
        simulation_size=(1, 1, *res), dt=1.0,
        density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=19,
        contact_angle=torch.tensor([0.5 * math.pi], dtype=dt32),
        kappa=0.01, tau_f=0.68, tau_g=0.68, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.set_gravity(gravity=GRAVITY)
    mgf = runner.create_LBM_magnetic()

    flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)

    rho = torch.full((1, 1, *res), 0.02381, dtype=dt32)
    den = torch.full((1, 1, *res), 0.02381, dtype=dt32)
    rho[..., : int(0.5 * res[1]), :] = 0.2508
    den[..., : int(0.5 * res[1]), :] = 0.2508
    rho[flags == int(CellType.OBSTACLE)] = 0.2508
    den[flags == int(CellType.OBSTACLE)] = 0.2508

    vel = torch.zeros((1, 3, *res), dtype=dt32)
    force = torch.zeros((1, 3, *res), dtype=dt32)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(dx=1.0, dt=1.0, rho=rho, vel=vel, density=den,
                      pressure=pressure, force=force, feq=f)
    h = torch.zeros_like(f)
    H_ext = torch.zeros((1, 3, *res), dtype=dt32)
    H_ext[:, 1, ...] = MAG
    H_ext_mac = get_staggered(H_ext, mode="replicate")

    def step():
        nonlocal f, g, h, rho, vel, den, pressure, force
        f = prop.propagation(f=f)
        g = prop.propagation(f=g)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags, density=den
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        g = prop.rebounce_obstacle(f=g, flags=flags)
        phi = -(2.0 * (den - 0.02381) / (0.2508 - 0.02381) - 1.0)
        for _i in range(30):
            h = prop.propagation(f=h)
            h = prop.rebounce_obstacle(f=h, flags=mflags)
            H_int, h = mgf.get_H_int(
                dt=1.0, dx=1.0, phi=phi, flags=mflags,
                H_ext_mac=H_ext_mac, h=h,
            )
        H2 = ((H_ext + H_int) * (H_ext + H_int)).sum(dim=1).unsqueeze(1)
        rho, vel, den, pressure, force, dfai, dprho = coll.capillary_process(
            rho=rho, vel=vel, flags=flags, force=force, dt=1.0, dx=1.0,
            g=g, density=den, pressure=pressure, H2=H2, phi=phi,
        )
        f, g = coll.collision(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, density=den, flags=flags,
            force=force, g=g, pressure=pressure, dfai=dfai, dprho=dprho,
            KBC_type=None,
        )

    step()  # warmup (allocator)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = time.perf_counter() - t0
    sites = int(np.prod(RES))
    print(json.dumps({
        "leg": "reference_torch_cpu_f32", "res": list(RES), "steps": STEPS,
        "seconds": round(dt, 3), "mlups": round(sites * STEPS / dt / 1e6, 3),
    }))


def bench_ours():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import subprocess  # noqa: F401

    import jax

    from lbm_ferrofluid_tpu.models import scenes
    from tools.bench_native_res import bench_leg

    from lbm_ferrofluid_tpu.models.ferrofluid import prime_premac

    params, raw = scenes.rosensweig_3d(res=RES, mag_strength=MAG,
                                       gravity=GRAVITY)
    mlups_a, dt_a, _ = bench_leg(params, raw, STEPS)
    print(json.dumps({
        "leg": f"ours_channel_jnp_{jax.default_backend()}", "res": list(RES),
        "steps": STEPS, "seconds": round(dt_a, 3),
        "mlups": round(mlups_a, 3),
    }), flush=True)
    params, raw = scenes.rosensweig_3d(res=RES, mag_strength=MAG,
                                       gravity=GRAVITY)
    primed = prime_premac(params, raw)
    mlups_b, dt_b, _ = bench_leg(params, primed, STEPS)
    print(json.dumps({
        "leg": f"ours_scalar_carry_{jax.default_backend()}",
        "engaged": primed.h.shape[1] == 2, "res": list(RES),
        "steps": STEPS, "seconds": round(dt_b, 3),
        "mlups": round(mlups_b, 3),
    }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ref"
    if mode == "ref":
        bench_ref()
    else:
        bench_ours()
