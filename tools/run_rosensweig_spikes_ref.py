"""Run the REFERENCE 3D Rosensweig scene (torch CPU, f32) to spike formation.

Produces tests/golden/rosensweig3d_spikes_ref.npz: the perturbed initial
condition (shared verbatim with our run — tools/run_rosensweig_spikes_ours.py)
plus density snapshots every ``SNAP`` steps, for the spike-pattern parity
metric (tools/spike_metric.py; BASELINE.json "spike-pattern parity").

Scene: demo_3d_LBM_Rosensweig_instability.py:151-207 at 64x33x64, mag=100,
with a deterministic ±1-cell integer perturbation of the pool fill height
(seeded numpy RNG, stored in the npz) so the instability's linear-growth
stage is comparable across implementations instead of being seeded by each
implementation's own rounding noise.
"""

from __future__ import annotations

import math
import pathlib
import sys
import types

import numpy as np

for name in ("mcubes",):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from src.LBM.simulation import SimulationParameters, SimulationRunner  # noqa: E402
from src.LBM.utils import CellType, get_staggered  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
RES = (64, 33, 64)  # (z, y, x)
MAG = 100.0
GRAVITY = 1e-4
STEPS = 4000
SNAP = 500
SEED = 20260818


def perturbed_scene(res=RES, seed=SEED):
    """Pool at y < res[1]//2 with a seeded ±1-cell height perturbation."""
    rng = np.random.default_rng(seed)
    base = res[1] // 2
    bump = rng.integers(-1, 2, size=(res[0], res[2]))  # [z, x] in {-1,0,1}
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    y = np.arange(res[1])[None, :, None]
    fill = y < (base + bump[:, None, :])  # [z, y, x]
    rho = np.where(fill, 0.2508, 0.02381)[None, None].astype(np.float32)
    den = rho.copy()
    wall = flags == int(CellType.OBSTACLE)
    rho[wall] = 0.2508
    den[wall] = 0.2508
    return flags, mflags, rho, den, bump


def main(steps=STEPS, snap=SNAP):
    torch.set_num_threads(8)
    dt32 = torch.float32
    res = RES
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

    flags_np, mflags_np, rho_np, den_np, bump = perturbed_scene()
    flags = torch.from_numpy(flags_np)
    mflags = torch.from_numpy(mflags_np)
    rho = torch.from_numpy(rho_np).to(dt32)
    den = torch.from_numpy(den_np).to(dt32)

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

    snaps = {}
    out_path = OUT / "rosensweig3d_spikes_ref.npz"

    def save():
        out = dict(flags=flags_np, mflags=mflags_np, rho0=rho_np,
                   den0=den_np, bump=bump, mag=np.array(MAG),
                   gravity=np.array(GRAVITY), seed=np.array(SEED))
        out.update(snaps)
        np.savez(out_path, **out)

    for step in range(1, steps + 1):
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
        if step % snap == 0:
            snaps[f"den_{step}"] = den.numpy().copy()
            save()  # incremental: a partial run still yields usable data
            from tools.spike_metric import interface_height, spike_stats

            s = spike_stats(interface_height(den.numpy()[0, 0]))
            print(f"step {step}: amp_std={s['amp_std']:.4f} "
                  f"k_dom={s['k_dominant']} lam={s['wavelength_cells']:.1f} "
                  f"|vel|max={float(vel.abs().max()):.4f}", flush=True)

    print("wrote", out_path)


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    if len(sys.argv) > 1:
        main(steps=int(sys.argv[1]))
    else:
        main()
