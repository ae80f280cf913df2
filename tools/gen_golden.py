"""Generate golden parity data by running the *reference* solver (torch CPU).

Run once:  python tools/gen_golden.py
Outputs tiny-grid field snapshots to tests/golden/*.npz which the parity
tests (tests/test_parity.py) compare against the TPU-native solvers.

This script is the only place that touches /root/reference; the framework
itself never imports it.  Grids are deliberately non-cubic to catch axis
transposition bugs.
"""

from __future__ import annotations

import math
import pathlib
import sys
import types

import numpy as np

# stub modules the reference imports but we don't need (and aren't installed)
for name in ("mcubes",):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from src.LBM.simulation import SimulationParameters, SimulationRunner  # noqa: E402
from src.LBM.utils import CellType, KBCType  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)

DEVICE = torch.device("cpu")
DTYPE = torch.float32


def _params(dim, res, **kw):
    return SimulationParameters(
        dim=dim,
        dtype=DTYPE,
        device=DEVICE,
        simulation_size=(1, 1, *res),
        dt=1.0,
        **kw,
    )


def _shear_layer_vel(res, vmax=0.2, sigma=0.05, kap=80.0):
    vel = torch.zeros((1, 2, *res), dtype=DTYPE)
    for j in range(res[0]):
        for i in range(res[1]):
            vel[:, 1, j, i] = sigma * vmax * math.sin(2.0 * math.pi * (i / res[1] + 0.25))
            if j <= res[0] / 2.0:
                vel[:, 0, j, i] = vmax * math.tanh(kap * (j / res[0] - 0.25))
            else:
                vel[:, 0, j, i] = vmax * math.tanh(kap * (-j / res[0] + 0.75))
    return vel


def gen_singlephase(kbc: bool):
    res = (24, 20)
    tau = 0.5 + (0.2 * max(res) / 3000.0) * 3.0
    sp = _params(2, res, density_gas=0.038, density_fluid=0.265, Q=9, tau=tau, k=0.33)
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_MRT() if kbc else runner.create_collision()
    if kbc:
        coll.preset_KBC(dx=1.0, dt=1.0)

    flags = torch.full((1, 1, *res), int(CellType.FLUID), dtype=torch.uint8)
    density = torch.full((1, 1, *res), 0.265, dtype=DTYPE)
    vel = _shear_layer_vel(res)
    force = torch.zeros((1, 2, *res), dtype=DTYPE)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=density, vel=vel, force=force)
    f0 = f.clone()

    for _ in range(20):
        f = prop.propagation(f=f)
        density, vel = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=density, vel=vel, flags=flags
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        if kbc:
            f = coll.collision(
                dx=1.0, dt=1.0, f=f, rho=density, vel=vel, flags=flags,
                force=force, KBC_type=int(KBCType.KBC_A),
            )
        else:
            f = coll.collision(
                dx=1.0, dt=1.0, f=f, rho=density, vel=vel, flags=flags,
                force=force, KBC_type=None,
            )

    name = "kbc_a" if kbc else "bgk"
    np.savez(
        OUT / f"singlephase_{name}.npz",
        tau=tau,
        f0=f0.numpy(),
        f=f.numpy(),
        rho=density.numpy(),
        vel=vel.numpy(),
        vel0=_shear_layer_vel(res).numpy(),
    )
    print(f"singlephase_{name}: |f|max={f.abs().max():.6f}")


def _box_scene(res, rho_lo, rho_hi, den_lo, den_hi, rho_wall, den_wall):
    flags = torch.full((1, 1, *res), int(CellType.FLUID), dtype=torch.uint8)
    flags[..., 0, :] = int(CellType.OBSTACLE)
    flags[..., -1, :] = int(CellType.OBSTACLE)
    flags[..., :, 0] = int(CellType.OBSTACLE)
    flags[..., :, -1] = int(CellType.OBSTACLE)
    rho = torch.full((1, 1, *res), rho_lo, dtype=DTYPE)
    den = torch.full((1, 1, *res), den_lo, dtype=DTYPE)
    r = 0.4 * max(res) / 2
    for j in range(res[0]):
        for i in range(res[1]):
            if abs(j - res[0] / 2) <= r and abs(i - res[1] / 2) <= r:
                rho[..., j, i] = rho_hi
                den[..., j, i] = den_hi
    rho[flags == int(CellType.OBSTACLE)] = rho_wall
    den[flags == int(CellType.OBSTACLE)] = den_wall
    return flags, rho, den


def gen_sc():
    res = (24, 20)
    sp = _params(
        2, res, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=9, tau=1.0, kappa=0.08,
        tau_f=0.7, tau_g=0.7, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_SC()
    coll.set_gravity(gravity=0)

    flags, rho, den = _box_scene(res, 0.02381, 0.2508, 0.02381, 0.2508, 0.2508, 0.2508)
    vel = torch.zeros((1, 2, *res), dtype=DTYPE)
    force = torch.zeros((1, 2, *res), dtype=DTYPE)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    f0 = f.clone()
    rho0, den0 = rho.clone(), den.clone()

    for _ in range(20):
        f = prop.propagation(f=f)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags, density=den
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        f = coll.collision(
            dx=1.0, dt=1.0, f=f, rho=rho, density=den, vel=vel, flags=flags,
            force=force, KBC_type=int(KBCType.KBC_A),
        )

    np.savez(
        OUT / "sc.npz",
        flags=flags.numpy(), f0=f0.numpy(), rho0=rho0.numpy(), den0=den0.numpy(),
        f=f.numpy(), rho=rho.numpy(), vel=vel.numpy(), den=den.numpy(),
    )
    print(f"sc: |vel|max={vel.abs().max():.6f}")


def _run_hcz_2d(name, kbc_type, gravity, contact_angle, steps=20, mag=None, res=(24, 20)):
    sp = _params(
        2, res, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=9,
        contact_angle=torch.tensor([contact_angle]),
        kappa=0.08 if mag is None else 0.5,
        tau_f=0.7 if mag is None else 0.68,
        tau_g=0.8 if mag is None else 0.68,
        k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.preset_KBC(dx=1.0, dt=1.0)
    coll.set_gravity(gravity=gravity)
    mgf = runner.create_LBM_magnetic() if mag is not None else None

    flags, rho, den = _box_scene(res, 0.02381, 0.2508, 0.02381, 0.2508, 0.2508, 0.2508)
    vel = torch.zeros((1, 2, *res), dtype=DTYPE)
    force = torch.zeros((1, 2, *res), dtype=DTYPE)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(
        dx=1.0, dt=1.0, rho=rho, vel=vel, density=den, pressure=pressure,
        force=force, feq=f,
    )
    f0, g0, rho0, den0, p0 = (x.clone() for x in (f, g, rho, den, pressure))

    h = torch.zeros_like(f)
    H2 = None
    phi = None
    if mag is not None:
        from src.LBM.utils import get_staggered

        magnetic_flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
        magnetic_flags[..., 1:-1, :] = int(CellType.FLUID)
        H_ext = torch.zeros((1, 2, *res), dtype=DTYPE)
        H_ext[:, 1, ...] = mag
        H_ext_mac = get_staggered(H_ext, mode="replicate")

    for _ in range(steps):
        f = prop.propagation(f=f)
        g = prop.propagation(f=g)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags, density=den
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        g = prop.rebounce_obstacle(f=g, flags=flags)

        if mag is not None:
            phi = -(2.0 * (den - 0.02381) / (0.2508 - 0.02381) - 1.0)
            for _i in range(30):
                h = prop.propagation(f=h)
                h = prop.rebounce_obstacle(f=h, flags=magnetic_flags)
                H_int, h = mgf.get_H_int(
                    dt=1.0, dx=1.0, phi=phi, flags=magnetic_flags,
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
            KBC_type=kbc_type,
        )

    out = dict(
        flags=flags.numpy(), f0=f0.numpy(), g0=g0.numpy(), rho0=rho0.numpy(),
        den0=den0.numpy(), p0=p0.numpy(), f=f.numpy(), g=g.numpy(),
        rho=rho.numpy(), vel=vel.numpy(), den=den.numpy(), p=pressure.numpy(),
        force=force.numpy(),
    )
    if mag is not None:
        out["h"] = h.numpy()
        out["H2"] = H2.numpy()
    np.savez(OUT / f"{name}.npz", **out)
    print(f"{name}: |vel|max={vel.abs().max():.6f}")


def _run_hcz_3d(name, gravity, steps=10, mag=None, res=(10, 12, 14)):
    sp = _params(
        3, res, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=19,
        contact_angle=torch.tensor([0.5 * math.pi]),
        kappa=0.01, tau_f=0.68, tau_g=0.68, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.set_gravity(gravity=gravity)
    mgf = runner.create_LBM_magnetic() if mag is not None else None

    flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    rho = torch.full((1, 1, *res), 0.02381, dtype=DTYPE)
    den = torch.full((1, 1, *res), 0.02381, dtype=DTYPE)
    # pool filling lower half in y
    rho[..., : res[1] // 2, :] = 0.2508
    den[..., : res[1] // 2, :] = 0.2508
    rho[flags == int(CellType.OBSTACLE)] = 0.2508
    den[flags == int(CellType.OBSTACLE)] = 0.2508

    vel = torch.zeros((1, 3, *res), dtype=DTYPE)
    force = torch.zeros((1, 3, *res), dtype=DTYPE)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(
        dx=1.0, dt=1.0, rho=rho, vel=vel, density=den, pressure=pressure,
        force=force, feq=f,
    )
    f0, g0, rho0, den0 = (x.clone() for x in (f, g, rho, den))

    h = torch.zeros_like(f)
    H2 = None
    phi = None
    if mag is not None:
        from src.LBM.utils import get_staggered

        magnetic_flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
        magnetic_flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
        H_ext = torch.zeros((1, 3, *res), dtype=DTYPE)
        H_ext[:, 1, ...] = mag
        H_ext_mac = get_staggered(H_ext, mode="replicate")

    for _ in range(steps):
        f = prop.propagation(f=f)
        g = prop.propagation(f=g)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags, density=den
        )
        f = prop.rebounce_obstacle(f=f, flags=flags)
        g = prop.rebounce_obstacle(f=g, flags=flags)

        if mag is not None:
            phi = -(2.0 * (den - 0.02381) / (0.2508 - 0.02381) - 1.0)
            for _i in range(30):
                h = prop.propagation(f=h)
                h = prop.rebounce_obstacle(f=h, flags=magnetic_flags)
                H_int, h = mgf.get_H_int(
                    dt=1.0, dx=1.0, phi=phi, flags=magnetic_flags,
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

    out = dict(
        flags=flags.numpy(), f0=f0.numpy(), g0=g0.numpy(), rho0=rho0.numpy(),
        den0=den0.numpy(), f=f.numpy(), g=g.numpy(), rho=rho.numpy(),
        vel=vel.numpy(), den=den.numpy(), p=pressure.numpy(),
    )
    if mag is not None:
        out["h"] = h.numpy()
        out["H2"] = H2.numpy()
    np.savez(OUT / f"{name}.npz", **out)
    print(f"{name}: |vel|max={vel.abs().max():.6f}")


def gen_two_droplets_long(steps=400, res=(49, 96), mag=100.0, gravity=1e-4):
    """Long-horizon golden: the 2D two-droplets ferrofluid config run to the
    reference demo's own Tecplot dump point (step 400,
    demo_2d_LBM_two_droplets.py:224-235), at 1/2 x 1/4 of the demo's default
    98x384 resolution (same scene construction: radius=min//4, centers at
    3/8 and 5/8 of x — :118-134).  Run in float64 on both sides so that 400
    steps of droplet-merge dynamics compare implementation semantics rather
    than accumulated arithmetic-order noise.
    """
    dt64 = torch.float64
    sp = SimulationParameters(
        dim=2, dtype=dt64, device=DEVICE, simulation_size=(1, 1, *res), dt=1.0,
        density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=9,
        contact_angle=torch.tensor([0.5 * math.pi], dtype=dt64),
        kappa=0.5, tau_f=0.68, tau_g=0.68, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.set_gravity(gravity=gravity)
    mgf = runner.create_LBM_magnetic()

    H, W = res
    flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    flags[..., 1:-1, 1:-1] = int(CellType.FLUID)
    magnetic_flags = flags.clone()

    rho = torch.full((1, 1, *res), 0.02381, dtype=dt64)
    den = torch.full((1, 1, *res), 0.02381, dtype=dt64)
    radius = min(res) // 4
    centers = [(H // 2, 3 * W // 8), (H // 2, 5 * W // 8)]
    for j in range(H):
        for i in range(W):
            if any((j - cy) ** 2 + (i - cx) ** 2 <= radius * radius
                   for cy, cx in centers):
                rho[..., j, i] = 0.2508
                den[..., j, i] = 0.2508
    rho[flags == int(CellType.OBSTACLE)] = 0.2508
    den[flags == int(CellType.OBSTACLE)] = 0.2508

    vel = torch.zeros((1, 2, *res), dtype=dt64)
    force = torch.zeros((1, 2, *res), dtype=dt64)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(dx=1.0, dt=1.0, rho=rho, vel=vel, density=den,
                      pressure=pressure, force=force, feq=f)
    rho0, den0 = rho.clone(), den.clone()
    h = torch.zeros_like(f)

    from src.LBM.utils import get_staggered

    H_ext = torch.zeros((1, 2, *res), dtype=dt64)
    H_ext[:, 1, ...] = mag
    H_ext_mac = get_staggered(H_ext, mode="replicate")

    snaps = {}
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
            h = prop.rebounce_obstacle(f=h, flags=magnetic_flags)
            H_int, h = mgf.get_H_int(
                dt=1.0, dx=1.0, phi=phi, flags=magnetic_flags,
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
        if step in (100, steps):
            snaps[step] = dict(
                den=den.numpy().copy(), vel=vel.numpy().copy(),
                p=pressure.numpy().copy(), H2=H2.numpy().copy(),
            )

    out = dict(flags=flags.numpy(), rho0=rho0.numpy(), den0=den0.numpy(),
               steps=np.array(steps), mag=np.array(mag),
               gravity=np.array(gravity))
    for step, d in snaps.items():
        for k, v in d.items():
            out[f"{k}_{step}"] = v
    np.savez(OUT / "two_droplets_400.npz", **out)
    print(f"two_droplets_400: |vel|max={np.abs(snaps[steps]['vel']).max():.6f}")


def gen_rosensweig_3d_long(steps=200, res=(64, 33, 64), mag=100.0,
                           gravity=1e-4):
    """Long-horizon 3D golden: the north-star Rosensweig configuration
    (demo_3d_LBM_Rosensweig_instability.py:151-207; constants :37-48 —
    kappa=0.01, tau=0.68, k=0.33, contact angle pi/2, dx=dt=1, H_ext along
    y, mag default 100 :277-281, gravity 1e-4) at roughly half the demo's
    130x66x130 default, run in float64 on both sides.  Exact demo init:
    flat pool filling the lower half in y (:128-133), walls xXyYzZ, magnetic
    flags open on y (:120-121).  200 steps = 6,000 magnetic Poisson
    sub-iterations plus the full initial pressure-wave transient.
    """
    dt64 = torch.float64
    sp = SimulationParameters(
        dim=3, dtype=dt64, device=DEVICE, simulation_size=(1, 1, *res), dt=1.0,
        density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=19,
        contact_angle=torch.tensor([0.5 * math.pi], dtype=dt64),
        kappa=0.01, tau_f=0.68, tau_g=0.68, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.set_gravity(gravity=gravity)
    mgf = runner.create_LBM_magnetic()

    flags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = torch.full((1, 1, *res), int(CellType.OBSTACLE), dtype=torch.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)

    rho = torch.full((1, 1, *res), 0.02381, dtype=dt64)
    den = torch.full((1, 1, *res), 0.02381, dtype=dt64)
    rho[..., : int(0.5 * res[1]), :] = 0.2508
    den[..., : int(0.5 * res[1]), :] = 0.2508
    rho[flags == int(CellType.OBSTACLE)] = 0.2508
    den[flags == int(CellType.OBSTACLE)] = 0.2508

    vel = torch.zeros((1, 3, *res), dtype=dt64)
    force = torch.zeros((1, 3, *res), dtype=dt64)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(dx=1.0, dt=1.0, rho=rho, vel=vel, density=den,
                      pressure=pressure, force=force, feq=f)
    rho0, den0 = rho.clone(), den.clone()
    h = torch.zeros_like(f)

    from src.LBM.utils import get_staggered

    H_ext = torch.zeros((1, 3, *res), dtype=dt64)
    H_ext[:, 1, ...] = mag
    H_ext_mac = get_staggered(H_ext, mode="replicate")

    snaps = {}
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
        if step in (100, steps):
            snaps[step] = dict(
                den=den.numpy().copy(), vel=vel.numpy().copy(),
                p=pressure.numpy().copy(), H2=H2.numpy().copy(),
            )
            print(f"rosensweig3d step {step}: |vel|max="
                  f"{float(vel.abs().max()):.6f}", flush=True)

    out = dict(flags=flags.numpy(), rho0=rho0.numpy(), den0=den0.numpy(),
               steps=np.array(steps), mag=np.array(mag),
               gravity=np.array(gravity))
    for step, d in snaps.items():
        for k, v in d.items():
            out[f"{k}_{step}"] = v
    np.savez_compressed(OUT / "rosensweig3d_200.npz", **out)
    print("rosensweig3d_200 written")


def gen_wave(steps=10, res=(24, 20), vel_max=0.05):
    """Velocity-forced wave pool (demo_2d_wave.py): KBC_A on g + inflow pin.

    NOTE: no golden data is produced — the REFERENCE itself emits NaN in g
    at step 0 (verified at the demo's own 130x130 defaults too): the KBC
    entropic gamma divides 0/0 wherever g == geq exactly (uniform bulk at
    rest).  Our implementation guards that limit (ops/collide.py:
    _entropic_relax), so the wave demo runs; field parity vs the reference
    is impossible for this configuration.  Kept as executable documentation
    of the reference bug."""
    sp = _params(
        2, res, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, Q=9,
        contact_angle=torch.tensor([0.55 * math.pi]),
        kappa=0.01, tau_f=0.7, tau_g=0.7, k=0.33,
    )
    runner = SimulationRunner(parameters=sp)
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    coll = runner.create_collision_HCZ()
    coll.preset_KBC(dx=1.0, dt=1.0)
    coll.set_gravity(gravity=0)

    H, W = res
    flags = torch.full((1, 1, *res), int(CellType.FLUID), dtype=torch.uint8)
    flags[..., 0, :] = int(CellType.OBSTACLE)
    flags[..., -1, :] = int(CellType.OBSTACLE)
    flags[..., :, 0] = int(CellType.OBSTACLE)
    flags[..., :, -1] = int(CellType.OBSTACLE)
    rho = torch.full((1, 1, *res), 0.02381, dtype=DTYPE)
    den = torch.full((1, 1, *res), 0.02381, dtype=DTYPE)
    rho[..., : H // 2, :] = 0.2508
    den[..., : H // 2, :] = 0.2508
    vel = torch.zeros((1, 2, *res), dtype=DTYPE)
    vel[..., 0, :, 0] = vel_max
    force = torch.zeros((1, 2, *res), dtype=DTYPE)
    pressure = macro.get_pressure(dx=1.0, dt=1.0, density=den)
    f = coll.get_feq_(dx=1.0, dt=1.0, rho=den, vel=vel, force=force)
    g = coll.get_geq_(dx=1.0, dt=1.0, rho=rho, vel=vel, density=den,
                      pressure=pressure, force=force, feq=f)
    f0, g0, rho0, den0 = (x.clone() for x in (f, g, rho, den))

    for _ in range(steps):
        f = prop.propagation(f=f)
        g = prop.propagation(f=g)
        rho, vel, den = macro.macro_compute(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, flags=flags, density=den
        )
        vel[..., 0, :, 0] = vel_max
        f = prop.rebounce_obstacle(f=f, flags=flags)
        g = prop.rebounce_obstacle(f=g, flags=flags)
        rho, vel, den, pressure, force, dfai, dprho = coll.capillary_process(
            rho=rho, vel=vel, flags=flags, force=force, dt=1.0, dx=1.0,
            g=g, density=den, pressure=pressure,
        )
        vel[..., 0, :, 0] = vel_max
        f, g = coll.collision(
            dx=1.0, dt=1.0, f=f, rho=rho, vel=vel, density=den, flags=flags,
            force=force, g=g, pressure=pressure, dfai=dfai, dprho=dprho,
            KBC_type=int(KBCType.KBC_A),
        )

    nan_count = int(torch.isnan(g).sum())
    print(f"wave: reference NaN count in g after {steps} steps: {nan_count}"
          " (reference bug; no golden saved)")


if __name__ == "__main__":
    torch.manual_seed(0)
    if len(sys.argv) > 1 and sys.argv[1] == "rosensweig3d":
        # expensive (~30 min torch CPU); run standalone, not with the rest
        torch.set_num_threads(8)
        gen_rosensweig_3d_long()
        raise SystemExit(0)
    gen_singlephase(kbc=False)
    gen_singlephase(kbc=True)
    gen_sc()
    _run_hcz_2d("hcz", kbc_type=None, gravity=0.0, contact_angle=0.5 * math.pi)
    _run_hcz_2d(
        "hcz_kbc_wetting",
        kbc_type=int(KBCType.KBC_A),
        gravity=1e-4,
        contact_angle=0.75 * math.pi,
    )
    _run_hcz_2d("ferro2d", kbc_type=None, gravity=0.0, contact_angle=0.5 * math.pi, mag=100.0, steps=10)
    _run_hcz_3d("hcz3d", gravity=1e-4, steps=10)
    _run_hcz_3d("ferro3d", gravity=1e-4, mag=85.0, steps=8)
    gen_wave()  # documents the reference NaN; writes nothing
    print("golden data written to", OUT)


