#!/usr/bin/env python
"""Per-op profile of the 256^3 ferrofluid step on the real TPU.

Times each phase of ferrofluid_step_impl as a separately-jitted piece
(timings sync via host readback; see CLAUDE.md).  Usage:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step.py [f32|turbo]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import build_state  # noqa: E402
from lbm_ferrofluid_tpu.models import SimulationParams  # noqa: E402
from lbm_ferrofluid_tpu.models.ferrofluid import ferrofluid_step_impl  # noqa: E402
from lbm_ferrofluid_tpu.ops import (  # noqa: E402
    hcz_capillary,
    hcz_collide,
    solve_H_int,
    stream_bounce_macro,
    stream_bounce_moments,
)
from lbm_ferrofluid_tpu.ops.collide import (  # noqa: E402
    CHI_K,
    contact_angle_boundary,
    smooth_phi,
)
from lbm_ferrofluid_tpu.ops.pallas.poisson import poisson_wavefront  # noqa: E402
from lbm_ferrofluid_tpu.ops.pallas.stencil3d import (  # noqa: E402
    grad_fields,
    laplacian_field,
)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0][..., :1, :1, :1]))


def timeit(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts) * 1e3:8.2f} ms", flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    dt = "bfloat16" if mode == "turbo" else "float32"
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=30, h_dtype=dt, fg_dtype=dt,
    )
    # half-Z grid: keeps full 256^2 planes (lane/sublane behavior identical)
    # while fitting the profile's accumulated intermediates in 16 GB HBM
    res = (128, 256, 256)
    state = build_state(params, res)
    lat = params.lattice
    print(f"mode={mode} res={res}", flush=True)

    # sync-floor baseline: host-readback latency to subtract mentally
    tiny = jax.jit(lambda x: x + 1.0)
    timeit("(sync floor: x+1 on [1,1,Z,Y,X])", tiny, state.pressure)

    full = jax.jit(ferrofluid_step_impl, static_argnums=0, donate_argnums=1)

    def run_full(state, reps=5):
        s2 = full(params, state)
        sync(s2)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s2 = full(params, s2)
            sync(s2)
            ts.append(time.perf_counter() - t0)
        print(f"{'full step':40s} {min(ts) * 1e3:8.2f} ms", flush=True)
        return s2

    state = run_full(state)

    c = params.dx / params.dt
    sbm = jax.jit(partial(
        stream_bounce_macro, lat, c=c, rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid, density_gas=params.density_gas,
        density_fluid=params.density_fluid,
    ))
    f, rho, vel, density = timeit(
        "stream_bounce_macro (f)", sbm, state.f, state.flags, state.rho,
        state.vel,
    )
    g, m0g, m1g = timeit(
        "stream_bounce_moments (g)",
        jax.jit(partial(stream_bounce_moments, lat)), state.g, state.flags,
    )

    @jax.jit
    def phi_fn(density):
        return -(2.0 * (density - params.density_gas)
                 / (params.density_fluid - params.density_gas) - 1.0)

    phi = timeit("phi", phi_fn, density)

    solve = jax.jit(partial(
        solve_H_int, lat, tau=params.tau, n_iters=30, dx=params.dx,
        dt=params.dt,
    ))
    H_int, h = timeit(
        "solve_H_int (rhs+30 sweeps+grad)", solve, state.h, phi,
        state.magnetic_flags, list(state.H_ext_mac),
    )

    # rhs build alone (the solve prologue)
    @jax.jit
    def rhs_fn(phi, H_ext_mac, magnetic_flags):
        from lbm_ferrofluid_tpu.utils.types import CellType
        chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * params.dx))
        from lbm_ferrofluid_tpu.ops.stencils import (
            staggered_x, staggered_y, staggered_z,
        )
        chx = staggered_x(chi) * H_ext_mac[0]
        chy = staggered_y(chi) * H_ext_mac[1]
        chz = staggered_z(chi) * H_ext_mac[2]
        rhs = ((chx[..., 1:] - chx[..., :-1])
               + (chy[..., 1:, :] - chy[..., :-1, :])
               + (chz[..., 1:, :, :] - chz[..., :-1, :, :]))
        rhs = rhs * params.dx / (1.0 + chi)
        rhs = jnp.where(magnetic_flags == int(CellType.FLUID), rhs,
                        jnp.zeros_like(rhs))
        return rhs

    rhs = timeit("  rhs build", rhs_fn, phi, list(state.H_ext_mac),
                 state.magnetic_flags)

    pw = jax.jit(partial(poisson_wavefront, tau=params.tau, n_iters=30))
    _ = timeit("  poisson wavefront x30", pw, state.h,
               state.magnetic_flags, rhs)

    @jax.jit
    def h2_fn(H_ext, H_int):
        H_tot = H_ext + H_int
        return jnp.sum(H_tot * H_tot, axis=1, keepdims=True)

    H2 = timeit("H2", h2_fn, state.H_ext, H_int)

    cap = jax.jit(partial(
        hcz_capillary, lat, kappa=params.kappa,
        gravity=jnp.asarray(params.gravity_vec(), dtype=vel.dtype),
        contact_angle=params.contact_angle, rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid, density_gas=params.density_gas,
        density_fluid=params.density_fluid, dx=params.dx, dt=params.dt,
    ))
    rho2, vel2, density2, pressure2, force, dfai, dprho = timeit(
        "hcz_capillary (all)", cap, rho, vel, state.flags, g, density,
        state.pressure, H2=H2, phi=phi, g_sum=m0g, g_mom=m1g,
    )

    @jax.jit
    def cab_fn(rho, flags):
        return contact_angle_boundary(rho, flags, params.contact_angle, 3)

    _ = timeit("  contact_angle_boundary", cab_fn, rho, state.flags)
    _ = timeit("  laplacian_field", jax.jit(partial(laplacian_field, dx=params.dx)),
               density)
    stack4 = jnp.concatenate([density, density, density, density], axis=1)
    _ = timeit("  grad_fields(4)", jax.jit(partial(grad_fields, dx=params.dx)),
               stack4)
    _ = timeit("  grad_fields(1) [H_int]",
               jax.jit(partial(grad_fields, dx=params.dx)), density)

    col = jax.jit(partial(
        hcz_collide, lat, tau_f=params.tau_f, tau_g=params.tau_g,
        kbc_type=params.kbc_type, dx=params.dx, dt=params.dt,
    ))
    _ = timeit(
        "hcz_collide", col, f, g, rho2, vel2, density2, pressure2,
        state.flags, force, dfai, dprho,
    )


if __name__ == "__main__":
    main()
