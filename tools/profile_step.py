#!/usr/bin/env python
"""Per-op profile of the 256^3-class ferrofluid step on the real TPU.

The tunneled backend's host-readback sync costs ~35 ms, swamping any
single-op timing.  Each op is therefore timed as R chained applications
inside ONE jitted program (outputs feed back into inputs so XLA cannot
CSE the repeats), with the measured sync floor subtracted and the result
divided by R.  Usage:

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

_FLOOR_MS = [0.0]


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0][..., :1, :1, :1]))


def timeit(name, fn, *args, R=8, reps=3, chain=None, **kw):
    """Time ``fn`` as R chained applications per sync.

    ``chain(out, args) -> new_args`` feeds each application's output back
    into the next one's inputs (data dependence defeats CSE).  Without a
    chain the op runs once per sync (floor-dominated — only for ops too
    awkward to chain).
    """
    kw_fn = partial(fn, **kw)
    if chain is None:
        R = 1

        run = jax.jit(lambda *a: kw_fn(*a))
    else:

        @jax.jit
        def run(*a):
            out = kw_fn(*a)
            for _ in range(R - 1):
                a = chain(out, a)
                out = kw_fn(*a)
            return out

    out = run(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    per_op = max(min(ts) * 1e3 - _FLOOR_MS[0], 0.0) / R
    print(f"{name:40s} {per_op:8.2f} ms  (x{R})", flush=True)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    dt = "bfloat16" if mode == "turbo" else "float32"
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=30, h_dtype=dt, fg_dtype=dt,
        mag_flags_shell=True,
    )
    # half-Z grid: keeps full 256^2 planes (lane/sublane behavior identical)
    # while fitting the profile's accumulated intermediates in 16 GB HBM
    res = (128, 256, 256)
    state = build_state(params, res)
    from lbm_ferrofluid_tpu.models import prime_premac
    state = prime_premac(params, state)  # profile the mac-carry fast path
    lat = params.lattice
    print(f"mode={mode} res={res}", flush=True)

    # sync-floor baseline, subtracted from every row below
    tiny = jax.jit(lambda x: x + 1.0)
    tiny_out = tiny(state.pressure)
    sync(tiny_out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tiny(state.pressure))
        ts.append(time.perf_counter() - t0)
    _FLOOR_MS[0] = min(ts) * 1e3
    print(f"{'(sync floor)':40s} {_FLOOR_MS[0]:8.2f} ms", flush=True)

    full = jax.jit(ferrofluid_step_impl, static_argnums=0)
    timeit("full step", lambda s: full(params, s), state,
           chain=lambda out, a: (out,))

    c = params.dx / params.dt

    from lbm_ferrofluid_tpu.ops.pallas.fused_step import (
        fused_step_supported, lbm_epilogue, lbm_prologue,
    )
    if fused_step_supported(lat, state.f.shape, params.kbc_type):
        pro = partial(
            lbm_prologue, c=c, rho_gas=params.rho_gas,
            rho_fluid=params.rho_fluid, density_gas=params.density_gas,
            density_fluid=params.density_fluid,
        )
        timeit(
            "lbm_prologue (fused)", pro, state.f, state.g, state.flags,
            state.rho, state.vel,
            chain=lambda out, a: (a[0], a[1], a[2], out[0], out[1]),
        )
        epi = partial(
            lbm_epilogue, tau_f=params.tau_f, tau_g=params.tau_g,
            dx=params.dx, dt=params.dt,
        )
        # the capillogue steady state elides force (state.force is None);
        # feed the row a zeros stand-in so the epilogue still profiles
        force_in = (
            state.force if state.force is not None
            else jnp.zeros_like(state.vel)
        )
        timeit(
            "lbm_epilogue (fused)", epi, state.f, state.g, state.flags,
            state.rho, state.vel, state.density, state.pressure,
            force_in, state.vel, state.vel,
            chain=lambda out, a: (out[0], out[1]) + a[2:],
        )

    from lbm_ferrofluid_tpu.ops.collide import MU0
    from lbm_ferrofluid_tpu.ops.pallas.capillogue import (
        capillogue_fits, lbm_capillogue,
    )
    if capillogue_fits(state.f.shape, state.f.dtype):
        capi = partial(
            lbm_capillogue, kappa=0.01, gravity=(0.0, -1e-4, 0.0),
            mu0_half=0.5 * MU0, rho_gas=params.rho_gas,
            rho_fluid=params.rho_fluid, density_gas=params.density_gas,
            density_fluid=params.density_fluid, tau_f=params.tau_f,
            tau_g=params.tau_g, emit_rhs=(1, 85.0, params.tau),
            emit_force=False,
        )
        timeit(
            "lbm_capillogue (cap+collide+emit)", capi,
            state.f, state.g, state.flags, state.rho, state.density,
            state.pressure, state.rho, state.pressure, state.density,
            state.vel, state.vel, state.magnetic_flags,
            chain=lambda out, a: (out[0], out[1]) + a[2:],
        )

    sbm = partial(
        stream_bounce_macro, lat, c=c, rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid, density_gas=params.density_gas,
        density_fluid=params.density_fluid,
    )
    out = timeit(
        "stream_bounce_macro (f)", sbm, state.f, state.flags, state.rho,
        state.vel,
        chain=lambda out, a: (out[0], a[1], out[1], out[2]),
    )
    f, rho, vel, density = out
    out = timeit(
        "stream_bounce_moments (g)", partial(stream_bounce_moments, lat),
        state.g, state.flags,
        chain=lambda out, a: (out[0], a[1]),
    )
    g, m0g, m1g = out

    def phi_fn(density):
        return -(2.0 * (density - params.density_gas)
                 / (params.density_fluid - params.density_gas) - 1.0)

    phi = timeit("phi", phi_fn, density,
                 chain=lambda out, a: (out,))

    solve = partial(
        solve_H_int, lat, tau=params.tau, n_iters=30, dx=params.dx,
        dt=params.dt,
    )
    out = timeit(
        "solve_H_int (rhs+30 sweeps+grad)", solve, state.h, phi,
        state.magnetic_flags, list(state.H_ext_mac),
        chain=lambda out, a: (out[1],) + a[1:], R=4,
    )
    H_int, h = out

    # rhs build alone (the solve prologue)
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
                 state.magnetic_flags,
                 chain=lambda out, a: (out,) + a[1:])

    pw = partial(poisson_wavefront, tau=params.tau, n_iters=30)
    timeit("  poisson wavefront x30", pw, state.h,
           state.magnetic_flags, rhs,
           chain=lambda out, a: (out[0],) + a[1:], R=4)

    def h2_fn(H_ext, H_int):
        H_tot = H_ext + H_int
        return jnp.sum(H_tot * H_tot, axis=1, keepdims=True)

    H_ext = state.H_ext
    if H_ext is None:  # elided on the steady state; rebuild on demand
        from lbm_ferrofluid_tpu.models import make_H_ext

        H_ext = make_H_ext(
            params, state.density.shape[2:], batch=state.density.shape[0],
            axis=params.h_ext_axis,
        )[0]
    H2 = timeit("H2", h2_fn, H_ext, H_int,
                chain=lambda out, a: (a[0], a[1] + out))

    cap = partial(
        hcz_capillary, lat, kappa=params.kappa,
        gravity=jnp.asarray(params.gravity_vec(), dtype=jnp.float32),
        contact_angle=params.contact_angle, rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid, density_gas=params.density_gas,
        density_fluid=params.density_fluid, dx=params.dx, dt=params.dt,
    )
    out = timeit(
        "hcz_capillary (all)", cap, rho, vel, state.flags, g, density,
        state.pressure, H2=H2, phi=phi, g_sum=m0g, g_mom=m1g,
        chain=lambda out, a: (out[0], out[1], a[2], a[3], out[2], out[3]),
    )
    rho2, vel2, density2, pressure2, force, dfai, dprho = out

    timeit("  contact_angle_boundary",
           lambda r, fl: contact_angle_boundary(r, fl, params.contact_angle, 3),
           rho, state.flags,
           chain=lambda out, a: (out, a[1]))
    timeit("  laplacian_field", partial(laplacian_field, dx=params.dx),
           density, chain=lambda out, a: (out,))
    stack4 = jnp.concatenate([density, density, density, density], axis=1)
    timeit("  grad_fields(4)", partial(grad_fields, dx=params.dx),
           stack4, chain=lambda out, a: (out[:, :4],))
    timeit("  grad_fields(1) [H_int]",
           partial(grad_fields, dx=params.dx), density,
           chain=lambda out, a: (out[:, :1],))

    col = partial(
        hcz_collide, lat, tau_f=params.tau_f, tau_g=params.tau_g,
        kbc_type=params.kbc_type, dx=params.dx, dt=params.dt,
    )
    timeit(
        "hcz_collide", col, f, g, rho2, vel2, density2, pressure2,
        state.flags, force, dfai, dprho,
        chain=lambda out, a: (out[0], out[1]) + a[2:],
    )


if __name__ == "__main__":
    main()
