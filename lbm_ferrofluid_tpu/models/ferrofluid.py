"""Ferrofluid solver: HCZ multiphase + magnetic Poisson sub-solve + Kelvin force.

Step order matches the north-star reference driver
(demo_3d_LBM_Rosensweig_instability.py:151-207):

  stream f,g -> moments -> bounce-back f,g
  -> phi = -(2 (density - rho_g)/(rho_l - rho_g) - 1)
  -> 30x [stream h -> bounce-back h (magnetic flags) -> Poisson sweep]
  -> H2 = |H_ext + H_int|^2
  -> capillary_process(..., H2, phi) -> HCZ collide

The 30-iteration inner loop is a ``lax.fori_loop`` inside the single jitted
step, so one step of the flagship model is one XLA computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    eos_pressure,
    feq,
    geq,
    hcz_capillary,
    hcz_collide,
    rho_to_density,
    solve_H_int,
    staggered,
    stream,
    stream_bounce_macro,
    stream_bounce_moments,
)
from ..ops.pallas import force_fastpath
from ..utils.types import CellType
from .params import SimulationParams
from .state import FerrofluidState

__all__ = [
    "init_ferrofluid_state", "ferrofluid_step", "ferrofluid_step_impl",
    "make_H_ext", "prime_premac", "phi_field",
]


def phi_field(params: SimulationParams, state) -> jnp.ndarray:
    """The order parameter phi for rendering/diagnostics.

    phi = -(2 (density - rho_g)/(rho_l - rho_g) - 1) is derived data
    (demo_3d_LBM_Rosensweig_instability.py:171); the mac-carried capillogue
    steady state does not materialize it per step (state.phi is None
    there), so consumers read it through this helper.  When state.phi is
    None the value is derived from the CURRENT density — one capillary
    update fresher than the in-step phi the non-carried paths store.
    """
    if state.phi is not None:
        return state.phi
    return -(
        2.0 * (state.density - params.density_gas)
        / (params.density_fluid - params.density_gas)
        - 1.0
    )


def make_H_ext(params: SimulationParams, res, batch=1, dtype=jnp.float32, axis=1):
    """Constant external field of magnitude mag_strength along ``axis``
    (y by default, as in the Rosensweig demos) plus its MAC staggering."""
    H = jnp.zeros((batch, params.dim, *res), dtype=dtype)
    H = H.at[:, axis].set(params.mag_strength)
    return H, tuple(staggered(H, mode="replicate"))


def validate_mag_shell(params: SimulationParams, magnetic_flags) -> None:
    """Verify the ``mag_flags_shell`` declaration against concrete flags.

    The psi ghost-refresh ICI shortcut (parallel/step3d.py:
    _psi_refresh_ghosts) reconstructs ghost h from psi at non-obstacle
    cells only; an OBSTACLE outside the declared shell (x-edge columns +
    global z-edge planes) would silently corrupt the multi-chip solve.
    Called from init_ferrofluid_state AND prime_premac, so states that
    bypass init (checkpoint resume, state.replace of magnetic_flags) are
    still caught at the sharded fast path's entry point.  Under tracing
    the flags are abstract and the declaration is trusted (documented on
    the param).
    """
    if not (params.mag_flags_shell and params.dim == 3):
        return
    try:
        mf = np.asarray(magnetic_flags)
    except Exception:
        return  # traced flags: cannot inspect values
    if (mf[..., 1:-1, :, 1:-1] == int(CellType.OBSTACLE)).any():
        raise ValueError(
            "params.mag_flags_shell=True, but magnetic_flags has "
            "OBSTACLE cells outside the x-edge columns / z-edge "
            "planes shell; unset mag_flags_shell for this geometry"
        )


def init_ferrofluid_state(
    params: SimulationParams,
    rho,
    density,
    vel,
    flags,
    magnetic_flags,
    H_ext_axis: int | None = None,
) -> FerrofluidState:
    lat = params.lattice
    rho = jnp.array(rho)
    density = jnp.array(density)
    vel = jnp.array(vel)
    force = jnp.zeros_like(vel)
    pressure = eos_pressure(density, dx=params.dx, dt=params.dt)
    f = feq(lat, density, vel, dx=params.dx, dt=params.dt, tau=params.tau, force=force)
    g = geq(lat, rho, density, vel, pressure, dx=params.dx, dt=params.dt, feq_val=f)
    fg_dt = jnp.dtype(params.fg_dtype)
    f, g = f.astype(fg_dt), g.astype(fg_dt)
    h = jnp.zeros(f.shape, dtype=jnp.dtype(params.h_dtype))
    phi = jnp.zeros_like(rho)
    res = rho.shape[2:]
    if H_ext_axis is None:
        H_ext_axis = params.h_ext_axis
    elif H_ext_axis != params.h_ext_axis:
        # the step folds H_ext statically from params.h_ext_axis
        # (solve_H_int h2_ext) — a mismatched state would silently apply
        # the wrong Kelvin field
        raise ValueError(
            f"H_ext_axis={H_ext_axis} conflicts with params.h_ext_axis="
            f"{params.h_ext_axis}; set SimulationParams(h_ext_axis=...) "
            "instead"
        )
    validate_mag_shell(params, magnetic_flags)
    H_ext, H_ext_mac = make_H_ext(
        params, res, batch=rho.shape[0], dtype=rho.dtype, axis=H_ext_axis
    )
    return FerrofluidState(
        f=f,
        g=g,
        h=h,
        rho=rho,
        vel=vel,
        density=density,
        pressure=pressure,
        force=force,
        phi=phi,
        flags=jnp.array(flags),
        magnetic_flags=jnp.array(magnetic_flags),
        H_ext=H_ext,
        H_ext_mac=H_ext_mac,
        step=jnp.zeros((), jnp.int32),
    )


def _box_idx(params: SimulationParams):
    pz, py, px = params.phys_extent
    return (Ellipsis, slice(0, pz), slice(0, py), slice(0, px))


def _contact_angle_box(params: SimulationParams, rho, flags):
    """Contact-angle surgery tied to the PHYSICAL box faces.

    phys_extent layouts (scenes.rosensweig_3d_tpu) OBSTACLE-pad the
    lane/sublane axes, so the reference's surgery — which operates on
    ARRAY faces (LBM_collision_HCZ_3d.py wetting boundary) — must run on
    the physical box, in its ORIGINAL orientation (the face-processing
    order is part of the reproduced semantics: the corner-average quirk
    is face-order-dependent).  Slice box -> swap (z_a, y_a) back to
    physical -> reference surgery -> swap -> write back; pad values stay
    at their wall constants (read by nothing: interior stencils reach at
    most the seam layer, which lies inside the box)."""
    from ..ops.collide import contact_angle_boundary

    box = _box_idx(params)
    sub = rho[box].swapaxes(-3, -2)
    fsub = flags[box].swapaxes(-3, -2)
    ca = contact_angle_boundary(
        sub, fsub, params.contact_angle, 3, spmd=len(jax.devices()) > 1
    )
    return rho.at[box].set(ca.swapaxes(-3, -2))


def _h2_box(params: SimulationParams, psi, magnetic_flags, hext_static, dx):
    """H2 = |H_ext + H_int|^2 composed on the PHYSICAL box.

    The in-kernel h2 emission substitutes obstacle psi and replicates the
    gradient at ARRAY faces; on a phys_extent layout those fixes belong
    at the physical box faces, so the composition runs in jnp on the box
    in physical orientation — isotropic_grad applies the identical
    substitution/replicate the reference does at its own array faces
    (LBM_magnetic_3d.py get_H_int).  Outside the box H2 is zero (dead:
    fluid stencils reach at most the seam layer, inside the box)."""
    from ..ops.magnetic import _maybe_h2
    from ..ops.stencils import isotropic_grad

    box = _box_idx(params)
    psi_p = psi[box].swapaxes(-3, -2)
    mf_p = magnetic_flags[box].swapaxes(-3, -2)
    H_int_p = -isotropic_grad(psi_p, dx, mf_p, 3)
    # physical channel order: array (x_a, y_a, z_a) = phys (x, z, y)
    hext_p = (hext_static[0], hext_static[2], hext_static[1])
    H2_p = _maybe_h2(H_int_p, hext_p)
    H2 = jnp.zeros_like(psi)
    return H2.at[box].set(H2_p.swapaxes(-3, -2))


def _hcz_capillary_box(params: SimulationParams, lat, rho, vel, flags,
                       density, pressure, H2, phi, m0g, m1g):
    """hcz_capillary on the PHYSICAL box of a phys_extent layout.

    The jnp capillary stage ties its boundary-ring fixes (fai/prho
    replicate, laplacian zero ring, obstacle substitutions, contact-angle
    surgery) to ARRAY faces; slicing the box and running in physical
    orientation reproduces the reference bitwise there.  Vector fields
    permute channels (0, 2, 1) — its own inverse.  Pad cells keep their
    previous values (rho/vel/density/pressure) or zeros (force and the
    gradients, masked/dead outside the box)."""
    from ..ops import hcz_capillary

    box = _box_idx(params)

    def t(x):
        return x[box].swapaxes(-3, -2)

    def tv(x):
        return t(x)[:, (0, 2, 1)]

    grav_p = np.zeros((1, 3, 1, 1, 1), np.float32)
    grav_p[0, 1] = -params.gravity  # physical vertical
    rho_p, vel_p, den_p, pres_p, force_p, dfai_p, dprho_p = hcz_capillary(
        lat, t(rho), tv(vel), t(flags), None, t(density), t(pressure),
        kappa=params.kappa,
        gravity=jnp.asarray(grav_p, dtype=vel.dtype),
        contact_angle=params.contact_angle,
        rho_gas=params.rho_gas, rho_fluid=params.rho_fluid,
        density_gas=params.density_gas, density_fluid=params.density_fluid,
        dx=params.dx, dt=params.dt, H2=t(H2), phi=t(phi),
        g_sum=t(m0g), g_mom=tv(m1g),
        use_pallas=False,
        gravity_static=tuple(float(v) for v in grav_p.reshape(-1)),
    )

    def back(base, x_p, vec=False):
        xb = x_p.swapaxes(-3, -2)
        if vec:
            xb = xb[:, (0, 2, 1)]
        return base.at[box].set(xb)

    zeros_v = jnp.zeros_like(vel)
    return (
        back(rho, rho_p),
        back(vel, vel_p, vec=True),
        back(density, den_p),
        back(pressure, pres_p),
        back(zeros_v, force_p, vec=True),
        back(zeros_v, dfai_p, vec=True),
        back(zeros_v, dprho_p, vec=True),
    )


def _capillogue_rhs_cfg(params: SimulationParams):
    """emit_rhs tuple for the capillogue kernel, or None.

    The in-kernel rhs emission needs the static external field along an
    IN-PLANE axis (x or y: the staggered difference is then a clamped
    in-plane shift of the emitted plane).  Must agree between
    prime_premac and the step so the premac pytree structure is stable
    under lax.scan.
    """
    if params.h_ext_axis in (0, 1):
        return (
            int(params.h_ext_axis), float(params.mag_strength),
            float(params.tau),
        )
    return None


def ferrofluid_step_impl(
    params: SimulationParams, state: FerrofluidState, mesh=None
) -> FerrofluidState:
    """Un-jitted step body of the flagship ferrofluid model.

    With ``mesh`` (a jax.sharding.Mesh with 'batch'/'z' axes) the fused
    Pallas kernels run multi-chip under shard_map slab decomposition
    (parallel/step3d.py); the cheap glue stays on GSPMD.
    """
    lat = params.lattice
    dx, dt = params.dx, params.dt

    c = dx / dt

    # Single-device TPU fast path: the ring-pipelined prologue streams f and
    # g in register and emits only the macro fields (no post-stream
    # writeback, no channel-group splits); the matching epilogue at the end
    # of the step re-streams and collides in one pass.
    import os

    from ..ops.pallas.fused_step import (
        fused_step_supported,
        lbm_epilogue,
        lbm_prologue,
    )

    pallas_on = (
        params.use_pallas and lat.dim == 3
        and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    force_fast = force_fastpath()
    fastpath = (
        pallas_on and mesh is None
        and fused_step_supported(lat, state.f.shape, params.kbc_type)
        and ((jax.default_backend() == "tpu"
              and len(jax.devices()) == 1) or force_fast)
    )
    interp_fast = force_fast and fastpath
    fastpath_sharded = False
    interp = False
    if pallas_on and mesh is not None:
        from ..parallel.step3d import default_interpret, fused_step_sharded_ok

        interp = default_interpret()
        fastpath_sharded = fused_step_sharded_ok(
            mesh, state.f.shape, params.kbc_type, interp
        )
    fused = fastpath or fastpath_sharded
    if fastpath:
        if state.premac is not None:
            # mac-carry: the previous epilogue already computed this
            # step's streamed macros in its trailing stage (emit_mac) —
            # the prologue's HBM re-read of f and g is skipped entirely.
            # premac is a 5-tuple of separate arrays: slicing one packed
            # array here made XLA materialize every slice around the
            # Pallas consumers (~1.1 ms/step at 128x256^2)
            rho, vel, density, m0g, m1g = state.premac[:5]
        else:
            rho, vel, density, m0g, m1g = lbm_prologue(
                state.f, state.g, state.flags, state.rho, state.vel,
                c=c, rho_gas=params.rho_gas, rho_fluid=params.rho_fluid,
                density_gas=params.density_gas,
                density_fluid=params.density_fluid, interpret=interp_fast,
            )
        f = g = None  # post-stream distributions never materialize
    elif fastpath_sharded:
        if state.premac is not None:
            # mac-carry, sharded: the previous sharded epilogue emitted
            # this step's streamed macros (interior planes in-kernel,
            # boundary planes via the post-kernel ring fix-up)
            rho, vel, density, m0g, m1g = state.premac[:5]
        else:
            from ..parallel.step3d import fused_prologue_sharded

            rho, vel, density, m0g, m1g = fused_prologue_sharded(
                state.f, state.g, state.flags, state.rho, state.vel, mesh,
                c=c, rho_gas=params.rho_gas, rho_fluid=params.rho_fluid,
                density_gas=params.density_gas,
                density_fluid=params.density_fluid, interpret=interp,
            )
        f = g = None
    else:
        f, rho, vel, density = stream_bounce_macro(
            lat, state.f, state.flags, state.rho, state.vel,
            c=c, rho_gas=params.rho_gas, rho_fluid=params.rho_fluid,
            density_gas=params.density_gas,
            density_fluid=params.density_fluid,
            use_pallas=params.use_pallas, mesh=mesh,
        )
        g, m0g, m1g = stream_bounce_moments(
            lat, state.g, state.flags, params.use_pallas, mesh=mesh
        )

    # phi and the Poisson source term stay in jnp: XLA fuses this entire
    # elementwise/staggered chain into the surrounding step at near-zero
    # marginal cost.  A fused Pallas version was built and benched in round
    # 2 and was ~1.3% SLOWER end-to-end (extra materialization at the
    # kernel boundary: 3x density fetch + 6 face operands) — see
    # docs/PERFORMANCE.md "What did not help".
    def _phi():
        return -(
            2.0 * (density - params.density_gas)
            / (params.density_fluid - params.density_gas)
            - 1.0
        )

    # mac-carried rhs: when premac is a 6-tuple, its last entry is the
    # pre-scaled Poisson source term the previous capillogue emission
    # computed from this step's density — the jnp rhs chain is skipped,
    # and phi (whose only in-step consumer was that chain) is not
    # materialized at all on the steady-state path: state.phi rides as
    # None and models.phi_field derives it from density on demand.
    rhs_pre = None
    if state.premac is not None and len(state.premac) > 5:
        rhs_pre = state.premac[5]
    phi = None if rhs_pre is not None else _phi()

    # H_ext is mag_strength * e_axis by construction (make_H_ext from
    # params.h_ext_axis), so it folds as a compile-time constant: the
    # fused wavefront emits the 1-channel H2 directly and the 3-channel
    # H_int never reaches HBM (every other path computes the identical
    # H2 against the broadcast constant inside solve_H_int).
    hext_static = tuple(
        float(params.mag_strength) if d == params.h_ext_axis else 0.0
        for d in range(lat.dim)
    )
    if state.h.shape[1] == 2:
        # scalar Poisson carry (tau == 1 collapse, _prime_steady): h is
        # the fused (s, s_prev) pair and the solve runs the 1-channel
        # wavefront kernel — ~19x less HBM traffic and ~6x fewer VPU ops
        # per sweep than the channel form (ops/pallas/scalar_poisson.py)
        from ..ops.magnetic import poisson_rhs_scaled, solve_H_int_scalar

        rhs_sc = rhs_pre
        if rhs_sc is None:
            rhs_sc = poisson_rhs_scaled(
                _phi(), state.magnetic_flags, list(state.H_ext_mac),
                hext_static, tau=params.tau, dx=dx, dt=dt, dim=lat.dim,
            )
            phi = _phi()
        if lat.dim == 3:
            from ..parallel.step3d import scalar_sharded_ok
        if params.phys_extent is not None:
            # padded transposed layout (scenes.rosensweig_3d_tpu): run
            # the sweeps on the padded arrays — exact for any geometry
            # (lag-2 self-reflection + periodic z-wrap on the open axis)
            # — but compose H2 on the PHYSICAL box: the gradient's
            # obstacle substitution and output replicate belong at the
            # box faces, not the padded array faces
            from ..ops.magnetic import solve_psi_scalar

            psi, h = solve_psi_scalar(
                state.h, state.cmask, state.magnetic_flags, rhs_sc,
                n_iters=params.poisson_iters,
                use_pallas=params.use_pallas and mesh is None,
                interpret=interp_fast,
            )
            H2 = _h2_box(
                params, psi, state.magnetic_flags, hext_static, dx
            )
        elif (
            lat.dim == 3 and mesh is not None and pallas_on
            and scalar_sharded_ok(
                mesh, state.h.shape, params.poisson_iters, interp
            )
        ):
            # slab form of the collapse: ghost bands are (s, s_prev)
            # pairs — 2 f32 channels/side/round instead of 19xh — and
            # the final round emits H2 in-kernel (parallel/step3d.py;
            # prime_premac gates the sharded conversion on
            # scalar_sharded_ok for the SAME mesh, so this dispatch
            # normally cannot miss — the explicit re-check covers a
            # state primed on a DIFFERENT mesh geometry, which would
            # otherwise raise 'no slab plan' deep inside the solve; it
            # falls through to solve_H_int_scalar, whose jnp branch
            # GSPMD-partitions over the mesh).  With Pallas disabled
            # (use_pallas=False / LBM_DISABLE_PALLAS — e.g. bisecting a
            # kernel issue on a scalar-carry state) the jnp branch below
            # runs instead: scalar sweeps + the grad composition are
            # plain jnp rolls, which GSPMD partitions automatically.
            from ..parallel.step3d import scalar_poisson_sharded

            H2, h = scalar_poisson_sharded(
                state.h, state.cmask, rhs_sc, mesh,
                n_iters=params.poisson_iters, dx=dx, h_ext=hext_static,
                interpret=interp,
                # sliver ch1 exchange: valid only under the validated
                # shell geometry; OPT-IN (measured net negative on-chip
                # — params.scalar_sliver docstring)
                shell_sliver=(
                    params.scalar_sliver and params.mag_flags_shell
                ),
            )
        else:
            H2, h = solve_H_int_scalar(
                state.h, state.cmask, state.magnetic_flags, rhs_sc,
                n_iters=params.poisson_iters, dx=dx, h2_ext=hext_static,
                # with a mesh the single-device kernel must not run on
                # the GSPMD-sharded global array (this branch is the
                # prime/step mesh-mismatch fallback): the jnp sweeps
                # partition over the mesh automatically
                use_pallas=params.use_pallas and mesh is None,
                interpret=interp_fast,
            )
    else:
        if params.phys_extent is not None:
            # the channel-form solve composes its gradient at array
            # faces; on a padded layout that silently mis-places the
            # substitution — phys_extent runs require the scalar carry
            raise NotImplementedError(
                "phys_extent layouts require the tau==1 scalar Poisson "
                "carry (run prime_premac on the state; incompatible "
                "with LBM_DISABLE_PALLAS only if priming was skipped)"
            )
        H2, h = solve_H_int(
            lat,
            state.h,
            phi,
            state.magnetic_flags,
            list(state.H_ext_mac),
            tau=params.tau,
            n_iters=params.poisson_iters,
            dx=dx,
            dt=dt,
            use_pallas=params.use_pallas,
            mesh=mesh,
            halo_depth=params.poisson_halo_depth,
            rhs_scaled=rhs_pre,
            h2_ext=hext_static,
            psi_halo=params.poisson_psi_halo and params.mag_flags_shell,
        )

    # Fully fused steady-state turbo path: capillary stage + HCZ collide +
    # next-step mac emission in ONE kernel — dfai/dprho never leave VMEM,
    # the epilogue's 15-channel macro ring is gone, and density(rho_ca) is
    # emitted by the kernel (ops/pallas/capillogue.py).
    if fastpath and state.premac is not None:
        from ..ops.collide import MU0, contact_angle_boundary
        from ..ops.pallas.capillogue import capillogue_fits, lbm_capillogue

        grav = tuple(float(gv) for gv in params.gravity_vec().reshape(-1))
        if (
            capillogue_fits(state.f.shape, state.f.dtype)
            and len(grav) == 3
        ):
            from ..ops.pallas.contact3d import (
                contact_angle_3d,
                contact_angle_3d_supported,
            )

            if params.phys_extent is not None:
                # surgery tied to the PHYSICAL box faces, in the
                # reference's orientation (face-order-dependent corner
                # semantics) — the array-face kernel twin must not run
                rho_ca = _contact_angle_box(params, rho, state.flags)
            elif contact_angle_3d_supported(rho.shape):
                # kernel twin of the jnp scatter chain: rho and flags
                # read once, rho_ca written once (the x-face
                # dynamic-update-slices are whole-tile RMW on TPU layout
                # — ~0.55 ms/step at 128x256^2 for the jnp chain)
                rho_ca = contact_angle_3d(
                    rho, state.flags, float(params.contact_angle),
                    interpret=interp_fast,
                )
            else:
                rho_ca = contact_angle_boundary(
                    rho, state.flags, params.contact_angle, 3,
                    spmd=len(jax.devices()) > 1,
                )
            emit_rhs = _capillogue_rhs_cfg(params)
            f, g, vel, pressure, force, density, premac = lbm_capillogue(
                state.f, state.g, state.flags, rho, density,
                state.pressure, rho_ca, H2, m0g, m1g, vel,
                state.magnetic_flags if emit_rhs else None,
                kappa=float(params.kappa), gravity=grav,
                mu0_half=0.5 * MU0, rho_gas=float(params.rho_gas),
                rho_fluid=float(params.rho_fluid),
                density_gas=float(params.density_gas),
                density_fluid=float(params.density_fluid),
                tau_f=params.tau_f, tau_g=params.tau_g, dx=dx, dt=dt,
                # force elision must mirror prime_premac's: it nulls
                # state.force only alongside the rhs leaf (rhs_cfg set),
                # and the lax.scan carry must keep one structure — with
                # emit_rhs=None (e.g. h_ext_axis=2) force stays an array
                emit_rhs=emit_rhs, emit_force=emit_rhs is None,
                interpret=interp_fast,
                # phys_extent: in-plane boundary-ring fixes (fai/prho/chi
                # replicate, laplacian zero ring) land at the PHYSICAL
                # box faces instead of the padded array faces
                bounds=(
                    params.phys_extent[1:] if params.phys_extent else None
                ),
            )
            return FerrofluidState(
                f=f, g=g, h=h, rho=rho_ca, vel=vel, density=density,
                pressure=pressure, force=force, phi=phi,
                flags=state.flags, magnetic_flags=state.magnetic_flags,
                H_ext=state.H_ext, H_ext_mac=state.H_ext_mac,
                step=state.step + 1, premac=premac,
                cmask=state.cmask,
            )

    # Sharded steady-state capillogue: when the sharded premac carries the
    # rhs leaf (prime_premac gated on capillogue_sharded_ok), the slab-mode
    # fused kernel replaces hcz_capillary + the sharded emit_mac epilogue —
    # the multi-chip step then matches the single-chip steady state
    # structurally (dfai/dprho never leave VMEM, density emitted in-kernel,
    # next step's rhs carried).
    if (
        fastpath_sharded
        and state.premac is not None
        and len(state.premac) > 5
    ):
        from ..ops.collide import MU0, contact_angle_boundary
        from ..parallel.step3d import (
            capillogue_sharded,
            contact3d_sharded,
            contact3d_sharded_ok,
        )

        grav = tuple(float(gv) for gv in params.gravity_vec().reshape(-1))
        if contact3d_sharded_ok(mesh, rho.shape, rho.dtype, interp):
            # slab twin of the jnp scatter chain (1 rho ghost plane per
            # side; the x-face dynamic-update-slices are whole-tile RMW
            # on TPU layout, ~0.55 ms/step at 128x256^2)
            rho_ca = contact3d_sharded(
                rho, state.flags, float(params.contact_angle), mesh,
                interpret=interp,
            )
        else:
            rho_ca = contact_angle_boundary(
                rho, state.flags, params.contact_angle, 3,
                spmd=mesh.devices.size > 1,
            )
        emit_rhs = _capillogue_rhs_cfg(params)
        f, g, vel, pressure, density, premac = capillogue_sharded(
            state.f, state.g, state.flags, rho, density, state.pressure,
            rho_ca, H2, m0g, m1g, vel,
            state.magnetic_flags if emit_rhs else None, mesh,
            kappa=float(params.kappa), gravity=grav,
            mu0_half=0.5 * MU0, rho_gas=float(params.rho_gas),
            rho_fluid=float(params.rho_fluid),
            density_gas=float(params.density_gas),
            density_fluid=float(params.density_fluid),
            tau_f=params.tau_f, tau_g=params.tau_g, dx=dx, dt=dt,
            emit_rhs=emit_rhs, interpret=interp,
        )
        return FerrofluidState(
            f=f, g=g, h=h, rho=rho_ca, vel=vel, density=density,
            pressure=pressure, force=None, phi=phi,
            flags=state.flags, magnetic_flags=state.magnetic_flags,
            H_ext=state.H_ext, H_ext_mac=state.H_ext_mac,
            step=state.step + 1, premac=premac,
            cmask=state.cmask,
        )

    if phi is None:
        # defensive: only reachable if the capillogue gates disagree with
        # prime_premac's (same shape/dtype inputs, so they cannot in
        # practice) — hcz_capillary and the carried state need a real phi
        phi = _phi()
    if params.phys_extent is not None:
        # box-sliced jnp capillary stage (boundary-ring fixes at the
        # physical faces); the Pallas stencil kernels tie theirs to the
        # padded array faces and must not run here
        rho, vel, density, pressure, force, dfai, dprho = (
            _hcz_capillary_box(
                params, lat, rho, vel, state.flags, density,
                state.pressure, H2, phi, m0g, m1g,
            )
        )
    else:
        rho, vel, density, pressure, force, dfai, dprho = hcz_capillary(
            lat,
            rho,
            vel,
            state.flags,
            state.g if fused else g,  # unused when g_sum/g_mom are given
            density,
            state.pressure,
            kappa=params.kappa,
            gravity=jnp.asarray(params.gravity_vec(), dtype=vel.dtype),
            contact_angle=params.contact_angle,
            rho_gas=params.rho_gas,
            rho_fluid=params.rho_fluid,
            density_gas=params.density_gas,
            density_fluid=params.density_fluid,
            dx=dx,
            dt=dt,
            H2=H2,
            phi=phi,
            g_sum=m0g,
            g_mom=m1g,
            use_pallas=params.use_pallas,
            mesh=mesh,
            gravity_static=tuple(
                float(gv) for gv in params.gravity_vec().reshape(-1)
            ),
        )
    premac = None
    if fastpath:
        if state.premac is not None:
            from ..ops.pallas.fused_step import emit_mac_mode

            f, g, premac = lbm_epilogue(
                state.f, state.g, state.flags, rho, vel, density, pressure,
                force, dfai, dprho, tau_f=params.tau_f, tau_g=params.tau_g,
                dx=dx, dt=dt, emit_mac=True,
                mac_consts=(
                    c, float(params.rho_gas), float(params.rho_fluid),
                    float(params.density_gas), float(params.density_fluid),
                ),
                compact=(
                    emit_mac_mode(state.f.shape, state.f.dtype) == "compact"
                ),
                interpret=interp_fast,
            )
        else:
            f, g = lbm_epilogue(
                state.f, state.g, state.flags, rho, vel, density, pressure,
                force, dfai, dprho, tau_f=params.tau_f, tau_g=params.tau_g,
                dx=dx, dt=dt, interpret=interp_fast,
            )
    elif fastpath_sharded:
        from ..parallel.step3d import fused_epilogue_sharded

        if state.premac is not None:
            from ..ops.pallas.fused_step import emit_mac_mode

            f, g, premac = fused_epilogue_sharded(
                state.f, state.g, state.flags, rho, vel, density, pressure,
                force, dfai, dprho, mesh, tau_f=params.tau_f,
                tau_g=params.tau_g, dx=dx, dt=dt, emit_mac=True,
                mac_consts=(
                    c, float(params.rho_gas), float(params.rho_fluid),
                    float(params.density_gas), float(params.density_fluid),
                ),
                compact=(
                    emit_mac_mode(state.f.shape, state.f.dtype) == "compact"
                ),
                interpret=interp,
            )
        else:
            f, g = fused_epilogue_sharded(
                state.f, state.g, state.flags, rho, vel, density, pressure,
                force, dfai, dprho, mesh, tau_f=params.tau_f,
                tau_g=params.tau_g, dx=dx, dt=dt, interpret=interp,
            )
    else:
        f, g = hcz_collide(
            lat,
            f,
            g,
            rho,
            vel,
            density,
            pressure,
            state.flags,
            force,
            dfai,
            dprho,
            tau_f=params.tau_f,
            tau_g=params.tau_g,
            kbc_type=params.kbc_type,
            dx=dx,
            dt=dt,
            use_pallas=params.use_pallas,
            mesh=mesh,
        )
    return FerrofluidState(
        f=f,
        g=g,
        h=h,
        rho=rho,
        vel=vel,
        density=density,
        pressure=pressure,
        force=force,
        phi=phi,
        flags=state.flags,
        magnetic_flags=state.magnetic_flags,
        H_ext=state.H_ext,
        H_ext_mac=state.H_ext_mac,
        step=state.step + 1,
        premac=premac,
        cmask=state.cmask,
    )


def _mag_boundary_only(magnetic_flags, phys_extent=None) -> bool:
    """Concrete check: every OBSTACLE magnetic cell lies on the domain's
    outermost ring.  That is the GENERAL physics precondition of the
    tau==1 scalar collapse — psi at obstacle cells is discarded by the
    isotropic-grad substitution only on the boundary ring
    (ops/stencils.py:isotropic_grad), so interior obstacles would make
    channel-form and scalar-form H_int differ.  ``mag_flags_shell`` is
    the narrower *declared* form (x-columns + z-planes, 3D, validated at
    init); this check admits e.g. the two-droplets demos' full 6-face /
    4-edge frame (reference demo_3d_LBM_two_droplets.py:120-121,
    demo_2d_LBM_two_droplets.py:118-119).  Returns False when the flags
    are traced (prime_premac runs eagerly by contract, so concrete flags
    are the normal case)."""
    try:
        mf = np.asarray(magnetic_flags)
    except Exception:
        return False  # traced flags: cannot inspect values
    obs = int(CellType.OBSTACLE)
    if phys_extent is not None:
        # padded layout: everything OUTSIDE the physical box must be
        # OBSTACLE (dead pad) and the BOX interior obstacle-free — the
        # box plays the role the whole array plays in the plain layout
        # (the step's _h2_box composition substitutes at its faces)
        pz, py, px = phys_extent
        if (
            (mf[..., pz:, :, :] != obs).any()
            or (mf[..., :, py:, :] != obs).any()
            or (mf[..., :, :, px:] != obs).any()
        ):
            return False
        interior = (
            Ellipsis,
            slice(1, pz - 1), slice(1, py - 1), slice(1, px - 1),
        )
        return not (mf[interior] == obs).any()
    interior = (Ellipsis,) + tuple(slice(1, -1) for _ in mf.shape[2:])
    return not (mf[interior] == obs).any()


def _scalar_physics_ok(params: SimulationParams, magnetic_flags=None) -> bool:
    """Physics preconditions of the tau==1 scalar Poisson collapse:
    tau == 1 (no rank-one collapse otherwise); boundary-ring-only
    obstacles — either declared (mag_flags_shell) or verified from the
    concrete flags (the grad substitution discards obstacle psi only at
    domain edges; interior-obstacle psi differs between forms); an
    axis-aligned static external field; and a non-f64 h storage (the
    scalar carry is f32 — converting an f64 solve would silently drop
    precision, e.g. the f64 golden-parity configurations)."""
    return (
        params.scalar_carry
        and float(params.tau) == 1.0
        and jnp.dtype(params.h_dtype) != jnp.float64
        and params.h_ext_axis in tuple(range(params.dim))
        and (
            (params.mag_flags_shell and params.phys_extent is None)
            or (
                magnetic_flags is not None
                and _mag_boundary_only(magnetic_flags, params.phys_extent)
            )
        )
    )


def _scalar_carry_ok(params: SimulationParams, state) -> bool:
    """True when the magnetic solve can ride the scalar tau==1 collapse
    (ops/scalar_poisson.py): the step then carries the fused (s, s_prev)
    pair instead of the Q-channel h.  NOT gated on the Pallas wavefront
    shape (round-4 verdict #1): solve_H_int_scalar dispatches the fused
    kernel when shapes allow and exact-order jnp sweeps otherwise, so
    the collapse engages on lane-unaligned native-resolution grids
    (130x66x130 Rosensweig, 98x384 two-droplets) and in 2D."""
    return _scalar_physics_ok(params, state.magnetic_flags) and (
        state.h.shape[0] == 1
    )


def _scalar_convert(params: SimulationParams, state, mesh=None,
                    interp=False):
    """(h2, cmask) of the tau==1 scalar Poisson carry, or None.

    Converts the canonical channel h (zeros at init; post-collision h
    from any tau==1 run) to the fused (s, s_prev) pair + the static
    cmask field (ops/scalar_poisson.py derivation; exact for canonical
    h).  The solve then reads/writes 2 f32 channels per step instead of
    19 — independent of the f/g storage mode and of whether the
    capillogue fusion runs (the collapse replaces h storage entirely,
    so f32 and bf16-h modes gain the same ~19x Poisson-traffic win).
    With ``mesh`` the gate is the slab/DP form (scalar_sharded_ok):
    ghost bands then carry 2 f32 channels instead of 19xh; when neither
    the scalar slab plan nor the channel slab kernels can take the shape
    (lane-unaligned grids) the conversion still engages — the exact-order
    jnp sweeps GSPMD-partition and beat the Q-channel jnp solve."""
    if state.h.shape[1] == 2:
        return None
    B = state.h.shape[0]
    if mesh is None or params.lattice.dim != 3:
        ok = _scalar_carry_ok(params, state)
    else:
        from ..parallel.step3d import scalar_sharded_ok, sharded3d_ok

        ok = (
            _scalar_physics_ok(params, state.magnetic_flags)
            and B == 1
            and (
                scalar_sharded_ok(
                    mesh, (B, 2, *state.h.shape[2:]),
                    params.poisson_iters, interp,
                )
                # channel slab kernels can't take the shape either:
                # both solves fall back to jnp+GSPMD, where the scalar
                # form wins — convert
                or not sharded3d_ok(mesh, state.h.shape, interp)
            )
        )
    if not ok:
        return None
    from ..ops.scalar_poisson import (
        make_cmask, s_prev_from_h, scalar_from_h,
    )

    s = scalar_from_h(state.h, state.magnetic_flags)
    sp = s_prev_from_h(state.h, state.magnetic_flags)
    h = jnp.concatenate([s, sp], axis=1).astype(jnp.float32)
    return h, make_cmask(state.magnetic_flags)


def _prime_steady(params: SimulationParams, state, density, premac,
                  mesh=None, interp=False):
    """Shared tail of prime_premac: when the capillogue steady state will
    run (gates checked by the CALLER, which must mirror the step's), carry
    the pre-scaled Poisson rhs as a 6th premac leaf and elide the
    write-only diagnostics — phi (its only in-step consumer was the rhs
    chain; models.phi_field derives it from density on demand) and force
    (the reference overwrites it unread each step,
    LBM_collision_HCZ_3d.py:225).  lax.scan needs this structure from the
    very first carry."""
    import dataclasses

    from ..ops.magnetic import poisson_rhs_scaled

    phi = -(
        2.0 * (density - params.density_gas)
        / (params.density_fluid - params.density_gas) - 1.0
    )
    hext_static = tuple(
        float(params.mag_strength) if d == params.h_ext_axis else 0.0
        for d in range(3)
    )
    rhs = poisson_rhs_scaled(
        phi, state.magnetic_flags, None, hext_static,
        tau=params.tau, dx=params.dx, dt=params.dt, dim=3,
    )
    # H_ext is likewise elided: no step path reads the stored volume (H2
    # folds the static params.h_ext_axis field in-kernel; the rhs chain
    # uses H_ext_mac), and carrying it as a donated passthrough costs a
    # 3-channel buffer-shuffle copy every step (~0.6 ms at 256^3,
    # device-traced).  make_H_ext rebuilds it on demand.
    h, cmask = state.h, state.cmask
    conv = _scalar_convert(params, state, mesh=mesh, interp=interp)
    if conv is not None:
        h, cmask = conv
    return dataclasses.replace(
        state, h=h, cmask=cmask, premac=premac + (rhs,), phi=None,
        force=None, H_ext=None,
    )


def prime_premac(
    params: SimulationParams, state: FerrofluidState, mesh=None
):
    """Populate ``state.premac`` so subsequent fast-path steps skip their
    prologue kernel (the mac-carry optimization: each epilogue's trailing
    stage computes the next step's streamed macros in-kernel, so f and g
    are read from HBM once per step instead of twice).

    Run once before a scan/chunked run — lax.scan needs a structure-stable
    carry, so premac must exist before the first scanned step.  With
    ``mesh`` the sharded fast path is primed instead (slab-mode prologue;
    subsequent ``ferrofluid_step(..., mesh=mesh)`` calls run mac-carried).
    No-op when the corresponding fast path cannot engage.
    """
    import dataclasses
    import os

    lat = params.lattice
    from ..ops.pallas.fused_step import (
        emit_mac_fits,
        fused_step_supported,
        lbm_prologue,
    )

    # catch shell-declaration violations for states that bypassed
    # init_ferrofluid_state (checkpoint resume, replaced flags)
    validate_mag_shell(params, state.magnetic_flags)

    if os.environ.get("LBM_DISABLE_PALLAS") or not params.use_pallas:
        return state
    if state.premac is not None:
        return state

    if lat.dim != 3:
        # 2D: no fused kernels exist — the tau==1 scalar Poisson carry
        # is the only priming (D2Q9 collapse, ops/scalar_poisson.py;
        # e.g. the 98x384 two-droplets demo's 30-iteration solve drops
        # from 9 streamed channels to 2 scalar fields)
        conv = _scalar_convert(params, state)
        if conv is not None:
            return dataclasses.replace(state, h=conv[0], cmask=conv[1])
        return state

    if mesh is not None:
        from ..parallel.step3d import (
            default_interpret,
            fused_prologue_sharded,
            fused_step_sharded_ok,
        )

        interp = default_interpret()
        if not (
            fused_step_sharded_ok(mesh, state.f.shape, params.kbc_type, interp)
            and emit_mac_fits(state.f.shape, state.f.dtype)
        ):
            # no sharded fused kernels for this shape — the scalar
            # tau==1 carry still applies (slab kernel when the plan
            # exists, GSPMD jnp sweeps otherwise)
            conv = _scalar_convert(params, state, mesh=mesh, interp=interp)
            if conv is not None:
                return dataclasses.replace(
                    state, h=conv[0], cmask=conv[1]
                )
            return state
        rho, vel, density, m0g, m1g = fused_prologue_sharded(
            state.f, state.g, state.flags, state.rho, state.vel, mesh,
            c=params.dx / params.dt, rho_gas=params.rho_gas,
            rho_fluid=params.rho_fluid, density_gas=params.density_gas,
            density_fluid=params.density_fluid, interpret=interp,
        )
        premac = (rho, vel, density, m0g, m1g)

        # sharded capillogue steady state: same 6-tuple + elided-diagnostic
        # priming as the single-device path (gates must agree with the
        # step's so the lax.scan carry is structure-stable)
        from ..parallel.step3d import capillogue_sharded_ok

        grav = tuple(float(gv) for gv in params.gravity_vec().reshape(-1))
        rhs_cfg = _capillogue_rhs_cfg(params)
        if (
            capillogue_sharded_ok(mesh, state.f.shape, state.f.dtype, interp)
            and len(grav) == 3
            and rhs_cfg is not None
        ):
            return _prime_steady(
                params, state, density, premac, mesh=mesh, interp=interp
            )
        conv = _scalar_convert(params, state, mesh=mesh, interp=interp)
        if conv is not None:
            return dataclasses.replace(
                state, premac=premac, h=conv[0], cmask=conv[1]
            )
        return dataclasses.replace(state, premac=premac)

    force_fast = force_fastpath()
    fastpath = (
        fused_step_supported(lat, state.f.shape, params.kbc_type)
        and ((jax.default_backend() == "tpu"
              and len(jax.devices()) == 1) or force_fast)
    )
    if not fastpath:
        # lane-unaligned grids (every reference demo's native
        # resolution) or a non-fused backend: no mac-carry, but the
        # tau==1 scalar Poisson carry still engages — solve_H_int_scalar
        # runs exact-order jnp sweeps there (round-4 verdict #1)
        conv = _scalar_convert(params, state)
        if conv is not None:
            return dataclasses.replace(state, h=conv[0], cmask=conv[1])
        return state
    # The scalar tau==1 Poisson carry is independent of the mac-carry /
    # capillogue fusions (it replaces h storage entirely): convert it on
    # EVERY fast-path mode, including f32/bf16-h where the capillogue
    # does not fit (round-4 decoupling; the step's h.shape[1]==2 branch
    # handles rhs computation when no premac rhs leaf is carried).
    conv = _scalar_convert(params, state)
    scalar_updates = {} if conv is None else {"h": conv[0], "cmask": conv[1]}
    if not emit_mac_fits(state.f.shape, state.f.dtype):
        if scalar_updates:
            return dataclasses.replace(state, **scalar_updates)
        return state
    rho, vel, density, m0g, m1g = lbm_prologue(
        state.f, state.g, state.flags, state.rho, state.vel,
        c=params.dx / params.dt, rho_gas=params.rho_gas,
        rho_fluid=params.rho_fluid, density_gas=params.density_gas,
        density_fluid=params.density_fluid, interpret=force_fast,
    )
    premac = (rho, vel, density, m0g, m1g)

    # When the capillogue path will run (its emission carries the NEXT
    # step's Poisson rhs), premac must be a 6-tuple from the start —
    # lax.scan needs a structure-stable carry.  Same gates as the step.
    from ..ops.pallas.capillogue import capillogue_fits

    grav = tuple(float(gv) for gv in params.gravity_vec().reshape(-1))
    rhs_cfg = _capillogue_rhs_cfg(params)
    if (
        capillogue_fits(state.f.shape, state.f.dtype)
        and len(grav) == 3
        and rhs_cfg is not None
    ):
        return _prime_steady(params, state, density, premac)
    return dataclasses.replace(state, premac=premac, **scalar_updates)


ferrofluid_step = partial(
    jax.jit, static_argnums=0, donate_argnums=1, static_argnames="mesh"
)(ferrofluid_step_impl)
