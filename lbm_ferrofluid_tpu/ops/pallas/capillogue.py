"""Capillogue: capillary gradmac + HCZ collide + mac emission in ONE pass.

Fuses ops/pallas/capmac.py (gradients of the four HCZ stencil fields +
force assembly + vel/pressure recovery, with the in-kernel Laplacian)
INTO ops/pallas/fused_step.py's emit_mac epilogue (re-stream + collide +
next-step prologue emission).  What this buys over the two-kernel
composition (device-trace numbers at 128x256^2, turbo):

* dfai/dprho NEVER touch HBM (they are consumed by the collision in the
  same body that computes them): -12 channel-volumes/step.
* the epilogue's 15-channel macro input ring disappears — the collision
  reads the capillary stage's in-register outputs: -13 channel reads.
* density(rho_ca) is emitted as a kernel output: the separate jnp
  rho_to_density pass goes away.

Pipeline cadence (single device, periodic z-wrap on f/g, clamp on the
stencil fields; output plane p = t - 2):

  body t:  wait capillary-stream plane t+1, derive fai/prho/chi(t+1)
           wait f/g/flags plane t-1 (collide window of p is t-3..t-1)
           Laplacian plane t from the rho_ca ring (zero plane at Z-1)
           capillary stage at p: grads -> force/dfai/dprho,
             vel/pressure recovery, density(rho_ca)
           collide plane p from the re-streamed window + the stage's
             in-register macros; store f'/g' (3-slot ring, in-place
             aliased outputs), store vel/pres/force/density (2-slot)
           emit mac plane p-1 (interior; the two wrap planes re-read the
             collided planes 0/1 from the aliased outputs post-loop)

Semantics are exactly capmac + emit_mac-epilogue composition (agreement
is modulo XLA FMA contraction — see tests/test_capillogue.py).
Reference: HCZ_3d.py:21-263 (capillary_process) + HCZ_3d.py:213-263 and
LBM_propagation_3d.py:18-111 (collide + propagation), as the two kernels
it fuses.  Single-device turbo path only: the slab/multi-chip path keeps
the separate kernels (different per-chip scale; f32 storage overflows
VMEM — see capillogue_fits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...lattice import D3Q19
from ...utils.types import CellType
from ..collide import CHI_K, smooth_phi
from ..moments import eos_pressure
from .fused_step import (
    _ghost_copies,
    _in_copies,
    _moments,
    _rem,
    _stream_plane,
)
from .hcz3d import _feq_rows, _gamma_rows
from .stencil3d import (
    _GRAD_TAPS,
    _LAP_TAPS,
    _ring_replicate_plane,
    _shift_replicate,
)

__all__ = ["capillogue_fits", "lbm_capillogue"]

_OBS = int(CellType.OBSTACLE)
_FLUID = int(CellType.FLUID)


def capillogue_fits(shape, fg_dtype) -> bool:
    """VMEM gate for the fused kernel (v5e, 120 MB Mosaic budget).

    Fixed rings at bf16 f/g on 256^2 planes come to ~73 MB; the scoped
    temporaries (38 re-streamed f32 planes for the collide + another 38
    for the mac emission + the grad-stage planes) fit under the budget.
    f32 storage pushes the f/g rings alone past it — those modes keep
    the capmac + epilogue composition.
    """
    B, Q, Z, Y, X = shape
    if not (B == 1 and Q == 19 and X % 128 == 0 and Y % 8 == 0 and Z >= 4):
        return False
    bpp = jnp.dtype(fg_dtype).itemsize * Y * X
    f32p = 4 * Y * X
    fixed = (
        2 * 19 * (4 + 3 + 1) * bpp  # f/g input rings + NS=3 stores + seam
        + 4 * 4 * Y * X             # flags ring (int32)
        + 12 * 5 * f32p             # capillary stream rings (phi folded)
        + 6 * 5 * f32p              # drv (fai/prho/lap-rep/chi/chi-rep) + lap
        + 8 * 2 * f32p              # vel/pres/force/density store ring
        + 9 * 2 * f32p              # mac store ring
        + 5 * f32p                  # wrap flags/rho_ca/vel stashes
    )
    return fixed <= 80 * 1024 * 1024


def _capillogue_kernel(kappa, gravity, mu0_half, rho_gas, rho_fluid,
                       density_gas, density_fluid, tau_f, tau_g, dx, dt,
                       Z, fg_dtype, emit_rhs, emit_force, slab, bounds,
                       *refs):
    lat = D3Q19
    n_cap = (9 if emit_rhs else 8) + (1 if slab else 0)
    (f_ref, g_ref, flags_ref,
     rho_ref, den_ref, pres_ref, rhoca_ref, h2_ref,
     gsum_ref, gmom_ref, velold_ref) = refs[:11]
    off = 11
    if emit_rhs:
        mflags_ref = refs[off]
        off += 1
    if slab:
        # slab mode (multi-chip z-decomposition): neighbor ghost planes
        # replace the periodic z-wrap reads/clamps — f/g pre-collision
        # edge planes, the 5 capillary stencil-window fields, the two
        # PRE-COMPUTED boundary Laplacian planes (lap of the NEIGHBOR's
        # last/first density(rho_ca) plane, built by the wrapper from one
        # 2-plane rho_ca exchange), and the per-device SMEM z-clamp bounds
        # (only true domain edges clamp — capmac.py's convention:
        # lo=-1/hi=Z on interior slabs means "no clamp, windows may read
        # the ghost planes").
        flo_ref, fhi_ref, glo_ref, ghi_ref = refs[off:off + 4]
        capgh_lo = refs[off + 4:off + 10]   # rho, den, pres, rhoca, flags, lap
        capgh_hi = refs[off + 10:off + 16]
        clamp_ref = refs[off + 16]
        off += 17
    n_out = 11 if emit_force else 10
    if emit_force:
        (fout_ref, gout_ref, velout_ref, presout_ref, forceout_ref,
         denout_ref, mo_rho, mo_vel, mo_den, mo_m0g,
         mo_m1g) = refs[off:off + n_out]
    else:
        # force is a write-only diagnostic (the reference overwrites it
        # unread each step, LBM_collision_HCZ_3d.py:225): the steady state
        # skips its 3-channel output entirely
        (fout_ref, gout_ref, velout_ref, presout_ref, denout_ref,
         mo_rho, mo_vel, mo_den, mo_m0g, mo_m1g) = refs[off:off + n_out]
        forceout_ref = None
    off += n_out
    if emit_rhs:
        mo_rhs = refs[off]
        off += 1
    scr = refs[off:]
    f_ring, g_ring, fl_ring = scr[0:3]
    cap_rings = scr[3:3 + n_cap]   # rho, den, pres, rhoca, h2, gsum(1), gmom(3), vel(3)[, mflags][, flags2]
    o = 3 + n_cap
    drv = scr[o:o + 5]             # fai, prho, lap-rep, chi, chi-rep
    lap_ring = scr[o + 5]
    o += 6
    if slab:
        f_store, g_store = scr[o:o + 2]
        cap_store, mac_store = scr[o + 2:o + 4]
        o += 4
        f_seam = g_seam = flpost = mcpost = mfpost = None
        (sem_f, sem_g, sem_fl) = scr[o:o + 3]
        sems_cap = scr[o + 3:o + 3 + n_cap]
        (sem_fo, sem_go, sem_co, sem_mo, sem_lg) = scr[o + 3 + n_cap:]
        sem_s = sem_post = None
    else:
        f_store, g_store, f_seam, g_seam = scr[o:o + 4]
        cap_store, mac_store, flpost, mcpost = scr[o + 4:o + 8]
        o += 8
        if emit_rhs:
            mfpost = scr[o]
            o += 1
        (sem_f, sem_g, sem_fl) = scr[o:o + 3]
        sems_cap = scr[o + 3:o + 3 + n_cap]
        (sem_fo, sem_go, sem_co, sem_mo, sem_s, sem_post) = scr[o + 3 + n_cap:]

    Y, X = f_ref.shape[2], f_ref.shape[3]
    # effective in-plane hi edges of the boundary-ring fixes: the
    # PHYSICAL box faces on OBSTACLE-padded layouts (params.phys_extent),
    # where the reference's array faces live; the padded region beyond is
    # dead (all cells OBSTACLE, outputs masked)
    by, bx = bounds if bounds is not None else (Y, X)
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    inv12dx = 1.0 / (12.0 * dx)
    inv6dx2 = 1.0 / (6.0 * dx * dx)

    fg_streams = [
        (f_ref, f_ring, sem_f),
        (g_ref, g_ring, sem_g),
        (flags_ref, fl_ring, sem_fl),
    ]
    cap_refs = [rho_ref, den_ref, pres_ref, rhoca_ref, h2_ref,
                gsum_ref, gmom_ref, velold_ref]
    cap_names = ["rho", "den", "pres", "rhoca", "h2", "gsum",
                 "gmom", "vel"]
    if emit_rhs:
        cap_refs.append(mflags_ref)
        cap_names.append("mflags")
    if slab:
        # a SECOND stream of the flags array for the capillary stage's
        # window reads: the shared f/g flags ring is 4-slot with no room
        # for ghost planes, so slab mode streams flags again into a 5-slot
        # ring whose ghost slots mirror the other stencil fields
        cap_refs.append(flags_ref)
        cap_names.append("flags2")
    cap_idx = {n: i for i, n in enumerate(cap_names)}

    def slot5(q):
        # +5 maps the slab ghost plane q=-1 to slot 4 (lax.rem truncates
        # toward zero); identical to q%5 for q >= 0
        return _rem(q + 5, 5)

    def cap_copies(q):
        slot = slot5(q)
        return [
            pltpu.make_async_copy(
                ref.at[:, pl.ds(q, 1)], ring.at[:, pl.ds(slot, 1)],
                sem.at[slot],
            )
            for ref, ring, sem in zip(cap_refs, cap_rings, sems_cap)
        ]

    if slab:
        _gh_fields = ["rho", "den", "pres", "rhoca", "flags2"]

        def cap_ghost_copies(which):
            srcs, q = (capgh_lo, -1) if which == "lo" else (capgh_hi, Z)
            slot = slot5(q)
            cps = [
                pltpu.make_async_copy(
                    srcs[j], cap_rings[cap_idx[n]].at[:, pl.ds(slot, 1)],
                    sems_cap[cap_idx[n]].at[slot],
                )
                for j, n in enumerate(_gh_fields)
            ]
            # the pre-computed boundary Laplacian plane rides into the
            # lap ring's ghost slot (its own 2-slot DMA semaphore: the
            # lap ring has no DMA traffic otherwise)
            cps.append(pltpu.make_async_copy(
                srcs[5], lap_ring.at[:, pl.ds(slot, 1)],
                sem_lg.at[0 if which == "lo" else 1],
            ))
            return cps

        def derive_ghost(q):
            # derived fields + the lap replicate for a landed ghost plane
            compute_derived(q)
            slot = slot5(q)
            drv[2][0, slot] = _ring_replicate_plane(
                lap_ring[0, slot], Y, X, by, bx
            )

    def cplane(name, q, ch=0):
        return cap_rings[cap_idx[name]][ch, slot5(q)]

    # ---- derived per-plane fields (capmac.py semantics) ---------------
    def density_of(rho):
        return density_gas + (density_fluid - density_gas) * (
            (rho - rho_gas) / (rho_fluid - rho_gas)
        )

    def compute_derived(q):
        slot = slot5(q)
        rho = cplane("rho", q)
        drv[0][0, slot] = _ring_replicate_plane(
            eos_pressure(rho, dx=dx, dt=dt) - rho * RT, Y, X, by, bx
        )
        drv[1][0, slot] = _ring_replicate_plane(
            cplane("pres", q) - RT * cplane("den", q), Y, X, by, bx
        )
        # phi in-register from the SAME density the step's jnp glue used
        # (bit-identical expression order: models/ferrofluid.py phi=...),
        # so the 1-channel phi volume is never read by this kernel
        phi_q = -(
            2.0 * (cplane("den", q) - density_gas)
            / (density_fluid - density_gas)
            - 1.0
        )
        cr = CHI_K * (1.0 - smooth_phi(phi_q, 0.1 * dx))
        drv[3][0, slot] = cr
        drv[4][0, slot] = _ring_replicate_plane(cr, Y, X, by, bx)

    def fill_lap(q, zero_if=None):
        win = {oz: density_of(cplane("rhoca", q + oz)) for oz in (-1, 0, 1)}
        acc = None
        for (oz, oy, ox), wgt in _LAP_TAPS:
            tp = _shift_replicate(win[oz], -oy, -ox, Y, X) * wgt
            acc = tp if acc is None else acc + tp
        res = acc * inv6dx2
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = (col == 0) | (col == bx - 1) | (row == 0) | (row == by - 1)
        res = jnp.where(edge, jnp.zeros((), res.dtype), res)
        if zero_if is not None:
            # slab boundary plane: the whole-plane zero applies only on a
            # TRUE domain z-edge (runtime per-device clamp bound)
            res = jnp.where(zero_if, jnp.zeros((), res.dtype), res)
        slot = slot5(q)
        lap_ring[0, slot] = res
        drv[2][0, slot] = _ring_replicate_plane(res, Y, X, by, bx)

    def fill_lap_zero(q):
        lap_ring[0, slot5(q)] = jnp.zeros((Y, X), jnp.float32)

    # ---- output machinery ---------------------------------------------
    NS = 3

    def fg_out_copies(p):
        slot = _rem(p, NS)
        return (
            pltpu.make_async_copy(
                f_store.at[:, pl.ds(slot, 1)], fout_ref.at[:, pl.ds(p, 1)],
                sem_fo.at[slot],
            ),
            pltpu.make_async_copy(
                g_store.at[:, pl.ds(slot, 1)], gout_ref.at[:, pl.ds(p, 1)],
                sem_go.at[slot],
            ),
        )

    # (ref, cap_store channel offset, n channels); the ring keeps the full
    # vel/pres/force/den channel layout either way — without emit_force the
    # force slots simply go unwritten and un-DMA'd
    cap_out_parts = (
        (velout_ref, 0, 3), (presout_ref, 3, 1),
    ) + (
        ((forceout_ref, 4, 3),) if emit_force else ()
    ) + (
        (denout_ref, 7, 1),
    )

    def cap_out_copies(p):
        slot = _rem(p, 2)
        return [
            pltpu.make_async_copy(
                cap_store.at[pl.ds(off, nc), pl.ds(slot, 1)],
                ref.at[:, pl.ds(p, 1)],
                sem_co.at[slot],
            )
            for ref, off, nc in cap_out_parts
        ]

    def mac_copy(j, p):
        slot = _rem(j, 2)
        parts = (
            (mo_rho, 0, 1), (mo_vel, 1, 3), (mo_den, 4, 1),
            (mo_m0g, 5, 1), (mo_m1g, 6, 3),
        ) + (((mo_rhs, 9, 1),) if emit_rhs else ())
        return [
            pltpu.make_async_copy(
                mac_store.at[pl.ds(off, nc), pl.ds(slot, 1)],
                ref.at[:, pl.ds(p, 1)],
                sem_mo.at[slot],
            )
            for ref, off, nc in parts
        ]

    def emit_mac_plane(j, p, s0, sm, sp, flags_row, rho_old, vel_old,
                       mflags_row=None):
        """Next step's prologue for plane p from the collided VMEM store
        rings (fused_step.py:_epilogue_kernel's emission, verbatim), plus
        — with ``emit_rhs`` — the NEXT step's pre-scaled Poisson source
        term from the just-emitted density (the external field is static
        and axis-aligned along an IN-PLANE axis, so the staggered
        difference is a clamped in-plane shift; exact arithmetic of
        ops/magnetic.py:poisson_rhs_scaled)."""
        post_f, is_obs = _stream_plane(f_store, (s0, sm, sp), flags_row, Y, X)
        post_g, _ = _stream_plane(g_store, (s0, sm, sp), flags_row, Y, X)
        m0f, m1f = _moments(post_f)
        m0g, m1g = _moments(post_g)
        rho_n = jnp.where(is_obs, rho_old, m0f)
        density_n = density_gas + (density_fluid - density_gas) * (
            (rho_n - rho_gas) / (rho_fluid - rho_gas)
        )
        inv_rho = c / rho_n

        @pl.when(j - 2 >= 0)
        def _():
            for cp in mac_copy(j - 2, 0):
                cp.wait()

        slot = _rem(j, 2)
        mac_store[0, slot] = rho_n
        for d in range(3):
            mac_store[1 + d, slot] = jnp.where(
                is_obs, vel_old[d], m1f[d] * inv_rho
            )
        mac_store[4, slot] = density_n
        mac_store[5, slot] = m0g
        for d in range(3):
            mac_store[6 + d, slot] = m1g[d]
        if emit_rhs:
            axis, hm, tau_mag = emit_rhs
            phi_n = -(
                2.0 * (density_n - density_gas)
                / (density_fluid - density_gas) - 1.0
            )
            chi = CHI_K * (1.0 - smooth_phi(phi_n, 0.1 * dx))
            sy, sx = (-1, 0) if axis == 1 else (0, -1)
            chi_p = _shift_replicate(chi, sy, sx, Y, X)
            chi_m = _shift_replicate(chi, -sy, -sx, Y, X)
            d_ = (0.5 * (chi + chi_p)) * hm - (0.5 * (chi_m + chi)) * hm
            N = Y if axis == 1 else X
            idx = jax.lax.broadcasted_iota(
                jnp.int32, (Y, X), 0 if axis == 1 else 1
            )
            d_ = jnp.where(
                (idx == 0) | (idx == N - 1), jnp.zeros((), d_.dtype), d_
            )
            rhs = d_ * dx / (1.0 + chi)
            rhs = jnp.where(
                mflags_row == _FLUID, rhs, jnp.zeros((), rhs.dtype)
            )
            mac_store[9, slot] = (dt * rhs) * (
                cs2 * (0.5 - tau_mag) * dt
            )
        for cp in mac_copy(j, p):
            cp.start()

    # ---- preamble ------------------------------------------------------
    if slab:
        # slab mode: the z-wrap reads come from neighbor ghost refs, so no
        # pristine-plane stash is needed despite the in-place aliasing
        # (fused_step.py's slab epilogue pattern); plane -1 of f/g is the
        # lo ghost, flags' -1 slot is a harmless wrapped filler (only the
        # flags2 cap ring feeds the capillary stage's windows)
        seam_cps = []
        for cp in _ghost_copies(0, [(flo_ref, f_ring, sem_f),
                                    (glo_ref, g_ring, sem_g)]):
            cp.start()
        for cp in _in_copies(fg_streams[2:], -1, Z):
            cp.start()
        for cp in cap_ghost_copies("lo"):
            cp.start()
        for w in (0, 1, 2):
            for cp in _in_copies(fg_streams, w, Z):
                cp.start()
    else:
        # f/g plane 0 is overwritten in place at body 2; stash it pristine
        # for the z-wrap re-read (fused_step.py's seam pattern)
        seam_cps = [
            pltpu.make_async_copy(
                f_ref.at[:, pl.ds(0, 1)], f_seam, sem_s.at[0]
            ),
            pltpu.make_async_copy(
                g_ref.at[:, pl.ds(0, 1)], g_seam, sem_s.at[1]
            ),
        ]
        for cp in seam_cps:
            cp.start()
        # planes -1..2 fill all 4 f/g ring slots (bodies start from plane
        # 3: body t starts plane t+1, and the first body is t = 2)
        for w in (-1, 0, 1, 2):
            for cp in _in_copies(fg_streams, w, Z):
                cp.start()
    for q in (0, 1, 2, 3):
        for cp in cap_copies(q):
            cp.start()
    for cp in seam_cps:
        cp.wait()
    for w in (-1, 0):
        for cp in _in_copies(fg_streams, w, Z):
            cp.wait()
    if slab:
        for cp in cap_ghost_copies("lo"):
            cp.wait()
    for q in (0, 1, 2):
        for cp in cap_copies(q):
            cp.wait()
        compute_derived(q)
    if slab:
        derive_ghost(-1)
        # boundary lap plane 0 from the ghost window (-1..1); zeroed only
        # on a true domain lo edge (clamp bound == 1)
        fill_lap(0, zero_if=clamp_ref[0] == 1)
    else:
        fill_lap_zero(0)
    fill_lap(1)

    def body(t, _):
        # capillary streams: plane t+1 lands, derive its pad fields
        @pl.when(t + 1 <= Z - 1)
        def _():
            for cp in cap_copies(t + 1):
                cp.wait()
            compute_derived(t + 1)

        if slab:
            @pl.when(t + 1 == Z)
            def _():
                # hi ghost planes land: the last output plane's window
                # (and the boundary lap) reach plane Z on interior slabs
                for cp in cap_ghost_copies("hi"):
                    cp.wait()
                derive_ghost(Z)

        # f/g/flags: plane t-1 lands (collide window of p = t-2); plane Z
        # is the z-wrap copy (seam-refilled below) — every plane in [1, Z]
        # is waited exactly once, an unconsumed DMA semaphore faults HW
        for cp in _in_copies(fg_streams, t - 1, Z):
            cp.wait()

        @pl.when(t <= Z - 2)
        def _():
            fill_lap(t)

        @pl.when(t == Z - 1)
        def _():
            if slab:
                # from the hi-ghost window (Z-2..Z); zeroed only on a true
                # domain hi edge
                fill_lap(Z - 1, zero_if=clamp_ref[1] == Z - 2)
            else:
                fill_lap_zero(Z - 1)

        p = t - 2

        # ---- capillary stage at plane p (capmac.py body, verbatim) ----
        if slab:
            z_lo, z_hi = clamp_ref[0], clamp_ref[1]
        else:
            z_lo, z_hi = 1, Z - 2
        pc = jnp.clip(p, z_lo, z_hi)
        qs = [pc - 1, pc, pc + 1]

        def fgslot(w):
            return _rem(w + 1, 4)

        if slab:
            flags_q = [cplane("flags2", q) for q in qs]
        else:
            flags_q = [fl_ring[0, fgslot(q)] for q in qs]
        obs_q = [f == _OBS for f in flags_q]

        def clampq(q):
            return jnp.clip(q, z_lo, z_hi)

        def d(i, q):
            return drv[i][0, slot5(q)]

        sub = {}
        sub["fai"] = [d(0, clampq(q)) for q in qs]
        sub["prho"] = [d(1, clampq(q)) for q in qs]
        sub["lap"] = [
            jnp.where(o, d(2, clampq(q)), lap_ring[0, slot5(q)])
            for o, q in zip(obs_q, qs)
        ]
        sub["chi"] = [
            jnp.where(o, d(4, clampq(q)), d(3, q))
            for o, q in zip(obs_q, qs)
        ]

        grads = {}
        for name in ("lap", "fai", "prho", "chi"):
            planes3 = {-1: sub[name][0], 0: sub[name][1], 1: sub[name][2]}
            for dd in range(3):
                acc = None
                for (oz, oy, ox), wgt in _GRAD_TAPS[dd]:
                    tp = _shift_replicate(planes3[oz], -oy, -ox, Y, X) * wgt
                    acc = tp if acc is None else acc + tp
                grads[(name, dd)] = _ring_replicate_plane(acc * inv12dx, Y, X)

        rho_ca_p = cplane("rhoca", p)
        dens = density_of(rho_ca_p)
        h2 = cplane("h2", p)
        force = [
            kappa * dens * grads[("lap", dd)] + gravity[dd] * dens
            - mu0_half * h2 * grads[("chi", dd)]
            for dd in range(3)
        ]
        dfai = [grads[("fai", dd)] for dd in range(3)]
        dprho = [grads[("prho", dd)] for dd in range(3)]

        flags_p = fl_ring[0, fgslot(p)]
        is_fluid = flags_p == _FLUID
        inv_rt_dens = 1.0 / (RT * dens)
        vel_n = [
            jnp.where(
                is_fluid,
                (cplane("gmom", p, dd) * c + 0.5 * dt * RT * force[dd])
                * inv_rt_dens,
                cplane("vel", p, dd),
            )
            for dd in range(3)
        ]
        vdp = vel_n[0] * dprho[0] + vel_n[1] * dprho[1] + vel_n[2] * dprho[2]
        pres_n = jnp.where(
            is_fluid,
            cplane("gsum", p) - 0.5 * dt * vdp,
            cplane("pres", p),
        )

        # ---- collide plane p (fused_step.py epilogue body, the mc_ring
        # reads replaced by the stage's in-register outputs) -------------
        s0, sm, sp_ = fgslot(p), fgslot(p - 1), fgslot(p + 1)
        post_f, _ = _stream_plane(f_ring, (s0, sm, sp_), flags_p, Y, X)
        post_g, _ = _stream_plane(g_ring, (s0, sm, sp_), flags_p, Y, X)
        post_f = [x.astype(fg_dtype).astype(jnp.float32) for x in post_f]
        post_g = [x.astype(fg_dtype).astype(jnp.float32) for x in post_g]

        rho = rho_ca_p
        ux, uy, uz = vel_n
        pp = pres_n
        fx, fy, fz = force
        gx, gy, gz = -dfai[0], -dfai[1], -dfai[2]
        px, py, pz = -dprho[0], -dprho[1], -dprho[2]

        feq = _feq_rows(rho, ux, uy, uz, c)
        gamma = _gamma_rows(ux, uy, uz, c)
        pref_f = dt * dt * (1.0 - 0.5 / tau_f) / cs2
        u_dot_g = ux * gx + uy * gy + uz * gz
        dens_term = cs2 * dens / rho
        p_term = pp - cs2 * dens
        u_dot_f = ux * fx + uy * fy + uz * fz
        u_dot_p = ux * px + uy * py + uz * pz
        pref_g = dt * (1.0 - 0.5 / tau_g)

        @pl.when(p - 2 >= 0)
        def _():
            for cp in fg_out_copies(p - 2):
                cp.wait()
            for cp in cap_out_copies(p - 2):
                cp.wait()

        slot = _rem(p, NS)
        for q in range(19):
            wq = float(lat.weights[q])
            ex, ey, ez = (float(lat.e[q][dd]) for dd in range(3))
            e_dot_g = (ex * gx + ey * gy + ez * gz) * c
            fq = post_f[q]
            coll_f = (
                fq + (feq[q] - fq) / tau_f
                + pref_f * gamma[q] * (e_dot_g - u_dot_g)
            )
            f_store[q, slot] = jnp.where(
                is_fluid, coll_f, fq
            ).astype(fg_dtype)

            geq = wq * p_term + dens_term * feq[q]
            e_dot_f = (ex * fx + ey * fy + ez * fz) * c
            e_dot_p = (ex * px + ey * py + ez * pz) * c
            gq = post_g[q]
            coll_g = (
                gq + (geq - gq) / tau_g
                + pref_g * (
                    gamma[q] * (e_dot_f - u_dot_f)
                    + (gamma[q] - wq) * (e_dot_p - u_dot_p)
                )
            )
            g_store[q, slot] = jnp.where(
                is_fluid, coll_g, gq
            ).astype(fg_dtype)

        cslot = _rem(p, 2)
        for dd in range(3):
            cap_store[dd, cslot] = vel_n[dd]
            if emit_force:
                cap_store[4 + dd, cslot] = force[dd]
        cap_store[3, cslot] = pres_n
        cap_store[7, cslot] = dens
        for cp in fg_out_copies(p):
            cp.start()
        for cp in cap_out_copies(p):
            cp.start()

        # ---- mac emission at plane p-1 = t-3 (interior planes only;
        # the wrap planes 0 and Z-1 are emitted post-loop).  Must run
        # BEFORE cap plane t+2 starts: its DMA overwrites the rho_ca and
        # vel_old ring slots of plane t-3.
        @pl.when(t >= 4)
        def _():
            pe = t - 3
            emit_mac_plane(
                t - 4, pe,
                _rem(pe, NS), _rem(pe - 1, NS), _rem(pe + 1, NS),
                fl_ring[0, fgslot(pe)],
                cplane("rhoca", pe),
                [cap_store[dd, _rem(pe, 2)] for dd in range(3)],
                cplane("mflags", pe) if emit_rhs else None,
            )

        # ---- next inputs ------------------------------------------------
        @pl.when(t + 2 <= Z - 1)
        def _():
            for cp in cap_copies(t + 2):
                cp.start()

        if slab:
            @pl.when(t + 2 == Z)
            def _():
                # hi ghost planes: started AFTER this body's stage reads
                # (their ring slots slot5(Z) hold plane Z-5, last read at
                # this body's window p = Z-4)
                for cp in cap_ghost_copies("hi"):
                    cp.start()

        @pl.when(t + 1 <= Z - 1)
        def _():
            for cp in _in_copies(fg_streams, t + 1, Z):
                cp.start()

        @pl.when(t + 1 == Z)
        def _():
            # z-wrap plane of f/g: from the pristine seam stash — or, in
            # slab mode, from the z-next neighbor's ghost planes; flags
            # re-read normally (un-aliased)
            wslot = _rem(Z + 1, 4)
            if slab:
                for cp in _ghost_copies(wslot, [(fhi_ref, f_ring, sem_f),
                                                (ghi_ref, g_ring, sem_g)]):
                    cp.start()
            else:
                pltpu.make_async_copy(
                    f_seam, f_ring.at[:, pl.ds(wslot, 1)], sem_f.at[wslot]
                ).start()
                pltpu.make_async_copy(
                    g_seam, g_ring.at[:, pl.ds(wslot, 1)], sem_g.at[wslot]
                ).start()
            for cp in _in_copies(fg_streams[2:], Z, Z):
                cp.start()

        return 0

    jax.lax.fori_loop(2, Z + 2, body, 0)
    for dd in (2, 1):
        for cp in fg_out_copies(Z - dd):
            cp.wait()
        for cp in cap_out_copies(Z - dd):
            cp.wait()

    if slab:
        # slab mode: only the interior mac planes [1, Z-2] were emitted
        # in-body — the two boundary planes need NEIGHBOR collided planes,
        # which the shard_map wrapper exchanges and fixes up post-kernel
        # (parallel/step3d.py).  Drain the last two in-flight emissions
        # (j = Z-4, Z-3; every earlier j was waited by emission j+2).
        for j in (Z - 4, Z - 3):
            for cp in mac_copy(j, 0):
                cp.wait()
        return

    # ---- wrap mac emissions (planes Z-1 and 0), as the epilogue's ------
    slot_a = _rem(Z, NS)       # receives collided plane 0
    slot_b = _rem(Z + 1, NS)   # receives collided plane 1
    post0 = [
        pltpu.make_async_copy(
            fout_ref.at[:, pl.ds(0, 1)], f_store.at[:, pl.ds(slot_a, 1)],
            sem_post.at[0],
        ),
        pltpu.make_async_copy(
            gout_ref.at[:, pl.ds(0, 1)], g_store.at[:, pl.ds(slot_a, 1)],
            sem_post.at[1],
        ),
        pltpu.make_async_copy(
            flags_ref.at[:, pl.ds(0, 1)], flpost, sem_post.at[2],
        ),
        # rho_old of plane 0 = rho_ca (un-aliased input); vel_old = the
        # recovered velocity (this kernel's own drained output)
        pltpu.make_async_copy(
            rhoca_ref.at[:, pl.ds(0, 1)], mcpost.at[0:1], sem_post.at[3],
        ),
        pltpu.make_async_copy(
            velout_ref.at[:, pl.ds(0, 1)], mcpost.at[1:4], sem_post.at[4],
        ),
    ]
    if emit_rhs:
        post0.append(pltpu.make_async_copy(
            mflags_ref.at[:, pl.ds(0, 1)], mfpost, sem_post.at[7],
        ))
    for cp in post0:
        cp.start()
    for cp in post0:
        cp.wait()
    emit_mac_plane(
        Z - 2, Z - 1,
        _rem(Z - 1, NS), _rem(Z - 2, NS), slot_a,
        fl_ring[0, _rem(Z, 4)],
        cap_rings[cap_idx["rhoca"]][0, slot5(Z - 1)],
        [cap_store[dd, _rem(Z - 1, 2)] for dd in range(3)],
        cplane("mflags", Z - 1) if emit_rhs else None,
    )
    post1 = [
        pltpu.make_async_copy(
            fout_ref.at[:, pl.ds(1, 1)], f_store.at[:, pl.ds(slot_b, 1)],
            sem_post.at[5],
        ),
        pltpu.make_async_copy(
            gout_ref.at[:, pl.ds(1, 1)], g_store.at[:, pl.ds(slot_b, 1)],
            sem_post.at[6],
        ),
    ]
    for cp in post1:
        cp.start()
    for cp in post1:
        cp.wait()
    emit_mac_plane(
        Z - 1, 0,
        slot_a, _rem(Z - 1, NS), slot_b,
        flpost[0, 0],
        mcpost[0, 0],
        [mcpost[1 + dd, 0] for dd in range(3)],
        mfpost[0, 0] if emit_rhs else None,
    )
    for j in (Z - 2, Z - 1):
        for cp in mac_copy(j, 0):
            cp.wait()


@functools.partial(jax.jit, static_argnames=(
    "kappa", "gravity", "mu0_half", "rho_gas", "rho_fluid", "density_gas",
    "density_fluid", "tau_f", "tau_g", "dx", "dt", "emit_rhs", "emit_force",
    "rebatch", "interpret", "bounds",
))
def lbm_capillogue(
    f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
    g_sum, g_mom, vel_old, magnetic_flags=None,
    ghosts=None, cap_ghosts=None, clamp=None, *,
    kappa, gravity, mu0_half, rho_gas, rho_fluid, density_gas,
    density_fluid, tau_f, tau_g, dx=1.0, dt=1.0, emit_rhs=None,
    emit_force=True, rebatch=True, interpret=False, bounds=None,
):
    """One fused pass: capillary stage + HCZ collide + mac emission.

    Inputs are the mac-carried step's fields: ``rho_pre``/``density_pre``/
    ``g_sum``/``g_mom``/``vel_old`` from premac, ``pressure_old`` from the
    previous state, ``rho_ca`` the contact-angle-substituted rho, ``H2``
    from the Poisson stage.  phi is recomputed IN REGISTER from
    ``density_pre`` (bit-identical to the step's jnp phi) — the 1-channel
    phi volume is never read.  Returns
    ``(f', g', vel, pressure, force, density_ca, premac)`` — everything
    ``hcz_capillary`` + ``lbm_epilogue(emit_mac=True)`` produce, with
    dfai/dprho never leaving VMEM.

    ``emit_rhs=(axis, hm, tau_mag)`` (static; axis 0=x or 1=y, hm the
    field magnitude) appends the NEXT step's pre-scaled Poisson source
    term to the emission — exact in-register replica of
    ops/magnetic.py:poisson_rhs_scaled on the emitted density — and
    premac becomes a 6-tuple ``(..., rhs_scaled)``.  Requires
    ``magnetic_flags``.

    ``emit_force=False`` drops the 3-channel force output (returned as
    None): force is a write-only diagnostic of the ferrofluid step — the
    reference itself overwrites it unread each step
    (LBM_collision_HCZ_3d.py:225-232) — so the steady state saves its
    3 channel-volume HBM writes.  The in-register force still drives the
    collision identically.

    Multi-chip slab mode (all three together):
    ``ghosts=(f_lo, f_hi, g_lo, g_hi)`` ([1,19,1,Y,X] pre-collision
    neighbor edge planes), ``cap_ghosts=(lo6, hi6)`` with each a 6-tuple
    of [1,1,1,Y,X] planes in the order (rho_pre, density_pre,
    pressure_old, rho_ca, flags, boundary-lap), and ``clamp`` a
    2-element int32 per-device z-clamp bound (capmac.py convention:
    lo=1/hi=Z-2 on true domain edges, -1/Z on interior slabs).  The
    boundary-lap ghost planes are the Laplacian of density(rho_ca) AT
    the neighbor edge planes, pre-computed by the wrapper from a 2-plane
    rho_ca exchange (parallel/step3d.py:capillogue_sharded).  In slab
    mode the kernel emits only the interior mac planes [1, Z-2]; the
    wrapper fixes up the two boundary planes (incl. the rhs emission)
    post-kernel from one ring exchange of the collided edge planes.

    ``rebatch=False`` returns rank-4 ``[C, Z, Y, X]`` outputs (no leading
    batch dim).  The sharded wrapper needs this: it slices edge planes
    off f'/g'/vel for the boundary fix-up, and slicing the ``[None]``
    re-batch instead makes XLA's layout assignment give the broadcast a
    z-outer ``{4,3,1,2,0}`` layout (so the plane slices fold to bitcasts)
    and then transpose it back for the standard-layout output — two full
    19-channel volume passes per array, ~8.9 ms/step at 256^3 in the
    device trace.  Slicing the raw pallas results (layouts pinned)
    avoids the round trip; the final re-batch broadcast then has a
    single standard-layout consumer and folds to a bitcast.
    """
    _, _, Z, Y, X = f.shape
    flags_i32 = flags[0].astype(jnp.int32)
    f32 = jnp.float32
    args = [
        f[0], g[0], flags_i32,
        rho_pre[0].astype(f32), density_pre[0].astype(f32),
        pressure_old[0].astype(f32), rho_ca[0].astype(f32),
        H2[0].astype(f32),
        g_sum[0].astype(f32), g_mom[0].astype(f32), vel_old[0].astype(f32),
    ]
    if emit_rhs is not None:
        assert magnetic_flags is not None and emit_rhs[0] in (0, 1)
        args.append(magnetic_flags[0].astype(jnp.int32))
    slab = ghosts is not None
    if slab:
        assert cap_ghosts is not None and clamp is not None
        f_lo, f_hi, g_lo, g_hi = ghosts
        lo6, hi6 = cap_ghosts
        assert len(lo6) == 6 and len(hi6) == 6, (
            "cap_ghosts order: rho, den, pres, rhoca, flags, lap"
        )

        def _cg(x, j):
            # flags ghost travels as int32, the rest as f32
            return x[0].astype(jnp.int32 if j == 4 else f32)

        args += [f_lo[0], f_hi[0], g_lo[0], g_hi[0]]
        args += [_cg(x, j) for j, x in enumerate(lo6)]
        args += [_cg(x, j) for j, x in enumerate(hi6)]
        args.append(jnp.asarray(clamp, jnp.int32))
    # output order (names -> indices built dynamically so emit_force /
    # emit_rhs variants keep the alias map consistent)
    out_names = ["f", "g", "vel", "pres"]
    out_shape = [
        jax.ShapeDtypeStruct((19, Z, Y, X), f.dtype),   # f'
        jax.ShapeDtypeStruct((19, Z, Y, X), g.dtype),   # g'
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),        # vel
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),        # pressure
    ]
    if emit_force:
        out_names.append("force")
        out_shape.append(jax.ShapeDtypeStruct((3, Z, Y, X), f32))
    out_names += ["den", "mrho", "mvel", "mden", "m0g", "m1g"]
    out_shape += [
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),        # density(rho_ca)
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),        # mac rho
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),        # mac vel
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),        # mac density
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),        # mac m0g
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),        # mac m1g
    ]
    if emit_rhs is not None:
        out_names.append("rhs")
        out_shape.append(
            jax.ShapeDtypeStruct((1, Z, Y, X), f32)     # mac rhs_scaled
        )
    oi = {n: i for i, n in enumerate(out_names)}
    cap_chans = [1, 1, 1, 1, 1, 1, 3, 3]
    cap_dts = [f32] * 8
    if emit_rhs is not None:
        cap_chans.append(1)
        cap_dts.append(jnp.int32)   # magnetic flags
    if slab:
        cap_chans.append(1)
        cap_dts.append(jnp.int32)   # flags2 (capillary-window flag stream)
    scratch = (
        [
            pltpu.VMEM((19, 4, Y, X), f.dtype),         # f ring
            pltpu.VMEM((19, 4, Y, X), g.dtype),         # g ring
            pltpu.VMEM((1, 4, Y, X), jnp.int32),        # flags ring
        ]
        + [pltpu.VMEM((ch, 5, Y, X), dt_)
           for ch, dt_ in zip(cap_chans, cap_dts)]
        + [pltpu.VMEM((1, 5, Y, X), f32) for _ in range(5)]  # drv
        + [pltpu.VMEM((1, 5, Y, X), f32)]               # lap ring
        + [
            pltpu.VMEM((19, 3, Y, X), f.dtype),         # f store (NS=3)
            pltpu.VMEM((19, 3, Y, X), g.dtype),         # g store
        ]
        + ([] if slab else [
            pltpu.VMEM((19, 1, Y, X), f.dtype),         # f seam
            pltpu.VMEM((19, 1, Y, X), g.dtype),         # g seam
        ])
        + [
            pltpu.VMEM((8, 2, Y, X), f32),              # vel/pres/force/den store
            pltpu.VMEM((9 + (emit_rhs is not None), 2, Y, X), f32),  # mac store
        ]
        + ([] if slab else [
            pltpu.VMEM((1, 1, Y, X), jnp.int32),        # wrap flags
            pltpu.VMEM((4, 1, Y, X), f32),              # wrap rho_ca + vel
        ] + ([pltpu.VMEM((1, 1, Y, X), jnp.int32)]      # wrap magnetic flags
             if emit_rhs is not None else []))
        + [pltpu.SemaphoreType.DMA((4,)) for _ in range(3)]    # f/g/flags in
        + [pltpu.SemaphoreType.DMA((5,)) for _ in range(len(cap_chans))]
        + [
            pltpu.SemaphoreType.DMA((3,)),   # f out
            pltpu.SemaphoreType.DMA((3,)),   # g out
            pltpu.SemaphoreType.DMA((2,)),   # cap out
            pltpu.SemaphoreType.DMA((2,)),   # mac out
        ]
        + ([pltpu.SemaphoreType.DMA((2,))]   # slab: lap lo/hi ghost DMAs
           if slab else [
            pltpu.SemaphoreType.DMA((2,)),   # seam
            pltpu.SemaphoreType.DMA((8,)),   # post-loop wrap re-reads
        ])
    )
    n_in = len(args)
    n_out = len(out_shape)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    if slab:
        in_specs[-1] = pl.BlockSpec(memory_space=pltpu.SMEM)  # clamp
    out = pl.pallas_call(
        functools.partial(
            _capillogue_kernel, float(kappa), tuple(gravity),
            float(mu0_half), float(rho_gas), float(rho_fluid),
            float(density_gas), float(density_fluid), float(tau_f),
            float(tau_g), float(dx), float(dt), Z, f.dtype,
            tuple(emit_rhs) if emit_rhs is not None else None,
            bool(emit_force), slab,
            tuple(int(v) for v in bounds) if bounds is not None else None,
        ),
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # Alias every dead operand to a shape-matching output: the premac
        # leaves (rho_pre/density_pre/g_sum/g_mom/vel_old), the old
        # pressure and H2 are all consumed by this call, and without the
        # aliases XLA copies them defensively before reusing their
        # buffers (~0.9 ms/step at 128x256^2 in the device trace).
        # In-kernel safety: input DMA reads run at planes >= t+1 while
        # output DMA writes trail at planes <= t-2 — reads lead writes by
        # >= 3 planes on every aliased pair (same read-ahead argument as
        # the f/g in-place collide).
        # The full map applies in slab mode too.  A trimmed slab map
        # (f/g/H2 only) was tried to dodge the defensive copies that the
        # wrapper's boundary fix-up glue (a second reader of the
        # premac/pressure operands) forces in a SINGLE-STEP dispatch —
        # but production runs scan steps into one while loop, where the
        # carry slot of each leaf is a fixed buffer: a fresh (unaliased)
        # kernel output then has to be copied back into its carry slot
        # every iteration, which costs MORE than the dispatch-mode
        # defensive copies ever did (scanned sharded-on-1 at 256^3:
        # 378.1 MLUPS full map vs 364.3 trimmed, measured 2026-08-19).
        input_output_aliases={
            0: oi["f"],      # f       -> f'
            1: oi["g"],      # g       -> g'
            3: oi["mrho"],   # rho_pre -> mac rho
            4: oi["mden"],   # density_pre -> mac density
            5: oi["pres"],   # pressure_old -> pressure
            7: oi["den"],    # H2      -> density(rho_ca)
            8: oi["m0g"],    # g_sum   -> mac m0g
            9: oi["m1g"],    # g_mom   -> mac m1g
            10: oi["mvel"],  # vel_old -> mac vel
        },
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    f_n, g_n = out[oi["f"]], out[oi["g"]]
    vel, pres, den = out[oi["vel"]], out[oi["pres"]], out[oi["den"]]
    force = out[oi["force"]] if emit_force else None
    premac = tuple(out[oi["mrho"]:])
    if not rebatch:
        return f_n, g_n, vel, pres, force, den, premac
    return (f_n[None], g_n[None], vel[None], pres[None],
            force[None] if force is not None else None,
            den[None], tuple(m[None] for m in premac))
