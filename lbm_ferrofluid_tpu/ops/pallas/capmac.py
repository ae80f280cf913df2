"""Fused capillary kernel: isotropic gradients of the four HCZ stencil
fields + Kelvin/surface-tension/gravity force assembly + macro vel/pressure
recovery, in ONE ring-pipelined pass.

Replaces the composition in ops/collide.py:hcz_capillary (single-device
TPU path): grad_fields over a concatenated 4-field stack, then an XLA
fusion reading the 12 gradient channels back to assemble force/dfai/dprho
and recover vel/pressure — ~2 extra HBM round-trips over 12-15 channels.
Here the stencil INPUT fields (fai, prho, chi) are recomputed in register
from their 1-channel primitives (rho, pressure), the gradients never hit
HBM, and the kernel emits exactly the macro fields the fused epilogue
consumes.

Semantic notes (mirroring hcz_capillary, reference HCZ_3d.py:21-263):
* ``fai = rep_pad_interior(eos(rho) - rho RT)`` and
  ``prho = rep_pad_interior(pressure - RT density)`` use the PRE-contact-
  angle rho/density; the force/recovery use the post-contact-angle
  density.  Both rho arrays are inputs.
* ``_sub(fai) == fai`` and ``_sub(prho) == prho`` identically: the
  OBSTACLE substitution pads the interior outward, and these fields are
  already interior-padded, so the substitution is the identity.  Only
  ``lap`` and ``chi`` get a real substitution.
* z boundaries: pad/clamp semantics (NOT periodic) — the grad ring fix
  clamps the source plane to [1, Z-2] exactly like
  stencil3d.grad_fields(ring_fix=True).

Multi-chip slab mode (``ghosts``/``clamp``): the six fields entering the
3-plane stencil window (lap, rho_pre, density_pre, pressure, phi, flags)
additionally take one neighbor ghost plane per side, and the z-clamp
bounds arrive as a 2-element SMEM scalar so the same SPMD program clamps
only at the true domain edges — interior slabs stencil straight through
their ghost planes.  See parallel/step3d.py:capmac_sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.types import CellType
from ..moments import eos_pressure
from .stencil3d import (
    _GRAD_TAPS,
    _LAP_TAPS,
    _ring_replicate_plane,
    _shift_replicate,
)

__all__ = ["capmac_supported", "hcz_capillary_gradmac"]

_OBS = int(CellType.OBSTACLE)
_FLUID = int(CellType.FLUID)

# susceptibility constant, as ops/collide.py
from ..collide import CHI_K, smooth_phi  # noqa: E402


def capmac_supported(shape) -> bool:
    B, C, Z, Y, X = shape
    return B == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 4


def _kernel(kappa, gravity, mu0_half, rho_gas, rho_fluid,
            density_gas, density_fluid, dx, dt, Z, has_h2, slab,
            compute_lap, *refs):
    n_in = (11 if has_h2 else 9) - (1 if compute_lap else 0)
    n_drv = 5 if has_h2 else 3
    n_gh = 6 if has_h2 else 5
    if slab:
        clamp_ref = refs[0]
        refs = refs[1:]
    ins = refs[:n_in]
    off = n_in
    if slab:
        gh_lo = refs[off:off + n_gh]
        gh_hi = refs[off + n_gh:off + 2 * n_gh]
        off += 2 * n_gh
    outs = refs[off:off + 5]
    scratch = refs[off + 5:]
    rings = scratch[:n_in]
    stores = scratch[n_in:n_in + 5]
    drv = scratch[n_in + 5:n_in + 5 + n_drv]
    sems_in = scratch[n_in + 5 + n_drv:2 * n_in + 5 + n_drv]
    sems_out = scratch[2 * n_in + 5 + n_drv:2 * n_in + 10 + n_drv]
    lap_ring = scratch[-1] if compute_lap else None
    Y, X = ins[0].shape[2], ins[0].shape[3]
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    inv12dx = 1.0 / (12.0 * dx)

    def rem_(a, n):
        a = jnp.asarray(a)
        return jax.lax.rem(a, jnp.asarray(n, a.dtype))

    def slot_(q):
        # (q+5)%5 == q%5 for q >= 0, and maps the slab ghost planes
        # q = -1 -> 4 and q = Z -> Z%5 consistently
        return rem_(q + 5, 5)

    def in_copies(q):
        slot = slot_(q)
        return [
            pltpu.make_async_copy(
                ref.at[:, pl.ds(q, 1)], ring.at[:, pl.ds(slot, 1)],
                sem.at[slot],
            )
            for ref, ring, sem in zip(ins, rings, sems_in)
        ]

    # slab mode: ghost planes of the six stencil-window streams
    gh_idx = [0, 1, 2, 3] + ([6] if has_h2 else []) + [5 + 2 * has_h2]

    def ghost_copies(which):
        refs_g, q = (gh_lo, -1) if which == "lo" else (gh_hi, Z)
        slot = slot_(q)
        return [
            pltpu.make_async_copy(
                refs_g[j], rings[i].at[:, pl.ds(slot, 1)],
                sems_in[i].at[slot],
            )
            for j, i in enumerate(gh_idx)
        ]

    def out_copies(p):
        slot = rem_(p, 2)
        return [
            pltpu.make_async_copy(
                store.at[:, pl.ds(slot, 1)], ref.at[:, pl.ds(p, 1)],
                sem.at[slot],
            )
            for ref, store, sem in zip(outs, stores, sems_out)
        ]

    ring_idx = {name: i for i, name in enumerate(
        ([] if compute_lap else ["lap"])
        + ["rho", "den", "pres", "rhoca"]
        + (["h2", "phi"] if has_h2 else [])
        + ["flags", "gsum", "gmom", "vel"]
    )}

    def plane(name, q, ch=0):
        return rings[ring_idx[name]][ch, slot_(q)]

    def lap_plane(q):
        # compute_lap: the 19-point Laplacian of density(rho_ca) is built
        # in-kernel (fill_lap below) instead of arriving as an input
        return lap_ring[0, slot_(q)] if compute_lap else plane("lap", q)

    # derived per-plane fields (all f32 in register) -------------------
    def density_of(rho):
        return density_gas + (density_fluid - density_gas) * (
            (rho - rho_gas) / (rho_fluid - rho_gas)
        )

    def raw_fai(q):
        rho = plane("rho", q)
        return eos_pressure(rho, dx=dx, dt=dt) - rho * RT

    def raw_prho(q):
        return plane("pres", q) - RT * plane("den", q)

    def chi_of(q):
        return CHI_K * (1.0 - smooth_phi(plane("phi", q), 0.1 * dx))

    def compute_derived(q):
        """Once per landed input plane: the ring-replicated pad fields
        (consumed up to 3x by the sliding grad window)."""
        slot = slot_(q)
        drv[0][0, slot] = _ring_replicate_plane(raw_fai(q), Y, X)
        drv[1][0, slot] = _ring_replicate_plane(raw_prho(q), Y, X)
        if not compute_lap:
            drv[2][0, slot] = _ring_replicate_plane(plane("lap", q), Y, X)
        if has_h2:
            cr = chi_of(q)
            drv[3][0, slot] = cr
            drv[4][0, slot] = _ring_replicate_plane(cr, Y, X)

    inv6dx2 = 1.0 / (6.0 * dx * dx)

    def fill_lap(q):
        """Laplacian plane q in [1, Z-2] from the rho_ca ring (windows
        q-1..q+1 landed), matching stencil3d._lap_kernel bit-for-bit:
        density(rho_ca) in register, 19 taps, zero x/y ring.  Runs at
        body t = q, one body AFTER plane q+1 lands — hence the lag-2
        output cadence of the compute_lap pipeline."""
        win = {oz: density_of(plane("rhoca", q + oz)) for oz in (-1, 0, 1)}
        acc = None
        for (oz, oy, ox), wgt in _LAP_TAPS:
            tp = _shift_replicate(win[oz], -oy, -ox, Y, X) * wgt
            acc = tp if acc is None else acc + tp
        res = acc * inv6dx2
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = (col == 0) | (col == X - 1) | (row == 0) | (row == Y - 1)
        res = jnp.where(edge, jnp.zeros((), res.dtype), res)
        slot = slot_(q)
        lap_ring[0, slot] = res
        drv[2][0, slot] = _ring_replicate_plane(res, Y, X)

    def fill_lap_zero(q):
        # the z-edge Laplacian planes are identically zero (the separate
        # kernel's zero boundary ring); drv[2] at these planes is never
        # read — the grad window clamps to [1, Z-2]
        lap_ring[0, slot_(q)] = jnp.zeros((Y, X), jnp.float32)

    lag = 2 if compute_lap else 1

    def body(t, _):
        @pl.when(t + 1 <= Z - 1)
        def _():
            for cp in in_copies(t + 1):
                cp.wait()
            compute_derived(t + 1)

        if slab:
            @pl.when(t + 1 == Z)
            def _():
                # hi ghost plane lands: wait + derive (window of the last
                # output plane reaches pc+1 == Z on interior slabs)
                for cp in ghost_copies("hi"):
                    cp.wait()
                compute_derived(Z)

        if compute_lap:
            # lap at plane t needs rho_ca t-1..t+1 (t+1 just landed); the
            # top z-edge plane is the zero plane
            @pl.when(t <= Z - 2)
            def _():
                fill_lap(t)

            @pl.when(t == Z - 1)
            def _():
                fill_lap_zero(Z - 1)

        p = t - lag  # output plane (the ring-fix clamp needs +2 planes;
        #              compute_lap adds one more body of lap latency)
        if slab:
            z_lo, z_hi = clamp_ref[0], clamp_ref[1]
        else:
            z_lo, z_hi = 1, Z - 2
        pc = jnp.clip(p, z_lo, z_hi)

        # window planes and their clamped pad sources
        qs = [pc - 1, pc, pc + 1]
        flags_q = [plane("flags", q) for q in qs]
        obs_q = [f == _OBS for f in flags_q]

        # stencil input fields with reference-exact substitution:
        #   fai/prho: interior-padded already => substitution is identity
        #   lap/chi:  where(OBS, ring_rep(field at clamped plane), field)
        def clampq(q):
            return jnp.clip(q, z_lo, z_hi)

        def d(i, q):
            return drv[i][0, slot_(q)]

        sub = {}
        sub["fai"] = [d(0, clampq(q)) for q in qs]
        sub["prho"] = [d(1, clampq(q)) for q in qs]
        sub["lap"] = [
            jnp.where(o, d(2, clampq(q)), lap_plane(q))
            for o, q in zip(obs_q, qs)
        ]
        if has_h2:
            sub["chi"] = [
                jnp.where(o, d(4, clampq(q)), d(3, q))
                for o, q in zip(obs_q, qs)
            ]

        fields = ["lap", "fai", "prho"] + (["chi"] if has_h2 else [])
        grads = {}
        for name in fields:
            planes3 = {-1: sub[name][0], 0: sub[name][1], 1: sub[name][2]}
            for d in range(3):
                acc = None
                for (oz, oy, ox), wgt in _GRAD_TAPS[d]:
                    tp = _shift_replicate(planes3[oz], -oy, -ox, Y, X) * wgt
                    acc = tp if acc is None else acc + tp
                grads[(name, d)] = _ring_replicate_plane(
                    acc * inv12dx, Y, X
                )

        # ---- assembly at plane p (post-contact-angle density) ----------
        dens = density_of(plane("rhoca", p))
        force = [
            kappa * dens * grads[("lap", d)] + gravity[d] * dens
            for d in range(3)
        ]
        if has_h2:
            h2 = plane("h2", p)
            for d in range(3):
                force[d] = force[d] - mu0_half * h2 * grads[("chi", d)]
        dfai = [grads[("fai", d)] for d in range(3)]
        dprho = [grads[("prho", d)] for d in range(3)]

        is_fluid = plane("flags", p) == _FLUID
        inv_rt_dens = 1.0 / (RT * dens)
        vel = [
            jnp.where(
                is_fluid,
                (plane("gmom", p, d) * c + 0.5 * dt * RT * force[d])
                * inv_rt_dens,
                plane("vel", p, d),
            )
            for d in range(3)
        ]
        vdp = vel[0] * dprho[0] + vel[1] * dprho[1] + vel[2] * dprho[2]
        pressure = jnp.where(
            is_fluid,
            plane("gsum", p) - 0.5 * dt * vdp,
            plane("pres", p),
        )

        @pl.when(p - 2 >= 0)
        def _():
            for cp in out_copies(p - 2):
                cp.wait()

        slot = rem_(p, 2)
        for d in range(3):
            stores[0][d, slot] = vel[d]
            stores[2][d, slot] = force[d]
            stores[3][d, slot] = dfai[d]
            stores[4][d, slot] = dprho[d]
        stores[1][0, slot] = pressure
        for cp in out_copies(p):
            cp.start()

        # start the next input plane AFTER compute: the ring holds 5
        # planes [t-2, t+2]; compute needs down to pc-1 >= t-3?  no:
        # pc-1 >= p-1 = t-2, and plane t+2 lands in slot (t+2)%5 which
        # held plane t-3 — no longer needed
        @pl.when(t + 2 <= Z - 1)
        def _():
            for cp in in_copies(t + 2):
                cp.start()
        if slab:
            @pl.when(t + 2 == Z)
            def _():
                for cp in ghost_copies("hi"):
                    cp.start()
        return 0

    # preamble: planes (-1,) 0, 1, 2 in flight; (-1,) 0 (, 1) landed +
    # derived.  Slab mode needs plane 1 up front too: the first output's
    # interior window is [-1, 1], not the clamped [0, 2].
    if slab:
        for cp in ghost_copies("lo"):
            cp.start()
    for q in (0, 1, 2, 3)[:3 + (lag - 1)]:
        if q <= Z - 1:
            for cp in in_copies(q):
                cp.start()
    if slab:
        for cp in ghost_copies("lo"):
            cp.wait()
        compute_derived(-1)
    for q in (0, 1, 2)[:1 + lag]:
        for cp in in_copies(q):
            cp.wait()
        compute_derived(q)
    if compute_lap:
        # the low z-edge zero plane + lap at 1 (rho_ca 0..2 just landed);
        # the first body (t = 2) then fills lap at 2 after plane 3 lands
        fill_lap_zero(0)
        fill_lap(1)

    jax.lax.fori_loop(lag, Z + lag, body, 0)
    for d in (2, 1):
        for cp in out_copies(Z - d):
            cp.wait()


@functools.partial(jax.jit, static_argnames=(
    "kappa", "gravity", "mu0_half", "rho_gas", "rho_fluid", "density_gas",
    "density_fluid", "dx", "dt", "interpret",
))
def hcz_capillary_gradmac(
    lap, rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
    g_mom, vel_old, ghosts=None, clamp=None, *,
    kappa, gravity, mu0_half, rho_gas, rho_fluid, density_gas,
    density_fluid, dx=1.0, dt=1.0, interpret=False,
):
    """One-pass gradients + force assembly + macro recovery.

    Args (all [1, C, Z, Y, X] f32 unless noted):
        lap: 19-point Laplacian of the post-contact-angle density
            (stencil3d.laplacian_field output, zero boundary ring), or
            ``None`` (single-device path) to compute it IN-KERNEL from
            ``rho_ca``'s ring windows — the separate laplacian pass and
            its volume round-trip disappear (same density map, taps and
            zero ring; agreement is modulo XLA FMA contraction, one
            extra body of output lag).  Slab mode requires an explicit
            ``lap``.
        rho_pre / density_pre / pressure: PRE-contact-angle rho, density
            and old pressure (fai / prho primitives).
        rho_ca: post-contact-angle rho (assembly density).
        H2, phi: Kelvin field and order parameter, or both None.
        gravity: 3-tuple of floats (static).
        ghosts / clamp: slab mode (parallel/step3d.py:capmac_sharded) —
            ``ghosts=(lo_tuple, hi_tuple)`` neighbor planes of
            [lap, rho_pre, density_pre, pressure, (phi,) flags] each
            [1, 1, 1, Y, X], and ``clamp`` an int32 [2] array with the
            local z-clamp bounds (edge devices clamp, interior don't).

    Returns (vel, pressure, force, dfai, dprho) — the recovered macro
    fields, matching hcz_capillary's composition modulo XLA
    FMA-contraction differences.
    """
    _, _, Z, Y, X = rho_pre.shape
    has_h2 = H2 is not None
    slab = ghosts is not None
    compute_lap = lap is None
    assert not (slab and compute_lap), "slab mode requires an explicit lap"
    flags_i32 = flags[0].astype(jnp.int32)
    f32 = jnp.float32
    args = [] if compute_lap else [lap[0].astype(f32)]
    args += [rho_pre[0].astype(f32),
             density_pre[0].astype(f32), pressure[0].astype(f32),
             rho_ca[0].astype(f32)]
    if has_h2:
        args += [H2[0].astype(f32), phi[0].astype(f32)]
    args += [flags_i32, g_sum[0].astype(f32), g_mom[0].astype(f32),
             vel_old[0].astype(f32)]
    n_in = len(args)
    chans = ([] if compute_lap else [1]) + [1, 1, 1, 1] + (
        [1, 1] if has_h2 else []) + [1, 1, 3, 3]
    dts = [f32] * (5 - compute_lap) + ([f32, f32] if has_h2 else []) + [
        jnp.int32, f32, f32, f32]

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    if slab:
        n_gh = 6 if has_h2 else 5
        lo_t, hi_t = ghosts
        assert len(lo_t) == n_gh and len(hi_t) == n_gh

        def _gh(x, j):
            # flags ghost travels as int32, the rest as f32
            flagpos = n_gh - 1
            return x[0].astype(jnp.int32 if j == flagpos else f32)

        gh_args = [_gh(x, j) for j, x in enumerate(lo_t)] + [
            _gh(x, j) for j, x in enumerate(hi_t)]
        args = [jnp.asarray(clamp, jnp.int32)] + args + gh_args
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_gh)
        )

    out_shape = [
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),  # vel
        jax.ShapeDtypeStruct((1, Z, Y, X), f32),  # pressure
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),  # force
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),  # dfai
        jax.ShapeDtypeStruct((3, Z, Y, X), f32),  # dprho
    ]
    out_ch = [3, 1, 3, 3, 3]
    n_drv = 5 if has_h2 else 3
    scratch = (
        [pltpu.VMEM((ch, 5, Y, X), dt_) for ch, dt_ in zip(chans, dts)]
        + [pltpu.VMEM((ch, 2, Y, X), f32) for ch in out_ch]
        + [pltpu.VMEM((1, 5, Y, X), f32) for _ in range(n_drv)]
        + [pltpu.SemaphoreType.DMA((5,)) for _ in range(n_in)]
        + [pltpu.SemaphoreType.DMA((2,)) for _ in range(5)]
        + ([pltpu.VMEM((1, 5, Y, X), f32)] if compute_lap else [])
    )
    vel, pres, force, dfai, dprho = pl.pallas_call(
        functools.partial(
            _kernel, kappa, tuple(gravity), mu0_half, rho_gas,
            rho_fluid, density_gas, density_fluid, dx, dt, Z, has_h2,
            slab, compute_lap,
        ),
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return vel[None], pres[None], force[None], dfai[None], dprho[None]
