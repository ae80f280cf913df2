"""Multi-chip execution of the fused Pallas 3D kernels via shard_map.

XLA's SPMD partitioner cannot split a Pallas custom call, so the fast path
runs each hot kernel inside ``shard_map`` over a ('batch', 'z') mesh: slab
decomposition along z with explicit ring halo exchange (``jax.lax.ppermute``
riding ICI) feeding the kernels' ghost-plane variants.  The cheap glue
between kernels (contact-angle boundary, phi/H2 elementwise math, the
staggered magnetic source) stays in ordinary jnp, where GSPMD partitions it
automatically — mixing the two inside one jit is standard JAX.

Reference contrast: the reference is strictly single-GPU and does periodic
halos as in-place edge copies on one tensor
(src/LBM/LBM_propagation/LBM_propagation_3d.py:32-64).  Here the same
1-plane dependency becomes a ring collective-permute per neighbor per pass,
and the 30-sweep magnetic Poisson loop uses depth-k ghost zones (exchange k
planes every k sweeps — SURVEY.md §5's halo-widening row) to cut collective
rounds per step from 30 to 30/k.

Off TPU the kernels run in Pallas interpret mode, so the identical exchange
logic is testable on the virtual 8-device CPU mesh (tests/test_sharded_step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas.fused_step import lbm_epilogue, lbm_prologue
from ..ops.pallas.hcz3d import hcz_collide_fused
from ..ops.pallas.poisson import make_sweep_call
from ..ops.pallas.stencil3d import grad_fields, laplacian_field
from ..ops.pallas.stream3d import (
    stream_bounce_macro as _pk_macro,
    stream_bounce_moments as _pk_moments,
)
from .halo import ring_halo

__all__ = [
    "sharded3d_ok",
    "fused_step_sharded_ok",
    "default_interpret",
    "stream_bounce_moments_sharded",
    "stream_bounce_macro_sharded",
    "fused_prologue_sharded",
    "fused_epilogue_sharded",
    "capmac_sharded",
    "capmac_sharded_ok",
    "capillogue_sharded",
    "capillogue_sharded_ok",
    "poisson_sweeps_sharded",
    "scalar_poisson_sharded",
    "scalar_sharded_ok",
    "grad_fields_sharded",
    "laplacian_field_sharded",
    "hcz_collide_sharded",
]

_Z = "z"
_B = "batch"


def default_interpret() -> bool:
    """Pallas kernels compile on TPU only; elsewhere run them interpreted."""
    return jax.default_backend() != "tpu"


def _mesh_sizes(mesh: Mesh) -> tuple[int, int]:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get(_B, 1), sizes.get(_Z, 1)


def sharded3d_ok(mesh: Mesh, shape: tuple[int, ...], interpret: bool) -> bool:
    """Can the Pallas slab path run this [B, C, Z, Y, X] shape on ``mesh``?

    Requires: only 'batch'/'z' mesh axes are >1 (y/x stay unsharded so the
    in-plane ``pltpu.roll`` wrap is exact), one batch element per device
    group, local slabs of >=2 planes, and (compiled mode) lane/sublane
    alignment.
    """
    if len(shape) != 5:
        return False
    B, _, Z, Y, X = shape
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for name, size in sizes.items():
        if name not in (_B, _Z) and size > 1:
            return False
    nb, nz = sizes.get(_B, 1), sizes.get(_Z, 1)
    if B % nb or B // nb != 1:
        return False
    if Z % nz or Z // nz < 2:
        return False
    if not interpret and (X % 128 or Y % 8):
        return False
    return True


def _spec(mesh: Mesh) -> P:
    """[B, C, Z, Y, X] partition spec over the mesh's batch/z axes."""
    names = set(mesh.axis_names)
    return P(_B if _B in names else None, None, _Z if _Z in names else None,
             None, None)


def _dp_dispatch(mesh: Mesh) -> bool:
    """True when the mesh's z axis is 1: pure data-parallel over batch (or
    a 1-device evidence mesh).  Every device then holds the FULL z domain,
    the periodic wrap is local, and the single-device kernel stack applies
    unchanged inside shard_map — no ghost extension, no exchange rounds,
    no boundary fix-ups (the slab round structure costs ~9% of step time
    at 256^3, docs/PERFORMANCE.md).  LBM_SLAB_FORCE=1 keeps the slab
    machinery active at nz == 1 so the 1-device evidence tools
    (bench_sharded_overhead, hw_validate --sharded, trace_sharded) can
    keep measuring/validating the ghost-variant kernels."""
    import os

    if os.environ.get("LBM_SLAB_FORCE"):
        return False
    _, nz = _mesh_sizes(mesh)
    return nz == 1


# ----------------------------------------------------------------------
# Streaming (f and g): one ghost plane per direction per pass
# ----------------------------------------------------------------------
def stream_bounce_moments_sharded(f, flags, mesh, *, interpret=False):
    """shard_map slab version of ops.pallas.stream3d.stream_bounce_moments."""
    spec = _spec(mesh)

    if _dp_dispatch(mesh):
        def body(f, flags):
            return _pk_moments(f, flags, interpret=interpret)
    else:
        def body(f, flags):
            up_ghost = ring_halo(f[:, 9:14, -1:], _Z, +1)  # from z-prev
            dn_ghost = ring_halo(f[:, 14:19, :1], _Z, -1)  # from z-next
            return _pk_moments(
                f, flags, up_ghost, dn_ghost, interpret=interpret
            )

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return fn(f, flags)


def stream_bounce_macro_sharded(
    f, flags, rho_old, vel_old, mesh, *, c, rho_gas, rho_fluid, density_gas,
    density_fluid, interpret=False,
):
    """shard_map slab version of ops.pallas.stream3d.stream_bounce_macro."""
    spec = _spec(mesh)

    kw = dict(c=c, rho_gas=rho_gas, rho_fluid=rho_fluid,
              density_gas=density_gas, density_fluid=density_fluid,
              interpret=interpret)

    if _dp_dispatch(mesh):
        def body(f, flags, rho_old, vel_old):
            return _pk_macro(f, flags, rho_old, vel_old, **kw)
    else:
        def body(f, flags, rho_old, vel_old):
            up_ghost = ring_halo(f[:, 9:14, -1:], _Z, +1)
            dn_ghost = ring_halo(f[:, 14:19, :1], _Z, -1)
            return _pk_macro(
                f, flags, rho_old, vel_old, up_ghost, dn_ghost, **kw
            )

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * 4, out_specs=(spec,) * 4,
        check_vma=False,
    )
    return fn(f, flags, rho_old, vel_old)


# ----------------------------------------------------------------------
# Ring-pipelined fused prologue/epilogue (slab-mode ghost wrap)
# ----------------------------------------------------------------------
def fused_step_sharded_ok(mesh, shape, kbc_type, interpret) -> bool:
    """Can the fused prologue/epilogue kernels run this global [B,19,Z,Y,X]
    shape as z-slabs on ``mesh``?  Local slabs need >=4 planes (the 4-slot
    input ring must hold a full 3-plane stream window per iteration)."""
    if kbc_type is not None or len(shape) != 5 or shape[1] != 19:
        return False
    if not sharded3d_ok(mesh, shape, interpret):
        return False
    _, nz = _mesh_sizes(mesh)
    return shape[2] // nz >= 4


def _fg_ghosts(f, g):
    """Neighbor boundary planes of the PRE-stream distributions: plane -1
    from z-prev, plane Z from z-next (full 19 channels — the extra bytes
    over the 5 z-moving channels keep the kernels' DMA byte-accounting
    identical to the wrap copies they replace)."""
    return (
        ring_halo(f[:, :, -1:], _Z, +1),
        ring_halo(f[:, :, :1], _Z, -1),
        ring_halo(g[:, :, -1:], _Z, +1),
        ring_halo(g[:, :, :1], _Z, -1),
    )


def fused_prologue_sharded(
    f, g, flags, rho_old, vel_old, mesh, *, c, rho_gas, rho_fluid,
    density_gas, density_fluid, interpret=False,
):
    """shard_map slab version of ops.pallas.fused_step.lbm_prologue."""
    spec = _spec(mesh)

    kw = dict(c=c, rho_gas=rho_gas, rho_fluid=rho_fluid,
              density_gas=density_gas, density_fluid=density_fluid,
              interpret=interpret)

    if _dp_dispatch(mesh):
        def body(f, g, flags, rho, vel):
            return lbm_prologue(f, g, flags, rho, vel, **kw)
    else:
        def body(f, g, flags, rho, vel):
            return lbm_prologue(f, g, flags, rho, vel, _fg_ghosts(f, g), **kw)

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * 5, out_specs=(spec,) * 5,
        check_vma=False,
    )
    return fn(f, g, flags, rho_old, vel_old)


def _mac_plane_jnp(fw, gw, flags_p, rho_old, vel_old, mac_consts):
    """One mac plane from collided 3-plane windows — an exact jnp replica
    of the epilogue kernel's ``emit_mac_plane`` (same per-q stream order,
    the same sequential moment accumulation), used to fix up the two slab
    boundary planes the in-kernel emission cannot cover.

    ``fw``/``gw``: (plane z-1 CHANNELS 9:14 only, plane z, plane z+1
    CHANNELS 14:19 only) of the collided distributions in the storage
    dtype — the pull-stream at plane z reads the up-moving group (rows
    9:14) from z-1 and the down-moving group (rows 14:19) from z+1 and
    nothing else, so the ring exchange that feeds the z-1/z+1 slots only
    carries those 5 channels (19 -> 5 per direction per array over ICI);
    ``flags_p`` [1, 1, Y, X]; ``rho_old`` [1, 1, Y, X]; ``vel_old``
    [1, 3, Y, X].  Returns the f32 mac plane as the 5-tuple (rho, vel,
    density, m0g, m1g), matching the kernel's separate-array emission.
    """
    from ..lattice import D3Q19
    from ..utils.types import CellType

    lat = D3Q19
    c, rho_gas, rho_fluid, density_gas, density_fluid = mac_consts
    is_obs = flags_p[:, 0].astype(jnp.int32) == int(CellType.OBSTACLE)

    def stream19(win):
        pm_up, p0, pp_dn = win  # [1,5,..], [1,19,..], [1,5,..]
        streamed = []
        for q in range(19):
            if q < 9:
                v = p0[:, q]
            elif q < 14:
                v = pm_up[:, q - 9]
            else:
                v = pp_dn[:, q - 14]
            v = v.astype(jnp.float32)
            ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
            if ey:
                v = jnp.roll(v, ey, axis=-2)
            if ex:
                v = jnp.roll(v, ex, axis=-1)
            streamed.append(v)
        return [
            jnp.where(is_obs, streamed[int(lat.opposite[q])], streamed[q])
            for q in range(19)
        ]

    def moments(post):
        m0 = post[0]
        for q in range(1, 19):
            m0 = m0 + post[q]
        m1 = []
        for d in range(3):
            md = None
            for q in range(19):
                ev = int(lat.e[q][d])
                if ev == 0:
                    continue
                term = post[q] if ev == 1 else -post[q]
                md = term if md is None else md + term
            m1.append(md)
        return m0, m1

    post_f = stream19(fw)
    post_g = stream19(gw)
    m0f, m1f = moments(post_f)
    m0g, m1g = moments(post_g)
    rho_n = jnp.where(is_obs, rho_old[:, 0].astype(jnp.float32), m0f)
    density_n = density_gas + (density_fluid - density_gas) * (
        (rho_n - rho_gas) / (rho_fluid - rho_gas)
    )
    inv_rho = c / rho_n
    vel_n = [
        jnp.where(is_obs, vel_old[:, d].astype(jnp.float32), m1f[d] * inv_rho)
        for d in range(3)
    ]
    return (
        rho_n[:, None],
        jnp.stack(vel_n, axis=1),
        density_n[:, None],
        m0g[:, None],
        jnp.stack(m1g, axis=1),
    )


def fused_epilogue_sharded(
    f, g, flags, rho, vel, density, pressure, force, dfai, dprho, mesh, *,
    tau_f, tau_g, dx=1.0, dt=1.0, emit_mac=False, mac_consts=None,
    compact=False, interpret=False,
):
    """shard_map slab version of ops.pallas.fused_step.lbm_epilogue.

    ``emit_mac=True`` returns (f', g', mac) with mac the next step's
    prologue fields (the mac-carry fast path): the kernel's trailing stage
    emits the interior planes of each slab, then the two boundary planes —
    whose stream windows need NEIGHBOR collided planes — are fixed up here
    from one extra ring exchange of the just-collided f'/g' edge planes.

    ``compact=True`` selects the 3-slot-input-ring layout (emit_mac only —
    the VMEM gate that enables mac-carry for f32 storage at 256^2 planes;
    slab mode needs no seam stashes since the ghost refs replace the
    z-wrap re-reads entirely).
    """
    spec = _spec(mesh)

    if _dp_dispatch(mesh):
        # the single-device kernel's wrap DMAs + full in-kernel emission
        # replace the ghost exchanges + boundary fix-up
        def body_dp(f, g, flags, rho, vel, density, pressure, force, dfai,
                    dprho):
            return lbm_epilogue(
                f, g, flags, rho, vel, density, pressure, force, dfai,
                dprho, tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt,
                emit_mac=emit_mac, mac_consts=mac_consts, compact=compact,
                interpret=interpret,
            )

        out_specs = (spec, spec, (spec,) * 5) if emit_mac else (spec, spec)
        fn = shard_map(
            body_dp, mesh=mesh, in_specs=(spec,) * 10, out_specs=out_specs,
            check_vma=False,
        )
        return fn(f, g, flags, rho, vel, density, pressure, force, dfai,
                  dprho)

    def body(f, g, flags, rho, vel, density, pressure, force, dfai, dprho):
        if not emit_mac:
            return lbm_epilogue(
                f, g, flags, rho, vel, density, pressure, force, dfai, dprho,
                _fg_ghosts(f, g), tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt,
                interpret=interpret,
            )
        f_n, g_n, mac = lbm_epilogue(
            f, g, flags, rho, vel, density, pressure, force, dfai, dprho,
            _fg_ghosts(f, g), tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt,
            emit_mac=True, mac_consts=mac_consts, compact=compact,
            rebatch=False, interpret=interpret,
        )
        # rebatch=False: rank-4 [C, Zl, Y, X] outputs — slice the raw
        # pallas results (layouts pinned) and re-batch only on return,
        # else XLA pays a z-outer layout round-trip per 19-ch array
        # (see capillogue_sharded).
        # collided boundary planes from the ring neighbors (one more
        # exchange over ICI — 2x19 planes each way)
        # only the z-crossing channel groups are ever pulled from the
        # neighbor planes (up group 9:14 from z-1, down group 14:19 from
        # z+1) — exchange 5 channels per direction per array, not 19
        f_lo = ring_halo(f_n[None, 9:14, -1], _Z, +1)  # z-prev's last
        f_hi = ring_halo(f_n[None, 14:19, 0], _Z, -1)  # z-next's first
        g_lo = ring_halo(g_n[None, 9:14, -1], _Z, +1)
        g_hi = ring_halo(g_n[None, 14:19, 0], _Z, -1)
        mac0 = _mac_plane_jnp(
            (f_lo, f_n[None, :, 0], f_n[None, 14:19, 1]),
            (g_lo, g_n[None, :, 0], g_n[None, 14:19, 1]),
            flags[:, :, 0], rho[:, :, 0], vel[:, :, 0], mac_consts,
        )
        macZ = _mac_plane_jnp(
            (f_n[None, 9:14, -2], f_n[None, :, -1], f_hi),
            (g_n[None, 9:14, -2], g_n[None, :, -1], g_hi),
            flags[:, :, -1], rho[:, :, -1], vel[:, :, -1], mac_consts,
        )
        mac = tuple(
            m.at[:, 0].set(m0[0]).at[:, -1].set(mZ[0])[None]
            for m, m0, mZ in zip(mac, mac0, macZ)
        )
        return f_n[None], g_n[None], mac

    out_specs = (spec, spec, (spec,) * 5) if emit_mac else (spec, spec)
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * 10, out_specs=out_specs,
        check_vma=False,
    )
    return fn(f, g, flags, rho, vel, density, pressure, force, dfai, dprho)


# ----------------------------------------------------------------------
# Fused capillary gradmac (slab-mode ghosts + edge-only z-clamp)
# ----------------------------------------------------------------------
def capmac_sharded_ok(mesh, shape, interpret) -> bool:
    """Local slabs need >=4 planes (5-slot ring: planes [-1, 2] in flight
    at the preamble)."""
    if len(shape) != 5:
        return False
    if not sharded3d_ok(mesh, shape, interpret):
        return False
    _, nz = _mesh_sizes(mesh)
    return shape[2] // nz >= 4


def capmac_sharded(
    lap, rho_pre, density_pre, pressure, rho_ca, H2, phi, flags, g_sum,
    g_mom, vel_old, mesh, *, kappa, gravity, mu0_half, rho_gas, rho_fluid,
    density_gas, density_fluid, dx=1.0, dt=1.0, interpret=False,
):
    """shard_map slab version of ops.pallas.capmac.hcz_capillary_gradmac.

    One neighbor ghost plane per side for the six stencil-window fields;
    the z-clamp bounds are computed per-device from the mesh position so
    only the true domain edges reproduce the reference's pad/clamp
    z-boundary (ops/pallas/capmac.py slab mode).
    """
    from ..ops.pallas.capmac import hcz_capillary_gradmac

    spec = _spec(mesh)
    has_h2 = H2 is not None
    args = [lap, rho_pre, density_pre, pressure, rho_ca]
    args += [H2, phi] if has_h2 else []
    args += [flags, g_sum, g_mom, vel_old]
    kw = dict(kappa=kappa, gravity=gravity, mu0_half=mu0_half,
              rho_gas=rho_gas, rho_fluid=rho_fluid, density_gas=density_gas,
              density_fluid=density_fluid, dx=dx, dt=dt, interpret=interpret)

    def _unpack(a):
        if has_h2:
            return a
        (lap, rho_pre, density_pre, pressure, rho_ca, flags,
         g_sum, g_mom, vel_old) = a
        return (lap, rho_pre, density_pre, pressure, rho_ca, None, None,
                flags, g_sum, g_mom, vel_old)

    # Pure-DP dispatch (nz == 1): the single-device kernel's wrap/clamp
    # handling replaces the ghost exchanges (see _dp_dispatch)
    if _dp_dispatch(mesh):
        def body_dp(*a):
            return hcz_capillary_gradmac(*_unpack(a), **kw)

        fn = shard_map(
            body_dp, mesh=mesh, in_specs=(spec,) * len(args),
            out_specs=(spec,) * 5, check_vma=False,
        )
        return fn(*args)

    def body(*a):
        (lap, rho_pre, density_pre, pressure, rho_ca, H2, phi, flags,
         g_sum, g_mom, vel_old) = _unpack(a)
        Zl = lap.shape[2]
        gh_fields = [lap, rho_pre, density_pre, pressure]
        gh_fields += [phi] if has_h2 else []
        gh_fields += [flags]
        lo_t = tuple(ring_halo(x[:, :1, -1:], _Z, +1) for x in gh_fields)
        hi_t = tuple(ring_halo(x[:, :1, :1], _Z, -1) for x in gh_fields)
        iz = jax.lax.axis_index(_Z)
        nz = jax.lax.psum(1, _Z)
        clamp = jnp.stack([
            jnp.where(iz == 0, 1, -1),
            jnp.where(iz == nz - 1, Zl - 2, Zl),
        ]).astype(jnp.int32)
        return hcz_capillary_gradmac(
            lap, rho_pre, density_pre, pressure, rho_ca, H2, phi, flags,
            g_sum, g_mom, vel_old, (lo_t, hi_t), clamp,
            kappa=kappa, gravity=gravity, mu0_half=mu0_half,
            rho_gas=rho_gas, rho_fluid=rho_fluid, density_gas=density_gas,
            density_fluid=density_fluid, dx=dx, dt=dt, interpret=interpret,
        )

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * len(args),
        out_specs=(spec,) * 5, check_vma=False,
    )
    return fn(*args)


def contact3d_sharded_ok(mesh, shape, dtype, interpret) -> bool:
    """Slab contact-angle kernel gate: f32 rho (the kernel computes and
    returns f32; wider dtypes keep the dtype-preserving jnp chain), local
    slabs of >= 4 planes, supported local plane shape."""
    from ..ops.pallas.contact3d import contact_angle_3d_supported

    if len(shape) != 5 or dtype != jnp.float32:
        return False
    if not sharded3d_ok(mesh, shape, interpret):
        return False
    nb, nz = _mesh_sizes(mesh)
    Zl = shape[2] // nz
    return Zl >= 4 and contact_angle_3d_supported(
        (shape[0] // nb, shape[1], Zl, shape[3], shape[4])
    )


def contact3d_sharded(rho, flags, contact_angle, mesh, *, interpret=False):
    """shard_map slab version of ops.pallas.contact3d.contact_angle_3d.

    Every cross-plane read in the contact-angle surgery is a PRE-update
    value (contact3d.py module docstring), so one pre-exchange of a single
    rho plane per side is exact; the edge surgery is gated per-device to
    the true domain edges via the (is_bottom, is_top) SMEM pair.
    """
    from ..ops.pallas.contact3d import contact_angle_3d

    spec = _spec(mesh)

    if _dp_dispatch(mesh):
        def body(rho, flags):
            return contact_angle_3d(
                rho, flags, contact_angle, interpret=interpret
            )
    else:
        def body(rho, flags):
            gm = ring_halo(rho[:, :, -1:], _Z, +1)  # z-prev's last plane
            gp = ring_halo(rho[:, :, :1], _Z, -1)  # z-next's first plane
            iz = jax.lax.axis_index(_Z)
            nz = jax.lax.psum(1, _Z)
            clamp = jnp.stack([
                jnp.where(iz == 0, 1, 0), jnp.where(iz == nz - 1, 1, 0),
            ]).astype(jnp.int32)
            return contact_angle_3d(
                rho, flags, contact_angle, ghosts=(gm, gp), clamp=clamp,
                interpret=interpret,
            )

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(rho, flags)


# ----------------------------------------------------------------------
# Fused capillogue (capillary + collide + mac emission) on slabs
# ----------------------------------------------------------------------
def _shift_replicate_jnp(v, sy, sx, Y, X):
    """jnp twin of ops.pallas.stencil3d._shift_replicate (pltpu.roll is
    Pallas-only; jnp.roll moves data identically, so results are
    bit-identical)."""
    out = v
    if sy:
        rolled = jnp.roll(out, sy % Y, -2)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = 0 if sy > 0 else Y - 1
        out = jnp.where(row == edge, out, rolled)
    if sx:
        rolled = jnp.roll(out, sx % X, -1)
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        edge = 0 if sx > 0 else X - 1
        out = jnp.where(col == edge, out, rolled)
    return out


def capillogue_sharded_ok(mesh, shape, fg_dtype, interpret) -> bool:
    """Local slabs need >=4 planes and the kernel's VMEM gate must pass on
    the LOCAL slab shape (per-chip VMEM; planes are never split)."""
    from ..ops.pallas.capillogue import capillogue_fits

    if len(shape) != 5 or not sharded3d_ok(mesh, shape, interpret):
        return False
    _, nz = _mesh_sizes(mesh)
    if shape[2] % nz or shape[2] // nz < 4:
        return False
    local = (shape[0], shape[1], shape[2] // nz, shape[3], shape[4])
    if interpret:
        return True  # alignment is a Mosaic constraint only
    return capillogue_fits(local, fg_dtype)


def capillogue_sharded(
    f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
    g_sum, g_mom, vel_old, magnetic_flags, mesh, *,
    kappa, gravity, mu0_half, rho_gas, rho_fluid, density_gas,
    density_fluid, tau_f, tau_g, dx=1.0, dt=1.0, emit_rhs=None,
    interpret=False,
):
    """shard_map slab version of ops.pallas.capillogue.lbm_capillogue
    (steady-state form: emit_force=False — force is a write-only
    diagnostic the steady state elides).

    Ghost exchanges per step: the f/g pre-collision edge planes, one
    plane per side of the 5 stencil-window fields, TWO rho_ca planes per
    side (the boundary Laplacian of density(rho_ca) is pre-computed here
    in jnp — the kernel computes lap in-kernel and the neighbor's lap
    plane cannot come from a 1-plane rho_ca ghost), and one post-kernel
    exchange of the collided f'/g' edge planes for the two boundary mac
    emissions (incl. their rhs planes, an exact jnp replica of the
    kernel's in-plane emission math).

    Returns (f', g', vel, pressure, density, premac) — premac a 5- or
    6-tuple matching the single-device kernel's emission.
    """
    from ..ops.collide import CHI_K, smooth_phi
    from ..ops.pallas.capillogue import lbm_capillogue
    from ..ops.pallas.stencil3d import _LAP_TAPS
    from ..utils.types import CellType

    spec = _spec(mesh)
    c = dx / dt
    cs2 = c * c / 3.0
    mac_consts = (c, float(rho_gas), float(rho_fluid),
                  float(density_gas), float(density_fluid))
    inv6dx2 = 1.0 / (6.0 * dx * dx)

    def density_of(rho):
        return density_gas + (density_fluid - density_gas) * (
            (rho - rho_gas) / (rho_fluid - rho_gas)
        )

    def _lap_plane(wm, w0, wp, Y, X):
        # jnp twin of the kernel's fill_lap at one plane: 19-tap Laplacian
        # of density(rho_ca), zeroed in-plane edge ring
        win = {-1: density_of(wm), 0: density_of(w0), 1: density_of(wp)}
        acc = None
        for (oz, oy, ox), wgt in _LAP_TAPS:
            tp = _shift_replicate_jnp(win[oz], -oy, -ox, Y, X) * wgt
            acc = tp if acc is None else acc + tp
        res = acc * inv6dx2
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = (col == 0) | (col == X - 1) | (row == 0) | (row == Y - 1)
        return jnp.where(edge, jnp.zeros((), res.dtype), res)

    def _rhs_plane(den_plane, mflags_plane, Y, X):
        # exact jnp replica of the kernel's emit_rhs plane math
        axis, hm, tau_mag = emit_rhs
        phi_n = -(
            2.0 * (den_plane - density_gas)
            / (density_fluid - density_gas) - 1.0
        )
        chi = CHI_K * (1.0 - smooth_phi(phi_n, 0.1 * dx))
        sy, sx = (-1, 0) if axis == 1 else (0, -1)
        chi_p = _shift_replicate_jnp(chi, sy, sx, Y, X)
        chi_m = _shift_replicate_jnp(chi, -sy, -sx, Y, X)
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
            mflags_plane.astype(jnp.int32) == int(CellType.FLUID),
            rhs, jnp.zeros((), rhs.dtype),
        )
        return (dt * rhs) * (cs2 * (0.5 - tau_mag) * dt)

    has_mf = magnetic_flags is not None
    args = [f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
            g_sum, g_mom, vel_old]
    if has_mf:
        args.append(magnetic_flags)
    n_mac = 6 if emit_rhs is not None else 5

    # Pure-DP dispatch (nz == 1): the single-device capillogue runs
    # unchanged inside shard_map — wrap DMAs instead of ghost exchanges,
    # full in-kernel mac/rhs emission instead of the interior-only
    # emission + jnp boundary fix-up (see _dp_dispatch).
    if _dp_dispatch(mesh):
        def body_dp(*a):
            mflags = a[11] if has_mf else None
            f_n, g_n, vel, pres, _force, den, premac = lbm_capillogue(
                *a[:11], mflags, kappa=kappa, gravity=gravity,
                mu0_half=mu0_half, rho_gas=rho_gas, rho_fluid=rho_fluid,
                density_gas=density_gas, density_fluid=density_fluid,
                tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt, emit_rhs=emit_rhs,
                emit_force=False, interpret=interpret,
            )
            return f_n, g_n, vel, pres, den, premac

        fn = shard_map(
            body_dp, mesh=mesh, in_specs=(spec,) * len(args),
            out_specs=(spec, spec, spec, spec, spec, (spec,) * n_mac),
            check_vma=False,
        )
        return fn(*args)

    def body(*a):
        if has_mf:
            (f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
             g_sum, g_mom, vel_old, mflags) = a
        else:
            (f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
             g_sum, g_mom, vel_old) = a
            mflags = None
        _, _, Zl, Y, X = f.shape
        fg = _fg_ghosts(f, g)
        # ONE bundled exchange per side for all the small scalar planes
        # (each is ~Y*X*4 bytes, where collective launch latency rivals the
        # transfer itself): rho_pre + density_pre + pressure_old edge
        # planes, the 2-plane rho_ca window (serving BOTH the rho_ca ghost
        # and the boundary-Laplacian window), and the flags edge plane
        # (cast through f32 — uint8 cell codes are exact).  The 19-channel
        # f/g exchanges stay separate: their payloads are large enough that
        # a concat copy would cost more than the saved launches.
        fdt = rho_pre.dtype
        cat_lo = jnp.concatenate([
            rho_pre[:, :1, -1:], density_pre[:, :1, -1:],
            pressure_old[:, :1, -1:], rho_ca[:, :, -2:],
            flags[:, :1, -1:].astype(fdt),
        ], axis=2)
        cat_hi = jnp.concatenate([
            rho_pre[:, :1, :1], density_pre[:, :1, :1],
            pressure_old[:, :1, :1], rho_ca[:, :, :2],
            flags[:, :1, :1].astype(fdt),
        ], axis=2)
        bund_lo = ring_halo(cat_lo, _Z, +1)  # from z-prev
        bund_hi = ring_halo(cat_hi, _Z, -1)  # from z-next
        rc2_lo = bund_lo[:, :, 3:5]  # z-prev's [-2, -1]
        rc2_hi = bund_hi[:, :, 3:5]  # z-next's [0, 1]
        lo = [bund_lo[:, :, i:i + 1] for i in range(3)]
        hi = [bund_hi[:, :, i:i + 1] for i in range(3)]
        lo.append(rc2_lo[:, :, 1:])
        hi.append(rc2_hi[:, :, :1])
        lo.append(bund_lo[:, :, 5:6].astype(flags.dtype))
        hi.append(bund_hi[:, :, 5:6].astype(flags.dtype))
        # boundary Laplacian planes: lap of the NEIGHBOR's edge
        # density(rho_ca) plane
        lap_lo = _lap_plane(
            rc2_lo[0, 0, 0], rc2_lo[0, 0, 1], rho_ca[0, 0, 0], Y, X
        )[None, None, None]
        lap_hi = _lap_plane(
            rho_ca[0, 0, -1], rc2_hi[0, 0, 0], rc2_hi[0, 0, 1], Y, X
        )[None, None, None]
        lo.append(lap_lo)
        hi.append(lap_hi)
        iz = jax.lax.axis_index(_Z)
        nz = jax.lax.psum(1, _Z)
        clamp = jnp.stack([
            jnp.where(iz == 0, 1, -1),
            jnp.where(iz == nz - 1, Zl - 2, Zl),
        ]).astype(jnp.int32)
        f_n, g_n, vel, pres, _force, den, premac = lbm_capillogue(
            f, g, flags, rho_pre, density_pre, pressure_old, rho_ca, H2,
            g_sum, g_mom, vel_old, mflags, fg, (tuple(lo), tuple(hi)),
            clamp, kappa=kappa, gravity=gravity, mu0_half=mu0_half,
            rho_gas=rho_gas, rho_fluid=rho_fluid, density_gas=density_gas,
            density_fluid=density_fluid, tau_f=tau_f, tau_g=tau_g,
            dx=dx, dt=dt, emit_rhs=emit_rhs, emit_force=False,
            rebatch=False, interpret=interpret,
        )
        # rebatch=False: rank-4 [C, Zl, Y, X] outputs.  The edge-plane
        # slices below MUST read the raw pallas results (layouts pinned);
        # slicing the [None] re-batch makes XLA give the broadcast a
        # z-outer layout for the slices and transpose it back for the
        # output — 2 full 19-ch volume passes per array (~8.9 ms/step at
        # 256^3, device-traced).  Re-batch only on return.
        # boundary mac planes from one exchange of the collided edges
        # (the kernel emitted interiors only); rho_old/vel_old of the
        # emission are rho_ca and THIS kernel's recovered velocity
        # 5-channel fix-up exchange (see fused_epilogue_sharded)
        f_lo2 = ring_halo(f_n[None, 9:14, -1], _Z, +1)
        f_hi2 = ring_halo(f_n[None, 14:19, 0], _Z, -1)
        g_lo2 = ring_halo(g_n[None, 9:14, -1], _Z, +1)
        g_hi2 = ring_halo(g_n[None, 14:19, 0], _Z, -1)
        mac0 = _mac_plane_jnp(
            (f_lo2, f_n[None, :, 0], f_n[None, 14:19, 1]),
            (g_lo2, g_n[None, :, 0], g_n[None, 14:19, 1]),
            flags[:, :, 0], rho_ca[:, :, 0], vel[None, :, 0], mac_consts,
        )
        macZ = _mac_plane_jnp(
            (f_n[None, 9:14, -2], f_n[None, :, -1], f_hi2),
            (g_n[None, 9:14, -2], g_n[None, :, -1], g_hi2),
            flags[:, :, -1], rho_ca[:, :, -1], vel[None, :, -1],
            mac_consts,
        )
        fixed = [
            m.at[:, 0].set(m0[0]).at[:, -1].set(mZ[0])[None]
            for m, m0, mZ in zip(premac[:5], mac0, macZ)
        ]
        if emit_rhs is not None:
            rhs = premac[5]
            rhs0 = _rhs_plane(mac0[2][0, 0], mflags[0, 0, 0], Y, X)
            rhsZ = _rhs_plane(macZ[2][0, 0], mflags[0, 0, -1], Y, X)
            rhs = rhs.at[:, 0].set(rhs0[None]).at[:, -1].set(rhsZ[None])
            fixed.append(rhs[None])
        return (f_n[None], g_n[None], vel[None], pres[None], den[None],
                tuple(fixed))

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * len(args),
        out_specs=(spec, spec, spec, spec, spec, (spec,) * n_mac),
        check_vma=False,
    )
    return fn(*args)


# ----------------------------------------------------------------------
# Magnetic Poisson loop: depth-k ghost zones
# ----------------------------------------------------------------------
def _extend(x, k):
    """[C, Zl, Y, X] -> [C, Zl+2k, Y, X] with ring-neighbor ghost zones."""
    lo = ring_halo(x[:, -k:], _Z, +1)
    hi = ring_halo(x[:, :k], _Z, -1)
    return jnp.concatenate([lo, x, hi], axis=1)


def _refresh_ghosts(g_ext, k, Zl):
    """Overwrite the k ghost planes each side from the ring neighbors' real
    boundary planes (real region = [k, k+Zl))."""
    lo = ring_halo(g_ext[:, Zl:Zl + k], _Z, +1)
    hi = ring_halo(g_ext[:, k:2 * k], _Z, -1)
    return g_ext.at[:, :k].set(lo).at[:, -k:].set(hi)


def _psi_refresh_ghosts(g_ext, psi, rhs_ext, G, Zl, tau):
    """Refresh the G ghost planes per side from the 1-channel f32 psi field
    instead of 19-channel h — the tau == 1 ICI shortcut.

    With tau == 1 the relaxation coefficient a = 1 - 1/tau vanishes, so the
    post-round h every non-obstacle cell stores is exactly what
    ops.pallas.poisson._sweep_math computed:  h_q = w_q * (psi/tau + rhs)
    (q=0 minus an extra psi/tau), cast to the storage dtype — a pure local
    function of the kernel's emitted psi (always f32) and the loop-invariant
    rhs.  Reconstructing ghost h from exchanged psi planes is therefore
    mathematically identical to exchanging the h planes; in floats it is
    identical to within 1-2 ulp, NOT bit-exact: the compiler is free to
    FMA-contract  w_q * (t + rhs)  differently here than in the kernel
    (measured: XLA:CPU contracts the kernel's form to a single rounding,
    fl(w*t + w*rhs), while this jnp chain rounds the sum first), and the
    kernel's dead  a*streamed  term contributes a signed zero.  The
    perturbation enters only ghost planes of a contractive (tau=1, purely
    diffusive) relaxation, so it stays at ulp level in the results —
    asserted at rtol 1e-6 against the full-h exchange in
    tests/test_sharded_step.py, orders below the step-level parity bars,
    and it does not accumulate: a 30-full-step sharded drive stayed within
    3.5e-7 of the full-h-exchange run, both tracking the single-device run
    identically (~6e-7, the general f32 cross-path noise floor).

    Obstacle cells carry bounce-back channel history that psi cannot
    reproduce, so true h is still exchanged where obstacles can sit under
    the ``mag_flags_shell`` geometry (obstacles only at the x-edge columns
    plus the two global z-edge planes — validated against the concrete
    flags in init_ferrofluid_state):

    * the innermost ghost plane per side — the only exchanged plane that
      can BE a global z-edge plane (it arrives over the periodic wrap:
      slab 0's innermost lower ghost is global plane Z-1, slab N-1's
      innermost upper ghost is global plane 0),
    * the two x-edge columns of the outer G-1 planes.

    ICI volume per side per round drops from G*19 h-planes to
    1*19 (innermost) + (G-1) f32 psi planes + 19*(G-1)*2/X column slivers:
    ~3.8x less at the flagship depth (G=6, X=256, bf16 h); the first round
    of a step still exchanges full h (no psi from a previous round exists).
    Collective count per side per round is 2 (one h-dtype bundle, one f32
    psi band) vs the full refresh's 1 — the extra launch has no data
    dependence on the other and can overlap; params.poisson_psi_halo is
    the A/B knob for measuring the trade on a real slice.
    """
    from ..lattice import D3Q19

    inv_tau = 1.0 / tau

    def recon(psi_band, rhs_band):
        # mirrors _sweep_math's store arithmetic (f32 ops, then the storage
        # cast); equal to the kernel's stored bits up to FMA contraction
        t = psi_band * inv_tau
        u = t + rhs_band
        outs = []
        for q in range(19):
            v = float(D3Q19.weights[q]) * u
            if q == 0:
                v = v - t
            outs.append(v)
        return jnp.concatenate(outs, axis=0).astype(g_ext.dtype)

    _, _, Y, X = g_ext.shape

    def xcols(band):
        # x-edge obstacle columns via basic slices (advanced indexing here
        # would lower to a lane-dim gather + whole-tile RMW scatter)
        return jnp.concatenate([band[..., :1], band[..., X - 1:]], axis=-1)

    def bundle(plane, c):
        # one h-dtype collective per side instead of two: innermost ghost
        # plane ‖ x-edge column slivers, flattened (reshape of contiguous
        # arrays is free; the concat copies only the tiny sliver)
        return jnp.concatenate(
            [plane.reshape(19, -1), c.reshape(19, -1)], axis=-1
        )

    def unbundle(b):
        return (
            b[:, :Y * X].reshape(19, 1, Y, X),
            b[:, Y * X:].reshape(19, G - 1, Y, 2),
        )

    # per side: one h-dtype exchange (innermost plane + column slivers,
    # all sliced from the REAL region, which the ghost writes below never
    # touch) and one f32 psi-band exchange — 2 collectives/side/round vs
    # the full refresh's 1, for ~4x fewer bytes (docs/PERFORMANCE.md)
    lo_h = ring_halo(
        bundle(g_ext[:, Zl + G - 1:Zl + G], xcols(g_ext[:, Zl:Zl + G - 1])),
        _Z, +1,
    )
    hi_h = ring_halo(
        bundle(g_ext[:, G:G + 1], xcols(g_ext[:, G + 1:2 * G])), _Z, -1
    )
    lo_in, lo_cols = unbundle(lo_h)
    hi_in, hi_cols = unbundle(hi_h)
    if G > 1:
        # outer G-1 planes: psi exchange + local reconstruction, with the
        # true-h column slivers spliced in (concat, not scatter: a fancy-
        # index .at[].set on the lane dim is a whole-tile RMW)
        lo_psi = ring_halo(psi[:, Zl:Zl + G - 1], _Z, +1)
        hi_psi = ring_halo(psi[:, G + 1:2 * G], _Z, -1)

        def splice(rec, c):
            return jnp.concatenate(
                [c[..., :1], rec[..., 1:X - 1], c[..., 1:]], axis=-1
            )

        lo_band = splice(recon(lo_psi, rhs_ext[:, :G - 1]), lo_cols)
        hi_band = splice(recon(hi_psi, rhs_ext[:, Zl + G + 1:]), hi_cols)
        g_ext = g_ext.at[:, :G - 1].set(lo_band)
        g_ext = g_ext.at[:, Zl + G + 1:].set(hi_band)
    return (
        g_ext.at[:, G - 1:G].set(lo_in).at[:, Zl + G:Zl + G + 1].set(hi_in)
    )


def _psi_ghost_bands(blo, bhi, psi, rhs_ext, G, tau):
    """Ghost-ref twin of :func:`_psi_refresh_ghosts`: build the two
    [19, G, Y, X] ghost BANDS for the wavefront's ghost-ref mode instead
    of DUSing an extended array (each of those DUSes forced a full-
    extended-volume defensive copy at the kernel's in-place aliasing
    boundary — the bulk of the measured 38-48% sharded-on-1 overhead).
    Same exchanges, same reconstruction arithmetic, same obstacle
    carve-outs.  ``blo``/``bhi`` are the kernel's emit_bands outputs (the
    final values of real planes [0, G) / [Zl-G, Zl)) and ``psi`` is the
    REAL-only psi — h itself is never sliced here (any jnp read of the
    in-place-aliased h around the while carry reintroduces the defensive
    copy).  Band plane order: lo band j in [0, G) is extended plane j
    (outermost first, innermost = true-h last); hi band j is extended
    plane Zl+G+j (innermost = true-h first)."""
    from ..lattice import D3Q19

    inv_tau = 1.0 / tau
    _, Zl, Y, X = psi.shape

    def recon(psi_band, rhs_band):
        t = psi_band * inv_tau
        u = t + rhs_band
        outs = []
        for q in range(19):
            v = float(D3Q19.weights[q]) * u
            if q == 0:
                v = v - t
            outs.append(v)
        return jnp.concatenate(outs, axis=0).astype(blo.dtype)

    def xcols(band):
        return jnp.concatenate([band[..., :1], band[..., X - 1:]], axis=-1)

    def bundle(plane, c):
        return jnp.concatenate(
            [plane.reshape(19, -1), c.reshape(19, -1)], axis=-1
        )

    def unbundle(b):
        return (
            b[:, :Y * X].reshape(19, 1, Y, X),
            b[:, Y * X:].reshape(19, G - 1, Y, 2),
        )

    if G == 1:
        return (
            ring_halo(bhi, _Z, +1),
            ring_halo(blo, _Z, -1),
        )

    lo_h = ring_halo(
        bundle(bhi[:, G - 1:G], xcols(bhi[:, :G - 1])), _Z, +1
    )
    hi_h = ring_halo(bundle(blo[:, 0:1], xcols(blo[:, 1:G])), _Z, -1)
    lo_in, lo_cols = unbundle(lo_h)
    hi_in, hi_cols = unbundle(hi_h)
    lo_psi = ring_halo(psi[:, Zl - G:Zl - 1], _Z, +1)
    hi_psi = ring_halo(psi[:, 1:G], _Z, -1)

    def splice(rec, c):
        return jnp.concatenate(
            [c[..., :1], rec[..., 1:X - 1], c[..., 1:]], axis=-1
        )

    lo_band = splice(recon(lo_psi, rhs_ext[:, :G - 1]), lo_cols)
    hi_band = splice(recon(hi_psi, rhs_ext[:, Zl + G + 1:]), hi_cols)
    return (
        jnp.concatenate([lo_band, lo_in], axis=1),
        jnp.concatenate([hi_in, hi_band], axis=1),
    )


def poisson_sweeps_sharded(
    h, magnetic_flags, rhs_scaled, mesh, *, tau, n_iters, halo_depth=5,
    emit_h2=None, dx=1.0, interpret=False, psi_halo=False,
):
    """Run the Poisson inner loop multi-chip with depth-k halo widening.

    Each slab carries G ghost planes per side; one exchange of G planes
    buys k locally-exact sweeps (the valid region of a ghost zone shrinks
    by one plane per sweep, so after k sweeps the real region is still
    exact — the standard deep-halo trade of bandwidth for latency).  The
    kernel's periodic z-wrap only ever touches ghost planes, which are
    refreshed at the start of every round.  Results are bit-identical to
    the single-device kernel for any k.

    Plain mode (``emit_h2=None``): G = k; returns
    (h_new ``[1,19,Zl,Y,X]`` local view, psi ``[1,1,Zl,Y,X]``).

    ``emit_h2`` (static component tuple of the constant external field):
    G = k+1, so after each round the valid region covers real +-1 plane —
    enough for the wavefront's trailing grad stage to run on the final
    round (emit="h2" with per-device SMEM z-clamp bounds: only true domain
    edges clamp).  Returns (h_new, H2, True) with the 1-channel Kelvin
    magnitude — psi and the 3-channel H_int never touch HBM, and the
    caller skips its substitution + sharded-grad passes.  Falls back to
    (h_new, psi, False) when the final round's sweep count can't satisfy
    the hint gate.

    ``psi_halo`` (requires tau == 1 and the mag_flags_shell geometry —
    callers gate on params.mag_flags_shell, which init_ferrofluid_state
    validates): rounds after the first refresh their ghost zones from the
    previous round's 1-channel f32 psi plus a thin true-h slice instead of
    19-channel h (see _psi_refresh_ghosts) — results equal to within
    1-2 ulp (FMA-contraction freedom in the reconstruction; not bit-exact),
    ~2.5x less ICI volume over the step's Poisson exchanges at the
    flagship config.
    """
    use_psi = bool(psi_halo) and float(tau) == 1.0
    spec = _spec(mesh)

    from ..lattice import D3Q19
    from ..ops.pallas.poisson import (
        _wf_plan,
        poisson_multisweep2,
        poisson_multisweep_supported,
        poisson_wavefront,
        poisson_wavefront_hint_ok,
        poisson_wavefront_supported,
    )

    def wf_ok(shape, n):
        if not interpret:
            return poisson_wavefront_supported(D3Q19, shape, h.dtype, n)
        # interpret mode: the X/Y lane alignment is a Mosaic constraint
        # only — keep the structural gates so the CPU mesh exercises the
        # identical kernel/exchange code the pod compiles
        B, Q, Z, _, _ = shape
        return (
            Q == 19 and B == 1 and Z >= 8
            and _wf_plan(shape, h.dtype, n) >= 2
        )

    # static feasibility of the h2-emitting final round (shapes are global
    # here; the local slab shape is global_Z/nz)
    _, nz = _mesh_sizes(mesh)
    Zl_g = h.shape[2] // nz
    # One neighbor exchange can supply at most Zl real planes, so G <= Zl
    # must hold.  Plain mode has G = k <= Zl by construction, but the h2
    # mode's spare plane (G = k+1) needs k clamped to Zl-1 — without this
    # _extend/_refresh_ghosts silently slice a STALE ghost plane in as
    # real data (observed: h corrupt decaying inward from the slab edges
    # at Zl=4 with the default depth 5).
    k_h2 = max(1, min(halo_depth, Zl_g - 1, n_iters))
    rounds_g, rem_g = divmod(n_iters, k_h2)
    n_final = rem_g if rem_g else k_h2
    G_g = k_h2 + 1
    ext_shape_h2 = (1, 19, Zl_g + 2 * G_g, h.shape[3], h.shape[4])
    do_h2 = (
        emit_h2 is not None and len(emit_h2) == 3
        and G_g <= Zl_g
        and wf_ok(ext_shape_h2, k_h2)
        and poisson_wavefront_hint_ok(ext_shape_h2, h.dtype, n_final)
    )

    # Round-count bump: a slightly larger depth can cut the number of
    # exchange+launch rounds at near-constant total sweep work AND ICI
    # volume (rounds x G planes: e.g. 30 iters at k=5 -> 6x6=36 exchanged
    # planes/side, at k=6 -> 5x7=35) — each round saved is one wavefront
    # pipeline fill, one ghost exchange's collectives, and one scan-glue
    # iteration.  bf16 h at 256^2 planes fits k=6; f32's VMEM plan caps at
    # 5 (probed via _wf_plan, which the bump requires to equal k so the
    # ghost-ref in-place flow stays eligible — the padded fallback flow
    # pays defensive copies that would eat the gain).
    if do_h2:
        rounds_cur = rounds_g + (1 if rem_g else 0)
        for kc in (halo_depth + 2, halo_depth + 1):
            kc = min(kc, Zl_g - 1, n_iters)
            Gc = kc + 1
            extc = (1, 19, Zl_g + 2 * Gc, h.shape[3], h.shape[4])
            if (
                kc > k_h2
                and n_iters % kc == 0
                and n_iters // kc < rounds_cur
                and Gc <= Zl_g
                and wf_ok(extc, kc)
                and _wf_plan(extc, h.dtype, kc) == kc
                and poisson_wavefront_hint_ok(extc, h.dtype, kc)
            ):
                k_h2, G_g, ext_shape_h2 = kc, Gc, extc
                rounds_g, rem_g, n_final = n_iters // kc, 0, kc
                break

    # Pure-DP dispatch (nz == 1): the single-device wavefront solve runs
    # unchanged inside shard_map — no ghost extension, no rounds, no
    # exchanges (see _dp_dispatch).
    if _dp_dispatch(mesh) and wf_ok(h.shape, n_iters):
        do_h2_dp = (
            emit_h2 is not None and len(emit_h2) == 3
            and poisson_wavefront_hint_ok(h.shape, h.dtype, n_iters)
        )

        def body_dp(h, flags, rhs):
            if do_h2_dp:
                return poisson_wavefront(
                    h, flags, rhs, tau=tau, n_iters=n_iters, emit="h2",
                    dx=dx, h_ext=tuple(float(v) for v in emit_h2),
                    interpret=interpret,
                )
            return poisson_wavefront(
                h, flags, rhs, tau=tau, n_iters=n_iters, interpret=interpret,
            )

        fn = shard_map(
            body_dp, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec, spec), check_vma=False,
        )
        h_new, aux = fn(h, magnetic_flags, rhs_scaled)
        if emit_h2 is not None:
            return h_new, aux, do_h2_dp
        return h_new, aux

    def body(h, flags, rhs):
        _, _, Zl, Y, X = h.shape
        k = k_h2 if do_h2 else max(1, min(halo_depth, Zl, n_iters))
        G = k + 1 if do_h2 else k
        # The psi refresh needs G < Zl: at G == Zl the exchanged band spans
        # the neighbor's WHOLE slab, so for the edge slabs its outermost
        # ghost plane is a global z-edge OBSTACLE plane — which psi cannot
        # reconstruct (only the innermost plane rides the wrap and is
        # exchanged as true h).  Measured at G=Zl=4: rel ~3e-3 corruption
        # on the slab-boundary planes.  Degenerate tiny slabs keep the
        # full-h refresh.
        body_psi = use_psi and G < Zl
        rounds, rem = divmod(n_iters, k)
        Zext = Zl + 2 * G

        flags_ext = _extend(flags[0].astype(jnp.int32), G)
        rhs_ext = _extend(rhs[0].astype(jnp.float32), G)

        ext_shape = (1, 19, Zext, Y, X)
        use_wf = wf_ok(ext_shape, k)

        # Ghost-ref fast flow: h stays a REAL-only carry aliased in-place
        # by the kernel; ghosts ride as separate exchanged bands.  The
        # extended-array flow below DUSes ghost planes into a padded
        # volume each round, and every DUS output feeding the aliased
        # pallas input costs a full-extended-volume defensive copy
        # (XLA copy-insertion; measured as the bulk of the 38-48%
        # sharded-on-1 overhead, docs/PERFORMANCE.md).  Requires a
        # single-pass plan (k == plan) and no remainder round.
        if (
            use_wf and rem == 0 and G <= Zl and Zl >= 2
            and _wf_plan(ext_shape, h.dtype, k) == k
        ):
            hr = h[0]
            if do_h2:
                iz = jax.lax.axis_index(_Z)
                first_d = iz == 0
                last_d = iz == jax.lax.psum(1, _Z) - 1
                clamp_g = jnp.stack([
                    jnp.where(first_d, G + 1, 1),
                    jnp.where(last_d, G + Zl - 2, Zext - 2),
                ]).astype(jnp.int32)

            def run_round(hr, gb, emit_final):
                if emit_final:
                    h_new, aux = poisson_wavefront(
                        hr[None], flags_ext[None], rhs_ext[None], tau=tau,
                        n_iters=k, interpret=interpret, emit="h2", dx=dx,
                        h_ext=tuple(float(v) for v in emit_h2),
                        slab_clamp=clamp_g, ghosts=gb,
                    )
                    return h_new[0], aux[0]
                h_new, aux, bands = poisson_wavefront(
                    hr[None], flags_ext[None], rhs_ext[None], tau=tau,
                    n_iters=k, interpret=interpret, ghosts=gb,
                    emit_bands=True,
                )
                return h_new[0], aux[0], bands

            # Kernel-first iteration order, with the kernel itself
            # emitting the two G-plane boundary bands as separate small
            # outputs (emit_bands): the exchange reads THOSE, so h has no
            # jnp consumers at all around the in-place while carry — any
            # such read (a slice for the exchange, a DUS refresh) makes
            # XLA insert a full-volume defensive copy per round inside
            # the scan body (measured 8.2 ms/step at 256^3 on-chip).
            def scan_body(carry, _):
                hr, psi_r, gb = carry
                hr, psi_r, (blo, bhi) = run_round(hr, gb, emit_final=False)
                if body_psi:
                    gb = _psi_ghost_bands(blo, bhi, psi_r, rhs_ext, G, tau)
                else:
                    gb = (ring_halo(bhi, _Z, +1), ring_halo(blo, _Z, -1))
                return (hr, psi_r, gb), None

            # first round's bands slice the incoming h directly (one-time;
            # h is still pristine — no in-place pass has run yet)
            gb = (
                ring_halo(hr[:, -G:], _Z, +1),
                ring_halo(hr[:, :G], _Z, -1),
            )
            psi_r = jnp.zeros((1, Zl, Y, X), jnp.float32)
            if rounds > 1:
                (hr, psi_r, gb), _ = jax.lax.scan(
                    scan_body, (hr, psi_r, gb), None, length=rounds - 1
                )
            if do_h2:
                hr, aux = run_round(hr, gb, emit_final=True)
            else:
                hr, aux, _ = run_round(hr, gb, emit_final=False)
            return hr[None], aux[None]

        hc = jnp.pad(h[0], ((0, 0), (G, G), (0, 0), (0, 0)))
        psi = jnp.zeros((1, Zext, Y, X), jnp.float32)
        use_ms = not use_wf and poisson_multisweep_supported(
            D3Q19, ext_shape, h.dtype, k
        )
        call = None if (use_wf or use_ms) else make_sweep_call(
            Zext, Y, X, h.dtype, tau, interpret
        )

        if do_h2:
            # per-device z-clamp bounds of the trailing grad stage, in
            # extended coords: only the true domain edges clamp (global
            # source planes [1, Zg-2]); interior bounds never bind on
            # real planes and keep ghost outputs' indexing in-range
            iz = jax.lax.axis_index(_Z)
            first, last = iz == 0, iz == jax.lax.psum(1, _Z) - 1
            slab_clamp = jnp.stack([
                jnp.where(first, G + 1, 1),
                jnp.where(last, G + Zl - 2, Zext - 2),
            ]).astype(jnp.int32)

        def n_sweeps(carry, n, emit_final=False, first=True):
            """Refresh the G ghost planes from ring neighbors, then run n
            locally-exact sweeps on the extended slab — via the wavefront /
            temporally-blocked kernels when the extended shape supports
            them (their periodic z-wrap only pollutes ghost planes)."""
            hc, psi = carry
            if body_psi and not first:
                # non-first rounds hold the previous round's psi: refresh
                # from it (1 channel + thin h slivers) instead of full h
                hc = _psi_refresh_ghosts(hc, psi, rhs_ext, G, Zl, tau)
            else:
                hc = _refresh_ghosts(hc, G, Zl)
            if use_wf:
                if emit_final:
                    h_new, h2 = poisson_wavefront(
                        hc[None], flags_ext[None], rhs_ext[None], tau=tau,
                        n_iters=n, interpret=interpret, emit="h2", dx=dx,
                        h_ext=tuple(float(v) for v in emit_h2),
                        slab_clamp=slab_clamp,
                    )
                    return h_new[0], h2[0]
                h_new, psi = poisson_wavefront(
                    hc[None], flags_ext[None], rhs_ext[None], tau=tau,
                    n_iters=n, interpret=interpret,
                )
                return h_new[0], psi[0]
            if use_ms:
                h_new, psi = poisson_multisweep2(
                    hc[None], flags_ext[None], rhs_ext[None], tau=tau,
                    n_iters=n, interpret=interpret,
                )
                return h_new[0], psi[0]

            def sweep(_, c):
                m, u, d, _p = c
                return tuple(call(m, u, d, flags_ext, rhs_ext))

            mid, up, dn, psi = jax.lax.fori_loop(
                0, n, sweep, (hc[:9], hc[9:14], hc[14:19], psi)
            )
            return jnp.concatenate([mid, up, dn], axis=0), psi

        carry = (hc, psi)
        n_scan = rounds - (1 if do_h2 and not rem else 0)
        first = True
        if n_scan:
            if body_psi:
                # peel round 0 (no psi exists yet — full-h refresh), scan
                # the rest with the psi refresh
                carry = n_sweeps(carry, k, first=True)
                if n_scan > 1:
                    carry, _ = jax.lax.scan(
                        lambda c, _: (n_sweeps(c, k, first=False), None),
                        carry, None, length=n_scan - 1,
                    )
            else:
                carry, _ = jax.lax.scan(
                    lambda c, _: (n_sweeps(c, k), None), carry, None,
                    length=n_scan,
                )
            first = False
        if do_h2:
            carry = n_sweeps(carry, n_final, emit_final=True, first=first)
        elif rem:
            carry = n_sweeps(carry, rem, first=first)
        hc, aux = carry

        real = slice(G, G + Zl)
        return hc[:, real][None], aux[:, real][None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )
    h_new, aux = fn(h, magnetic_flags, rhs_scaled)
    if emit_h2 is not None:
        return h_new, aux, do_h2
    return h_new, aux


def _scalar_slab_plan(mesh, s2_shape, n_iters, interpret):
    """(k, G) for the slab scalar Poisson solve, or None.

    Every round runs k locally-exact sweeps on Zl+2G extended planes with
    G = k+1 ghost planes per side (the final round's in-kernel h2 grad
    needs one spare validity plane, exactly like the channel solve's
    G = k+1 rule).  k must divide n_iters (ghost-ref mode is single-pass),
    satisfy G <= Zl (one neighbor exchange supplies at most Zl real
    planes), and fit the single-pass VMEM plan.  The trade: larger k
    cuts rounds — fewer exchanges, pipeline fills and launches, and
    slightly less exchanged volume ((n/k)(k+1) planes/side total) — but
    amplifies per-round ghost-zone sweep compute by (Zl+2k+2)/Zl.  At
    Zl >= 128 the amplification is small and fewer rounds win; at small
    Zl a plane-count cost model puts every feasible divisor within ~10%
    of the optimum, so the largest feasible divisor is picked everywhere
    (measured slab-forced at Zl=256: k=15, 10.4% overhead vs
    single-chip, docs/PERFORMANCE.md; the scalar kernel's ~19x smaller
    rings make such depths routine where the channel form capped at
    k=6)."""
    from ..ops.pallas.scalar_poisson import _sp_plan

    _, nz = _mesh_sizes(mesh)
    _, C, Z, Y, X = s2_shape
    if C != 2 or Z % nz:
        return None
    Zl = Z // nz
    for k in range(min(n_iters, Zl - 1), 1, -1):
        if n_iters % k:
            continue
        G = k + 1
        if G > Zl:
            continue
        Zext = Zl + 2 * G
        if Zext < 2 * k + 2:  # kernel kmax: k <= (Zext - 2) // 2
            continue
        if not interpret and _sp_plan((1, 2, Zext, Y, X), k) != k:
            continue
        return k, G
    return None


def scalar_sharded_ok(mesh, s2_shape, n_iters, interpret) -> bool:
    """Can the tau==1 scalar Poisson solve run on ``mesh``?

    ``s2_shape`` is the GLOBAL [1, 2, Z, Y, X] fused-carry shape.  At
    nz == 1 the single-device kernel dispatches inside shard_map (pure
    DP), so the single-device h2 gates apply; otherwise a slab plan must
    exist.  In interpret mode the lane-alignment gates are skipped (the
    CPU mesh exercises the identical kernel/exchange code the pod
    compiles) but the structural gates are kept."""
    if not sharded3d_ok(mesh, s2_shape, interpret):
        return False
    from ..ops.pallas.scalar_poisson import (
        _sp_plan,
        scalar_wavefront_hint_ok,
    )

    _, nz = _mesh_sizes(mesh)
    if nz == 1:
        if interpret:
            _, _, Z, _, _ = s2_shape
            k = _sp_plan(s2_shape, n_iters)
            return k >= 2 and n_iters % k == 0 and Z >= 4
        return scalar_wavefront_hint_ok(s2_shape, jnp.float32, n_iters)
    return _scalar_slab_plan(mesh, s2_shape, n_iters, interpret) is not None


def scalar_poisson_sharded(
    s2, cmask, rhs_scaled, mesh, *, n_iters, dx=1.0, h_ext=None,
    interpret=False, shell_sliver=False,
):
    """Multi-chip tau==1 scalar Poisson solve; returns (H2, s2').

    The scalar collapse's slab form (VERDICT r3 #2): ghost bands are
    (s, s_prev) pairs — 2 f32 channels instead of the channel solve's
    19xh — and the ghost-ref kernel flow carries s2 in place with the
    exchanged bands as separate refs (the channel solve's
    defensive-copy lesson, ops/pallas/poisson.py ghost mode).  Round
    structure: n_iters/k rounds of k sweeps with G = k+1 ghost planes,
    non-final rounds emit their boundary bands in-kernel (emit_bands),
    the final round emits the 1-channel H2 from the trailing grad stage
    with per-device z-clamp (only true domain edges clamp).

    ``shell_sliver`` (round-4 verdict #3; gate on params.mag_flags_shell
    — geometry validated at init): the s_prev channel of a ghost band is
    READ only where the extended cmask is positive — wall-adjacent
    cells, which under the shell declaration are exactly the x-columns
    {1, X-2} plus the global z-planes {1, Z-2} — so the exchange sends
    ch1 as a 2-column sliver plus (at most two per band, selected by
    global plane index) full planes, and the receiver zero-fills the
    rest.  Zeros multiply c_pos == 0 in the sweep, so results are
    bit-identical (numpy ==; a ±0 sign may differ at exact-zero cells).
    Halves the dominant multi-chip exchange term: a [2, G, Y, X] band
    becomes [1, G, Y, X] + [G, Y, 2] + [2, Y, X] — at the flagship
    G=16, 256^2 planes: 8.4 -> 4.5 MB/side/round.

    Caller must gate on :func:`scalar_sharded_ok`; ``h_ext`` is the
    static 3-tuple external-field vector (h2 emission is always on —
    the gate guarantees feasibility).
    """
    spec = _spec(mesh)
    from ..ops.pallas.scalar_poisson import scalar_wavefront

    if h_ext is None or len(h_ext) != 3:
        raise ValueError("scalar_poisson_sharded requires a 3-tuple h_ext")
    hx = tuple(float(v) for v in h_ext)

    if _dp_dispatch(mesh):
        def body_dp(s2, c, r):
            s2o, h2 = scalar_wavefront(
                s2, c, r, n_iters=n_iters, emit="h2", dx=dx, h_ext=hx,
                interpret=interpret,
            )
            return s2o, h2

        fn = shard_map(
            body_dp, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec, spec), check_vma=False,
        )
        s2o, h2 = fn(s2, cmask, rhs_scaled)
        return h2, s2o

    plan = _scalar_slab_plan(mesh, s2.shape, n_iters, interpret)
    if plan is None:
        raise ValueError("no slab plan; gate on scalar_sharded_ok")
    k, G = plan
    rounds = n_iters // k

    def body(s2, c, r):
        _, _, Zl, Y, X = s2.shape
        Zext = Zl + 2 * G
        c_ext = _extend(c[0].astype(jnp.float32), G)
        r_ext = _extend(r[0].astype(jnp.float32), G)
        sr = s2[0]

        iz = jax.lax.axis_index(_Z)
        nz_d = jax.lax.psum(1, _Z)
        first_d = iz == 0
        last_d = iz == nz_d - 1
        clamp_g = jnp.stack([
            jnp.where(first_d, G + 1, 1),
            jnp.where(last_d, G + Zl - 2, Zext - 2),
        ]).astype(jnp.int32)

        # global Z (traced; equals s2's global extent)
        Zg = jnp.asarray(Zl, jnp.int32) * jnp.asarray(nz_d, jnp.int32)

        def band_xchg(band, shift):
            """ring_halo of an (s, s_prev) [2, G, Y, X] edge band; with
            shell_sliver ch1 travels as sliver + selected full planes
            (docstring above).  The sender's plane globals equal the
            receiver's ghost-plane globals by construction, so both
            sides compute their own masks from their own axis index."""
            if not shell_sliver:
                return ring_halo(band, _Z, shift)
            ch0 = band[0]                                   # [G, Y, X]
            cols = jnp.stack([band[1, :, :, 1], band[1, :, :, X - 2]],
                             axis=-1)                       # [G, Y, 2]
            g_ar = jnp.arange(G, dtype=jnp.int32)
            # globals of the SENT planes: shift=+1 sends the top G real
            # planes (the receiver's lo ghost), shift=-1 the bottom G
            iz32 = jnp.asarray(iz, jnp.int32)
            if shift == +1:
                gz_send = iz32 * Zl + (Zl - G) + g_ar
            else:
                gz_send = iz32 * Zl + g_ar
            gz_send = jax.lax.rem(gz_send + Zg, Zg)
            m1 = (gz_send == 1).astype(jnp.float32)
            m2 = (gz_send == Zg - 2).astype(jnp.float32)
            planes = jnp.stack([
                jnp.einsum("g,gyx->yx", m1, band[1]),
                jnp.einsum("g,gyx->yx", m2, band[1]),
            ])                                              # [2, Y, X]
            ch0 = ring_halo(ch0[None], _Z, shift)
            cols = ring_halo(cols, _Z, shift)
            planes = ring_halo(planes, _Z, shift)
            # (packing all three into ONE flat collective was tried to
            # dodge the extra launches and measured WORSE: 607.6 vs
            # 647.7 MLUPS slab-forced — the concat/reshape copies cost
            # more than the launches saved)
            # receiver: globals of ITS ghost planes (same values)
            if shift == +1:
                gz_recv = jax.lax.rem(iz32 * Zl - G + g_ar + Zg, Zg)
            else:
                gz_recv = jax.lax.rem((iz32 + 1) * Zl + g_ar, Zg)
            r1 = (gz_recv == 1).astype(jnp.float32)
            r2 = (gz_recv == Zg - 2).astype(jnp.float32)
            ch1 = (
                r1[:, None, None] * planes[0]
                + r2[:, None, None] * planes[1]
            )
            ch1 = ch1.at[:, :, 1].set(cols[..., 0])
            ch1 = ch1.at[:, :, X - 2].set(cols[..., 1])
            return jnp.concatenate([ch0, ch1[None]], axis=0)

        def run_round(sr, gb, emit_final):
            if emit_final:
                out, h2 = scalar_wavefront(
                    sr[None], c_ext[None], r_ext[None], n_iters=k,
                    emit="h2", dx=dx, h_ext=hx, interpret=interpret,
                    slab_clamp=clamp_g, ghosts=gb, k=k,
                )
                return out[0], h2[0]
            out, bands = scalar_wavefront(
                sr[None], c_ext[None], r_ext[None], n_iters=k,
                emit=None, interpret=interpret, ghosts=gb,
                emit_bands=True, k=k,
            )
            return out[0], bands

        def scan_body(carry, _):
            sr, gb = carry
            sr, (blo, bhi) = run_round(sr, gb, emit_final=False)
            gb = (band_xchg(bhi, +1), band_xchg(blo, -1))
            return (sr, gb), None

        # first round's bands slice the incoming s2 directly (one-time;
        # s2 is still pristine — no in-place pass has run yet)
        gb = (
            band_xchg(sr[:, -G:], +1),
            band_xchg(sr[:, :G], -1),
        )
        if rounds > 1:
            (sr, gb), _ = jax.lax.scan(
                scan_body, (sr, gb), None, length=rounds - 1
            )
        sr, h2 = run_round(sr, gb, emit_final=True)
        return sr[None], h2[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec), check_vma=False,
    )
    s2o, h2 = fn(s2, cmask, rhs_scaled)
    return h2, s2o


# ----------------------------------------------------------------------
# Capillary stencils
# ----------------------------------------------------------------------
def _fix_xy_replicate(out):
    """Local y/x boundary-ring replicate (the x/y part of
    ops.pallas.stencil3d.fix_ring_replicate, same order)."""
    out = out.at[..., :, :, 0].set(out[..., :, :, 1])
    out = out.at[..., :, :, -1].set(out[..., :, :, -2])
    out = out.at[..., :, 0, :].set(out[..., :, 1, :])
    out = out.at[..., :, -1, :].set(out[..., :, -2, :])
    return out


def _zmask():
    iz = jax.lax.axis_index(_Z)
    nz = jax.lax.psum(1, _Z)
    return iz == 0, iz == nz - 1


def grad_fields_sharded(fields, mesh, *, dx=1.0, interpret=False):
    """shard_map slab version of ops.pallas.stencil3d.grad_fields."""
    spec = _spec(mesh)

    if _dp_dispatch(mesh):
        # single-device mode applies the full boundary-ring replicate
        # itself (== the xy fix + global-z fix composition below)
        fn = shard_map(
            lambda x: grad_fields(x, dx=dx, interpret=interpret),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        )
        return fn(fields)

    def body(x):
        glo = ring_halo(x[:, :, -1:], _Z, +1)
        ghi = ring_halo(x[:, :, :1], _Z, -1)
        out = grad_fields(x, glo, ghi, dx=dx, interpret=interpret)
        out = _fix_xy_replicate(out)
        first, last = _zmask()
        out = out.at[..., 0, :, :].set(
            jnp.where(first, out[..., 1, :, :], out[..., 0, :, :])
        )
        out = out.at[..., -1, :, :].set(
            jnp.where(last, out[..., -2, :, :], out[..., -1, :, :])
        )
        return out

    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)(fields)


def laplacian_field_sharded(field, mesh, *, dx=1.0, interpret=False):
    """shard_map slab version of ops.pallas.stencil3d.laplacian_field."""
    spec = _spec(mesh)

    if _dp_dispatch(mesh):
        fn = shard_map(
            lambda x: laplacian_field(x, dx=dx, interpret=interpret),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        )
        return fn(field)

    def body(x):
        glo = ring_halo(x[:, :, -1:], _Z, +1)
        ghi = ring_halo(x[:, :, :1], _Z, -1)
        out = laplacian_field(x, glo, ghi, dx=dx, interpret=interpret)
        first, last = _zmask()
        zero = jnp.zeros_like(out[..., 0, :, :])
        out = out.at[..., 0, :, :].set(
            jnp.where(first, zero, out[..., 0, :, :])
        )
        out = out.at[..., -1, :, :].set(
            jnp.where(last, zero, out[..., -1, :, :])
        )
        return out

    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)(field)


# ----------------------------------------------------------------------
# HCZ collision: purely local, no exchange
# ----------------------------------------------------------------------
def hcz_collide_sharded(
    f, g, rho, vel, density, pressure, flags, force, dfai, dprho, mesh, *,
    tau_f, tau_g, dx=1.0, dt=1.0, interpret=False,
):
    """shard_map wrapper over the fused HCZ collision (no communication —
    collision is local; shard_map only carries the kernel past GSPMD)."""
    spec = _spec(mesh)
    body = functools.partial(
        hcz_collide_fused, tau_f=tau_f, tau_g=tau_g, dx=dx, dt=dt,
        interpret=interpret,
    )
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec,) * 10, out_specs=(spec, spec),
        check_vma=False,
    )
    return fn(f, g, rho, vel, density, pressure, flags, force, dfai, dprho)
