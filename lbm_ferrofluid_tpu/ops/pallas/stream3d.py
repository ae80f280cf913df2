"""Fused Pallas kernel: D3Q19 streaming + bounce-back + raw moments.

Replaces the jnp composition stream -> bounce_back -> (Σf, Σf·e) for 3D
models.  The jnp path moves each of the 19 populations with up-to-3
sequential ``jnp.roll`` copies (~115 GB/s effective); this kernel performs
the whole pull in one pass using the same channel-group trick as the
Poisson kernel (ops/pallas/poisson.py): D3Q19's lattice ordering is already
e_z-grouped, so the z-halos are exactly the neighbor planes of the
contiguous up/down channel slices, with periodic wrap via the BlockSpec
index map.  In-plane (y, x) shifts are ``pltpu.roll`` on full-plane tiles.

Outputs the post-bounce-back distributions plus the raw zeroth/first
moments (freezing on OBSTACLE cells and the division by rho happen outside;
they are cheap 4-channel elementwise ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...lattice import D3Q19, Lattice
from ...utils.types import CellType

__all__ = ["stream_bounce_moments", "stream_bounce_macro", "stream3d_supported"]

_OBS = int(CellType.OBSTACLE)

_ORDER_OK = all(
    int(D3Q19.e[q][2]) == (0 if q < 9 else (1 if q < 14 else -1)) for q in range(19)
)
assert _ORDER_OK, "D3Q19 ordering must be e_z-grouped"


def stream3d_supported(lat: Lattice, f_shape: tuple[int, ...]) -> bool:
    if lat.q != 19:
        return False
    B, Q, Z, Y, X = f_shape
    return B == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 2


def _load_streamed(mid_ref, up_ref, dn_ref, Y, X, halo=None):
    """Pull-streamed values for all 19 channels, in f32.

    ``halo=(up_ghost_ref, dn_ghost_ref)`` substitutes the z-wrapped reads at
    the slab boundary: at local plane 0 the up-moving channels pull their
    z-1 plane from the ring-previous device's ghost, at plane Z-1 the
    down-moving channels pull from the ring-next device's ghost (the
    shard_map halo-exchange path, parallel/step3d.py).  Loads are cast to
    f32 before the shifts (Mosaic's dynamic rotate rejects bf16 vectors),
    which also makes bf16 storage compute in full precision in-register.
    """
    lat = D3Q19
    if halo is not None:
        i = pl.program_id(0)
        first = i == 0
        last = i == pl.num_programs(0) - 1
    streamed = [None] * 19
    for q in range(19):
        if q < 9:
            v = mid_ref[q, 0].astype(jnp.float32)
        elif q < 14:
            v = up_ref[q - 9, 0].astype(jnp.float32)
            if halo is not None:
                v = jnp.where(first, halo[0][q - 9, 0].astype(jnp.float32), v)
        else:
            v = dn_ref[q - 14, 0].astype(jnp.float32)
            if halo is not None:
                v = jnp.where(last, halo[1][q - 14, 0].astype(jnp.float32), v)
        ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
        if ey:
            v = pltpu.roll(v, ey % Y, 0)
        if ex:
            v = pltpu.roll(v, ex % X, 1)
        streamed[q] = v
    return streamed


def _macro_kernel(c, rho_gas, rho_fluid, density_gas, density_fluid, halo,
                  mid_ref, up_ref, dn_ref, flags_ref, rho_old_ref, vel_old_ref,
                  *rest):
    """stream + bounce + frozen macro fields + linear density map."""
    lat = D3Q19
    if halo:
        up_g_ref, dn_g_ref = rest[0], rest[1]
        out_ref, rho_ref, vel_ref, density_ref = rest[2:]
        ghosts = (up_g_ref, dn_g_ref)
    else:
        out_ref, rho_ref, vel_ref, density_ref = rest
        ghosts = None
    Y, X = mid_ref.shape[2], mid_ref.shape[3]
    is_obs = flags_ref[0, 0] == _OBS

    streamed = _load_streamed(mid_ref, up_ref, dn_ref, Y, X, ghosts)
    post = [
        jnp.where(is_obs, streamed[int(lat.opposite[q])], streamed[q])
        for q in range(19)
    ]
    for q in range(19):
        out_ref[q, 0] = post[q].astype(out_ref.dtype)

    m0 = post[0]
    for q in range(1, 19):
        m0 = m0 + post[q]
    rho = jnp.where(is_obs, rho_old_ref[0, 0], m0)
    rho_ref[0, 0] = rho
    density_ref[0, 0] = density_gas + (density_fluid - density_gas) * (
        (rho - rho_gas) / (rho_fluid - rho_gas)
    )
    inv_rho = c / rho
    for d in range(3):
        md = None
        for q in range(19):
            ev = int(lat.e[q][d])
            if ev == 0:
                continue
            term = post[q] if ev == 1 else -post[q]
            md = term if md is None else md + term
        vel_ref[d, 0] = jnp.where(is_obs, vel_old_ref[d, 0], md * inv_rho)


def _kernel(halo, mid_ref, up_ref, dn_ref, flags_ref, *rest):
    lat = D3Q19
    if halo:
        up_g_ref, dn_g_ref, out_ref, m0_ref, m1_ref = rest
        ghosts = (up_g_ref, dn_g_ref)
    else:
        out_ref, m0_ref, m1_ref = rest
        ghosts = None
    Y = mid_ref.shape[2]
    X = mid_ref.shape[3]
    is_obs = flags_ref[0, 0] == _OBS

    streamed = _load_streamed(mid_ref, up_ref, dn_ref, Y, X, ghosts)

    post = [
        jnp.where(is_obs, streamed[int(lat.opposite[q])], streamed[q])
        for q in range(19)
    ]

    m0 = post[0]
    for q in range(1, 19):
        m0 = m0 + post[q]
    m0_ref[0, 0] = m0
    for d in range(3):
        md = None
        for q in range(19):
            ev = int(lat.e[q][d])
            if ev == 0:
                continue
            term = post[q] if ev == 1 else -post[q]
            md = term if md is None else md + term
        m1_ref[d, 0] = md

    for q in range(19):
        out_ref[q, 0] = post[q].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_bounce_moments(
    f: jnp.ndarray, flags: jnp.ndarray, up_ghost=None, dn_ghost=None,
    *, interpret=False,
):
    """One fused pass: periodic pull streaming, full-way bounce back, and
    raw moments.

    Args:
        f: ``[1, 19, Z, Y, X]`` distributions (lattice order).
        flags: ``[1, 1, Z, Y, X]`` uint8.
        up_ghost/dn_ghost: optional ``[1, 5, 1, Y, X]`` ghost planes for the
            shard_map slab decomposition (parallel/step3d.py): the up-moving
            channels' plane z-1 at the slab bottom / the down-moving
            channels' plane z+1 at the slab top.  Without them z wraps
            periodically (the single-device semantics).

    Returns:
        (f_post ``[1,19,Z,Y,X]``, m0 ``[1,1,Z,Y,X]`` = Σ_q f_q,
        m1 ``[1,3,Z,Y,X]`` = Σ_q f_q e_q; moments in f32).
    """
    _, _, Z, Y, X = f.shape
    flags_i32 = flags[0].astype(jnp.int32)
    halo = up_ghost is not None

    bs = lambda c: pl.BlockSpec(  # noqa: E731
        (c, 1, Y, X), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    bs_up = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i - 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    bs_dn = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i + 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    bs_ghost = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = [bs(9), bs_up, bs_dn, bs(1)]
    args = [f[0, :9], f[0, 9:14], f[0, 14:19], flags_i32]
    if halo:
        in_specs += [bs_ghost, bs_ghost]
        args += [up_ghost[0], dn_ghost[0]]

    out, m0, m1 = pl.pallas_call(
        functools.partial(_kernel, halo),
        grid=(Z,),
        in_specs=in_specs,
        out_specs=[bs(19), bs(1), bs(3)],
        out_shape=[
            jax.ShapeDtypeStruct((19, Z, Y, X), f.dtype),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[None], m0[None], m1[None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "c", "rho_gas", "rho_fluid", "density_gas", "density_fluid", "interpret"
    ),
)
def stream_bounce_macro(
    f, flags, rho_old, vel_old, up_ghost=None, dn_ghost=None, *, c, rho_gas,
    rho_fluid, density_gas, density_fluid, interpret=False,
):
    """Fused stream + bounce-back + frozen macro recovery + density map.

    Returns (f_post, rho, vel, density) — the full hydrodynamic prologue of
    the HCZ/ferrofluid step in one HBM pass over f.  ``up_ghost``/``dn_ghost``
    as in :func:`stream_bounce_moments`.
    """
    _, _, Z, Y, X = f.shape
    flags_i32 = flags[0].astype(jnp.int32)
    halo = up_ghost is not None

    bs = lambda ch: pl.BlockSpec(  # noqa: E731
        (ch, 1, Y, X), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    bs_up = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i - 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    bs_dn = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i + 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    bs_ghost = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = [bs(9), bs_up, bs_dn, bs(1), bs(1), bs(3)]
    args = [f[0, :9], f[0, 9:14], f[0, 14:19], flags_i32, rho_old[0], vel_old[0]]
    if halo:
        in_specs += [bs_ghost, bs_ghost]
        args += [up_ghost[0], dn_ghost[0]]

    out, rho, vel, density = pl.pallas_call(
        functools.partial(
            _macro_kernel, c, rho_gas, rho_fluid, density_gas, density_fluid,
            halo,
        ),
        grid=(Z,),
        in_specs=in_specs,
        out_specs=[bs(19), bs(1), bs(3), bs(1)],
        out_shape=[
            jax.ShapeDtypeStruct((19, Z, Y, X), f.dtype),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[None], rho[None], vel[None], density[None]
