"""Ring-pipelined contact-angle boundary kernel (3D).

Replaces ops/collide.py:contact_angle_boundary on the single-device TPU
fast path.  The jnp scatter chain costs ~0.55 ms/step at 128x256^2: the
x-face updates are lane-dim dynamic-update-slices (whole-tile
read-modify-write on TPU layout, ~a full volume pass each) plus a
protective copy of rho.  This kernel reads rho and flags ONCE and writes
rho_ca once (manual per-plane DMA; a BlockSpec window would re-fetch
every plane 5x).

Semantics are the reference's sequential in-place surgery, reproduced
exactly (HCZ_3d.py:84-211 via collide.py):

  x faces -> y faces (reading updated x borders) -> z faces (plain
  interior copies) -> z-edge lines (4 per interior plane, reading the
  plane's updated faces) -> x/y edge lines of planes 0/Z-1 (reading the
  NEIGHBOR plane's updated faces) -> 8 corners.

Cross-plane reads resolve to either PRE-update values (face hlp terms
read interior columns the face writes never touch) or to the neighbor
plane's post-face values, which this kernel RECOMPUTES in-register for
the two edge planes (planes 1 and Z-2 are interior planes, so the
recomputation equals their actual output at the cells read).

Multi-chip slab mode (``ghosts``/``clamp``): every cross-plane read is a
PRE-update value, so a local slab needs exactly one neighbor rho plane
per side (flags ghosts are never read — the surgery only tests the
target plane's own flags).  ``clamp`` is an int32 [2] SMEM array of
(is_global_bottom, is_global_top): the edge surgery (z-face copy +
edge-line/corner averages) runs only on true domain-edge planes; a slab
boundary plane of an interior device takes the interior path reading the
ghost.  The edge plane's in-register neighbor recomputation reads planes
0..2 / Z-3..Z-1, all local at Z >= 4 (parallel/step3d.py:
contact3d_sharded is the shard_map wrapper).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.types import CellType
from .fused_step import _rem
from .stencil3d import _shift_replicate

__all__ = ["contact_angle_3d", "contact_angle_3d_supported"]

_OBS = int(CellType.OBSTACLE)
_EPS = 1e-6


def contact_angle_3d_supported(shape) -> bool:
    B, C, Z, Y, X = shape
    return B == 1 and C == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 4


def _sh(v, sy, sx, Y, X):
    return _shift_replicate(v, sy, sx, Y, X)


def _faces(t, v, vm, vp, fl, Y, X):
    """x faces then y faces of one interior plane, sequentially (the y
    hlp reads the updated x borders, exactly as the chained jnp
    updates).  ``vm``/``vp`` are the PRE-update neighbor planes — the
    cross-plane hlp terms read columns the face writes never touch."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    obs = fl == _OBS
    row_in = (row >= 1) & (row <= Y - 2)
    col_in = (col >= 1) & (col <= X - 2)

    # neg x (HCZ_3d faces 1): target (y interior, x=0)
    dz = _sh(vp, 0, -1, Y, X) - _sh(vm, 0, -1, Y, X)
    dy = _sh(v, -1, -1, Y, X) - _sh(v, 1, -1, Y, X)
    hlp = jnp.sqrt(_EPS + dz * dz + dy * dy)
    v1 = jnp.where(
        (col == 0) & row_in & obs, _sh(v, 0, -2, Y, X) + t * hlp, v
    )
    # pos x: target (y interior, x=X-1)
    dz = _sh(vp, 0, 1, Y, X) - _sh(vm, 0, 1, Y, X)
    dy = _sh(v1, -1, 1, Y, X) - _sh(v1, 1, 1, Y, X)
    hlp = jnp.sqrt(_EPS + dz * dz + dy * dy)
    v2 = jnp.where(
        (col == X - 1) & row_in & obs, _sh(v1, 0, 2, Y, X) + t * hlp, v1
    )
    # neg y: target (y=0, x interior); the in-plane term reads x+-1,
    # which at the x borders is the just-updated face value
    dz = _sh(vp, -1, 0, Y, X) - _sh(vm, -1, 0, Y, X)
    dx = _sh(v2, -1, -1, Y, X) - _sh(v2, -1, 1, Y, X)
    hlp = jnp.sqrt(_EPS + dz * dz + dx * dx)
    v3 = jnp.where(
        (row == 0) & col_in & obs, _sh(v2, -2, 0, Y, X) + t * hlp, v2
    )
    # pos y: target (y=Y-1, x interior)
    dz = _sh(vp, 1, 0, Y, X) - _sh(vm, 1, 0, Y, X)
    dx = _sh(v3, 1, -1, Y, X) - _sh(v3, 1, 1, Y, X)
    hlp = jnp.sqrt(_EPS + dz * dz + dx * dx)
    return jnp.where(
        (row == Y - 1) & col_in & obs, _sh(v3, 2, 0, Y, X) + t * hlp, v3
    )


def _group_a(v, Y, X):
    """The 4 z-edge-line corners of one interior plane, unconditional,
    each averaging the plane's two adjacent (updated) face cells."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    x_in = jnp.where(col == 0, _sh(v, 0, -1, Y, X), _sh(v, 0, 1, Y, X))
    y_in = jnp.where(row == 0, _sh(v, -1, 0, Y, X), _sh(v, 1, 0, Y, X))
    corner = ((col == 0) | (col == X - 1)) & ((row == 0) | (row == Y - 1))
    return jnp.where(corner, 0.5 * (x_in + y_in), v)


def _edge_plane(base, nb, Y, X):
    """Planes 0 / Z-1 after their z-face copy: x/y edge lines reading
    the neighbor plane's post-face values (``nb``), then the 4 cube
    corners of this plane (HCZ_3d edges groups 2-3 + corners; the two
    planes are mirror-symmetric in (y, x))."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    row_in = (row >= 1) & (row <= Y - 2)
    col_in = (col >= 1) & (col <= X - 2)
    # x-border lines (y interior): 0.5 * (own inward-x + neighbor plane)
    x_in = jnp.where(col == 0, _sh(base, 0, -1, Y, X), _sh(base, 0, 1, Y, X))
    e1 = jnp.where(
        ((col == 0) | (col == X - 1)) & row_in, 0.5 * (x_in + nb), base
    )
    # y-border lines (x interior)
    y_in = jnp.where(row == 0, _sh(e1, -1, 0, Y, X), _sh(e1, 1, 0, Y, X))
    e2 = jnp.where(
        ((row == 0) | (row == Y - 1)) & col_in, 0.5 * (y_in + nb), e1
    )
    # corners: (own inward-x + own inward-y + neighbor plane) / 3
    x_in = jnp.where(col == 0, _sh(e2, 0, -1, Y, X), _sh(e2, 0, 1, Y, X))
    y_in = jnp.where(row == 0, _sh(e2, -1, 0, Y, X), _sh(e2, 1, 0, Y, X))
    corner = ((col == 0) | (col == X - 1)) & ((row == 0) | (row == Y - 1))
    return jnp.where(corner, (x_in + y_in + nb) / 3.0, e2)


def _kernel(t, Z, has_ghosts, *refs):
    if has_ghosts:
        (clamp_ref, rho_ref, fl_ref, gm_ref, gp_ref, out_ref, rho_ring,
         fl_ring, store, sem_r, sem_f, sem_o) = refs
    else:
        (rho_ref, fl_ref, out_ref, rho_ring, fl_ring, store,
         sem_r, sem_f, sem_o) = refs
        clamp_ref = gm_ref = gp_ref = None
    Y, X = rho_ref.shape[2], rho_ref.shape[3]

    def slot(q):
        # +6 keeps traced q = p-1 at p=0 (evaluated under a false
        # pl.when predicate) out of negative-index territory
        return _rem(q + 6, 6)

    def in_copies(q):
        s = slot(q)
        return [
            pltpu.make_async_copy(
                rho_ref.at[:, pl.ds(q, 1)], rho_ring.at[:, pl.ds(s, 1)],
                sem_r.at[s],
            ),
            pltpu.make_async_copy(
                fl_ref.at[:, pl.ds(q, 1)], fl_ring.at[:, pl.ds(s, 1)],
                sem_f.at[s],
            ),
        ]

    def out_copy(p):
        s = _rem(p, 2)
        return pltpu.make_async_copy(
            store.at[:, pl.ds(s, 1)], out_ref.at[:, pl.ds(p, 1)],
            sem_o.at[s],
        )

    def ghost_copy(ref, q):
        # rho ghost plane into ring slot slot(q) (q = -1 below, Z above);
        # same shape as a regular rho plane copy, so the semaphore
        # accounting matches a plane wait on that slot
        s = slot(q)
        return pltpu.make_async_copy(
            ref.at[:, pl.ds(0, 1)], rho_ring.at[:, pl.ds(s, 1)], sem_r.at[s]
        )

    def rplane(q):
        return rho_ring[0, slot(q)]

    def fplane(q):
        return fl_ring[0, slot(q)]

    def interior(p):
        return _group_a(
            _faces(t, rplane(p), rplane(p - 1), rplane(p + 1), fplane(p),
                   Y, X),
            Y, X,
        )

    col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    int_2d = (col >= 1) & (col <= X - 2) & (row >= 1) & (row <= Y - 2)

    def edge(p, nbp, srcp):
        # z-face copy (interior, where OBSTACLE), then the edge/corner
        # surgery reading the recomputed neighbor post-face plane
        base = jnp.where(
            int_2d & (fplane(p) == _OBS), rplane(srcp), rplane(p)
        )
        # neighbor plane's post-face values from PRE planes (it is an
        # interior plane, so this equals its own output at the cells
        # read: faces + its z-line corners)
        nb = _group_a(
            _faces(t, rplane(nbp), rplane(nbp - 1), rplane(nbp + 1),
                   fplane(nbp), Y, X),
            Y, X,
        )
        return _edge_plane(base, nb, Y, X)

    def body(tb, _):
        # planes 0..2 (slab: -1..2) are waited in the preamble; every
        # plane in [3, Z-1] (slab: plus the upper ghost at index Z) is
        # waited exactly once here
        @pl.when((tb >= 3) & (tb <= Z - 1))
        def _():
            for cp in in_copies(tb):
                cp.wait()

        if has_ghosts:
            @pl.when(tb == Z)
            def _():
                ghost_copy(gp_ref, Z).wait()

        p = tb - 2

        @pl.when(p - 2 >= 0)
        def _():
            out_copy(p - 2).wait()

        s = _rem(p, 2)

        @pl.when((p >= 1) & (p <= Z - 2))
        def _():
            store[0, s] = interior(p)

        if has_ghosts:
            is_bot = clamp_ref[0] == 1
            is_top = clamp_ref[1] == 1

            @pl.when((p == 0) & is_bot)
            def _():
                store[0, s] = edge(0, 1, 2)

            @pl.when((p == 0) & jnp.logical_not(is_bot))
            def _():
                # slab boundary of an interior device: plain interior
                # surgery reading the lower ghost as plane -1
                store[0, s] = interior(0)

            @pl.when((p == Z - 1) & is_top)
            def _():
                store[0, s] = edge(Z - 1, Z - 2, Z - 3)

            @pl.when((p == Z - 1) & jnp.logical_not(is_top))
            def _():
                store[0, s] = interior(Z - 1)
        else:
            @pl.when(p == 0)
            def _():
                store[0, s] = edge(0, 1, 2)

            @pl.when(p == Z - 1)
            def _():
                store[0, s] = edge(Z - 1, Z - 2, Z - 3)

        out_copy(p).start()

        @pl.when(tb + 2 <= Z - 1)
        def _():
            for cp in in_copies(tb + 2):
                cp.start()

        if has_ghosts:
            @pl.when(tb + 2 == Z)
            def _():
                ghost_copy(gp_ref, Z).start()

        return 0

    for q in (0, 1, 2, 3):
        for cp in in_copies(q):
            cp.start()
    if has_ghosts:
        ghost_copy(gm_ref, -1).start()
    for q in (0, 1, 2):
        for cp in in_copies(q):
            cp.wait()
    if has_ghosts:
        ghost_copy(gm_ref, -1).wait()

    jax.lax.fori_loop(2, Z + 2, body, 0)
    for d in (2, 1):
        out_copy(Z - d).wait()


@functools.partial(jax.jit, static_argnames=("contact_angle", "interpret"))
def contact_angle_3d(rho, flags, contact_angle, ghosts=None, clamp=None,
                     interpret=False):
    """Kernel twin of contact_angle_boundary(rho, flags, angle, dim=3).

    ghosts / clamp: slab mode (parallel/step3d.py:contact3d_sharded) —
        ``ghosts`` is (rho_lo, rho_hi), one pre-update neighbor rho plane
        per side, [1, 1, 1, Y, X] each, and ``clamp`` an int32 [2] array
        of (is_global_bottom, is_global_top) so only true domain-edge
        planes get the edge surgery.  Requires Z >= 4.
    """
    _, _, Z, Y, X = rho.shape
    has_ghosts = ghosts is not None
    assert not has_ghosts or Z >= 4, "slab mode needs >= 4 local planes"
    t = math.tan(math.pi / 2.0 - contact_angle)
    args = [rho[0].astype(jnp.float32), flags[0].astype(jnp.int32)]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    if has_ghosts:
        args += [gh[0].astype(jnp.float32) for gh in ghosts]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        args = [jnp.asarray(clamp, jnp.int32)] + args
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    out = pl.pallas_call(
        functools.partial(_kernel, t, Z, has_ghosts),
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 6, Y, X), jnp.float32),
            pltpu.VMEM((1, 6, Y, X), jnp.int32),
            pltpu.VMEM((1, 2, Y, X), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[None]
