"""Fused Pallas kernels for the capillary stencils (D3Q19 HCZ, 3D).

``grad_fields``: 19-point isotropic gradients of N scalar fields in one pass
(ops/stencils.py:isotropic_grad inner stencil); ``laplacian_field``: the
19-point Laplacian.  Domain-boundary semantics (replicate for grad inputs /
interior-replicate for grad outputs, zero ring for the Laplacian) are
handled by in-kernel edge selects along y/x, program-id selects along z,
and a cheap ring fix-up outside; the OBSTACLE input substitution stays in
jnp (elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grad_fields", "laplacian_field", "stencil3d_supported", "fix_ring_replicate"]


def stencil3d_supported(shape) -> bool:
    B, C, Z, Y, X = shape
    return B == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 2


def _shift_replicate(v, sy, sx, Y, X):
    """out[j, i] = v[clamp(j - sy), clamp(i - sx)] via rolls + edge selects."""
    out = v
    if sy:
        rolled = pltpu.roll(out, sy % Y, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = 0 if sy > 0 else Y - 1
        out = jnp.where(row == edge, out, rolled)
    if sx:
        rolled = pltpu.roll(out, sx % X, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        edge = 0 if sx > 0 else X - 1
        out = jnp.where(col == edge, out, rolled)
    return out


# 19-point isotropic gradient taps (ops/stencils.py:isotropic_grad, 3D),
# offsets in (z, y, x) array order, divided by 12 dx
_GRAD_TAPS = {
    0: [((0, 0, 1), 2.0), ((0, 0, -1), -2.0),
        ((1, 0, 1), 1.0), ((-1, 0, -1), -1.0), ((-1, 0, 1), 1.0), ((1, 0, -1), -1.0),
        ((0, 1, 1), 1.0), ((0, -1, -1), -1.0), ((0, -1, 1), 1.0), ((0, 1, -1), -1.0)],
    1: [((0, 1, 0), 2.0), ((0, -1, 0), -2.0),
        ((1, 1, 0), 1.0), ((-1, -1, 0), -1.0), ((-1, 1, 0), 1.0), ((1, -1, 0), -1.0),
        ((0, 1, 1), 1.0), ((0, -1, -1), -1.0), ((0, 1, -1), 1.0), ((0, -1, 1), -1.0)],
    2: [((1, 0, 0), 2.0), ((-1, 0, 0), -2.0),
        ((1, 1, 0), 1.0), ((-1, -1, 0), -1.0), ((1, -1, 0), 1.0), ((-1, 1, 0), -1.0),
        ((1, 0, 1), 1.0), ((-1, 0, -1), -1.0), ((1, 0, -1), 1.0), ((-1, 0, 1), -1.0)],
}

# 19-point Laplacian taps: 2*(6 faces) + 12 edges - 24 center, / 6 dx^2
_LAP_TAPS = (
    [((0, 0, 1), 2.0), ((0, 0, -1), 2.0), ((0, 1, 0), 2.0), ((0, -1, 0), 2.0),
     ((1, 0, 0), 2.0), ((-1, 0, 0), 2.0)]
    + [((0, 1, 1), 1.0), ((0, 1, -1), 1.0), ((0, -1, 1), 1.0), ((0, -1, -1), 1.0),
       ((1, 0, 1), 1.0), ((1, 0, -1), 1.0), ((-1, 0, 1), 1.0), ((-1, 0, -1), 1.0),
       ((1, 1, 0), 1.0), ((1, -1, 0), 1.0), ((-1, 1, 0), 1.0), ((-1, -1, 0), 1.0)]
    + [((0, 0, 0), -24.0)]
)


def _ring_replicate_plane(v, Y, X, by=None, bx=None):
    """Replace the y/x boundary ring with nearest-interior values (x edges
    first, then y on the x-fixed result — the fix_ring_replicate order).

    ``by``/``bx`` (static) override the ring's hi edge for OBSTACLE-padded
    arrays whose PHYSICAL domain ends at row by-1 / col bx-1 < Y-1 / X-1
    (params.phys_extent): the reference ties this fix to its array faces,
    which in a padded layout are the physical-box faces, not the padded
    ones.  Values beyond the box are dead (all-OBSTACLE pad)."""
    by = Y if by is None else by
    bx = X if bx is None else bx
    col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    v = jnp.where(col == 0, _shift_replicate(v, 0, -1, Y, X), v)
    v = jnp.where(col == bx - 1, _shift_replicate(v, 0, 1, Y, X), v)
    row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    v = jnp.where(row == 0, _shift_replicate(v, -1, 0, Y, X), v)
    v = jnp.where(row == by - 1, _shift_replicate(v, 1, 0, Y, X), v)
    return v


def _grad_kernel(n_fields, inv12dx, halo, ring_fix, mid_ref, prev_ref,
                 next_ref, *rest):
    Z = pl.num_programs(0)
    i = pl.program_id(0)
    Y, X = mid_ref.shape[2], mid_ref.shape[3]
    first = i == 0
    last = i == Z - 1
    if halo:
        glo_ref, ghi_ref, out_ref = rest
    else:
        (out_ref,) = rest
    for f in range(n_fields):
        v0 = mid_ref[f, 0]
        if halo:
            # slab decomposition: the z-neighbors at the slab boundary come
            # from ring-exchanged ghost planes (parallel/step3d.py); global
            # domain-boundary replicate is a masked output fix by the caller
            vm = jnp.where(first, glo_ref[f, 0], prev_ref[f, 0])
            vp = jnp.where(last, ghi_ref[f, 0], next_ref[f, 0])
        elif ring_fix:
            # the z-index map is clamped to [1, Z-2] (see grad_fields):
            # edge programs compute their interior neighbor's plane, whose
            # z-neighbors are always in range — no replicate select needed
            vm, vp = prev_ref[f, 0], next_ref[f, 0]
        else:
            # replicate along z at the domain boundary
            vm = jnp.where(first, v0, prev_ref[f, 0])
            vp = jnp.where(last, v0, next_ref[f, 0])
        planes = {-1: vm, 0: v0, 1: vp}
        for d in range(3):
            acc = None
            for (oz, oy, ox), wgt in _GRAD_TAPS[d]:
                # reading neighbor at offset o means shifting the plane by +o
                t = _shift_replicate(planes[oz], -oy, -ox, Y, X) * wgt
                acc = t if acc is None else acc + t
            res = acc * inv12dx
            if ring_fix:
                res = _ring_replicate_plane(res, Y, X)
            out_ref[f * 3 + d, 0] = res


def _lap_kernel(inv6dx2, halo, ring_fix, mid_ref, prev_ref, next_ref, *rest):
    Z = pl.num_programs(0)
    i = pl.program_id(0)
    Y, X = mid_ref.shape[2], mid_ref.shape[3]
    if halo:
        glo_ref, ghi_ref, out_ref = rest
    else:
        (out_ref,) = rest
    v0 = mid_ref[0, 0]
    if halo:
        vm = jnp.where(i == 0, glo_ref[0, 0], prev_ref[0, 0])
        vp = jnp.where(i == Z - 1, ghi_ref[0, 0], next_ref[0, 0])
    else:
        vm = jnp.where(i == 0, v0, prev_ref[0, 0])
        vp = jnp.where(i == Z - 1, v0, next_ref[0, 0])
    planes = {-1: vm, 0: v0, 1: vp}
    acc = None
    for (oz, oy, ox), wgt in _LAP_TAPS:
        t = _shift_replicate(planes[oz], -oy, -ox, Y, X) * wgt
        acc = t if acc is None else acc + t
    res = acc * inv6dx2
    if ring_fix:
        # zero boundary ring (x/y everywhere, whole z edge planes)
        col = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
        edge = (col == 0) | (col == X - 1) | (row == 0) | (row == Y - 1)
        if not halo:
            edge = edge | jnp.broadcast_to((i == 0) | (i == Z - 1), (Y, X))
        res = jnp.where(edge, jnp.zeros((), res.dtype), res)
    out_ref[0, 0] = res


def fix_ring_replicate(out):
    """Overwrite the boundary ring with nearest-interior values, matching the
    reference's F.pad(output_inner, mode='replicate') (stencils.py)."""
    out = out.at[..., :, :, 0].set(out[..., :, :, 1])
    out = out.at[..., :, :, -1].set(out[..., :, :, -2])
    out = out.at[..., :, 0, :].set(out[..., :, 1, :])
    out = out.at[..., :, -1, :].set(out[..., :, -2, :])
    out = out.at[..., 0, :, :].set(out[..., 1, :, :])
    out = out.at[..., -1, :, :].set(out[..., -2, :, :])
    return out


@functools.partial(jax.jit, static_argnames=("dx", "interpret"))
def grad_fields(
    fields, ghost_lo=None, ghost_hi=None, *, dx: float = 1.0,
    interpret: bool = False,
):
    """Isotropic gradients of N stacked scalar fields.

    Args:
        fields: ``[1, N, Z, Y, X]`` — already OBSTACLE-substituted
            (the caller applies the where(flags==OBSTACLE, ...) step).
        ghost_lo/ghost_hi: optional ``[1, N, 1, Y, X]`` z-neighbor planes for
            slab decomposition (parallel/step3d.py).  When given, the z
            boundary reads come from the ghosts and NO boundary-ring fix is
            applied here — the sharded caller applies the local y/x fixes and
            the axis_index-masked global-z fix itself.

    Returns:
        ``[1, 3N, Z, Y, X]`` with (gx, gy, gz) per field; single-device mode
        additionally has the boundary ring replicated from the interior.
    """
    _, N, Z, Y, X = fields.shape
    halo = ghost_lo is not None
    ring_fix = (not halo) and Z >= 4
    bs = lambda c, fn: pl.BlockSpec(  # noqa: E731
        (c, 1, Y, X), fn, memory_space=pltpu.VMEM
    )
    if ring_fix:
        # clamp the z map to [1, Z-2]: edge programs compute their interior
        # neighbor's (already y/x-ring-fixed) result, which IS the
        # fix_ring_replicate z-fix — no post-pass over the output needed
        zc = lambda i: jnp.clip(i, 1, Z - 2)  # noqa: E731
        in_specs = [
            bs(N, lambda i: (0, zc(i), 0, 0)),
            bs(N, lambda i: (0, zc(i) - 1, 0, 0)),
            bs(N, lambda i: (0, zc(i) + 1, 0, 0)),
        ]
    else:
        in_specs = [
            bs(N, lambda i: (0, i, 0, 0)),
            bs(N, lambda i: (0, (i - 1) % Z, 0, 0)),
            bs(N, lambda i: (0, (i + 1) % Z, 0, 0)),
        ]
    args = [fields[0], fields[0], fields[0]]
    if halo:
        in_specs += [bs(N, lambda i: (0, 0, 0, 0))] * 2
        args += [ghost_lo[0], ghost_hi[0]]
    out = pl.pallas_call(
        functools.partial(
            _grad_kernel, N, 1.0 / (12.0 * dx), halo, ring_fix
        ),
        grid=(Z,),
        in_specs=in_specs,
        out_specs=bs(3 * N, lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * N, Z, Y, X), fields.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if halo:
        return out[None]
    if ring_fix:  # boundary ring already written by the kernel
        return out[None]
    # the kernel computes the stencil at every plane with replicate-clamped
    # reads; the reference instead replicates the *interior result* outward
    return fix_ring_replicate(out[None])


@functools.partial(jax.jit, static_argnames=("dx", "interpret"))
def laplacian_field(
    field, ghost_lo=None, ghost_hi=None, *, dx: float = 1.0,
    interpret: bool = False,
):
    """19-point Laplacian of ``[1, 1, Z, Y, X]``, zero boundary ring.

    ``ghost_lo``/``ghost_hi`` as in :func:`grad_fields`; with ghosts only the
    local y/x rings are zeroed here, the global-z ring zeroing is the sharded
    caller's masked fix.
    """
    _, _, Z, Y, X = field.shape
    halo = ghost_lo is not None
    ring_fix = not halo
    bs = lambda fn: pl.BlockSpec(  # noqa: E731
        (1, 1, Y, X), fn, memory_space=pltpu.VMEM
    )
    in_specs = [
        bs(lambda i: (0, i, 0, 0)),
        bs(lambda i: (0, (i - 1) % Z, 0, 0)),
        bs(lambda i: (0, (i + 1) % Z, 0, 0)),
    ]
    args = [field[0], field[0], field[0]]
    if halo:
        in_specs += [bs(lambda i: (0, 0, 0, 0))] * 2
        args += [ghost_lo[0], ghost_hi[0]]
    out = pl.pallas_call(
        functools.partial(_lap_kernel, 1.0 / (6.0 * dx * dx), halo, ring_fix),
        grid=(Z,),
        in_specs=in_specs,
        out_specs=bs(lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, Z, Y, X), field.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    out = out[None]
    if ring_fix:  # zero ring already written by the kernel
        return out
    zero = jnp.zeros((), out.dtype)
    out = out.at[..., :, :, 0].set(zero)
    out = out.at[..., :, :, -1].set(zero)
    out = out.at[..., :, 0, :].set(zero)
    out = out.at[..., :, -1, :].set(zero)
    return out
