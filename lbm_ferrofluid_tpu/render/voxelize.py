"""Mesh voxelization: surface rasterization + interior flood fill.

JAX port of the reference CUDA extension
(renderutils/cuda/voxelization_cuda_kernel.cu):

* ``voxelize_surface``  <- voxelize_sub1 (:29-86): per (y, x) column,
  ray-triangle barycentric test stamps voxels at the face depth (and the
  (y-1, x-1) neighbor combinations),
* ``voxelize_vertices`` <- voxelize_sub2 (:89-118): stamp vertex cells,
* ``fill_interior``     <- voxelize_sub3/4 (:119-190): outside-visibility
  flood fill as a ``lax.while_loop`` dilation, then solid = NOT visible.

Coordinate convention follows the reference exactly: face vertex components
are interpreted (y, x, z) and the voxel grid is indexed [y, x, z].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["voxelize_surface", "voxelize_vertices", "fill_interior", "voxelize"]


def voxelize_surface(faces, voxel_size: int, voxels=None, face_chunk: int = 64):
    """Surface voxelization (sub1).  faces: [B, F, 3, 3] with (y, x, z)."""
    B, F = faces.shape[:2]
    vs = voxel_size
    if voxels is None:
        voxels = jnp.zeros((B, vs, vs, vs), jnp.int32)

    ys = jnp.arange(vs, dtype=faces.dtype)
    xs = jnp.arange(vs, dtype=faces.dtype)
    Y = jnp.broadcast_to(ys[:, None], (vs, vs))  # [y, x]
    X = jnp.broadcast_to(xs[None, :], (vs, vs))

    n_chunks = -(-F // face_chunk)
    Fp = n_chunks * face_chunk
    f = jnp.pad(faces, [(0, 0), (0, Fp - F), (0, 0), (0, 0)])
    f = f.reshape(B, n_chunks, face_chunk, 3, 3).swapaxes(0, 1)
    fmask = jnp.pad(jnp.ones((B, F), bool), [(0, 0), (0, Fp - F)])
    fmask = fmask.reshape(B, n_chunks, face_chunk).swapaxes(0, 1)

    def step(vox, blk):
        fb, mb = blk  # [B,C,3,3], [B,C]
        v0 = fb[:, :, 0]  # [B,C,3] (y, x, z)
        y1d = (fb[:, :, 1, 0] - v0[..., 0])[..., None, None]
        x1d = (fb[:, :, 1, 1] - v0[..., 1])[..., None, None]
        z1d = (fb[:, :, 1, 2] - v0[..., 2])[..., None, None]
        y2d = (fb[:, :, 2, 0] - v0[..., 0])[..., None, None]
        x2d = (fb[:, :, 2, 1] - v0[..., 1])[..., None, None]
        z2d = (fb[:, :, 2, 2] - v0[..., 2])[..., None, None]
        ypd = Y[None, None] - v0[..., 0][..., None, None]
        xpd = X[None, None] - v0[..., 1][..., None, None]
        det = x1d * y2d - x2d * y1d
        safe_det = jnp.where(det == 0, 1.0, det)
        t1 = (y2d * xpd - x2d * ypd) / safe_det
        t2 = (-y1d * xpd + x1d * ypd) / safe_det
        hit = (det != 0) & (t1 >= 0) & (t2 >= 0) & (t1 + t2 <= 1)
        hit = hit & mb[..., None, None]
        z = jnp.floor(t1 * z1d + t2 * z2d + v0[..., 2][..., None, None]).astype(
            jnp.int32
        )
        z_ok = (z >= 0) & (z < vs)
        hit = hit & z_ok
        zc = jnp.clip(z, 0, vs - 1)
        # stamp into a per-chunk [B, y, x, z] grid via one-hot over z,
        # OR-reduced over faces, then OR the 4 (y/x, y-1/x-1) shifts
        zhot = jax.nn.one_hot(zc, vs, dtype=jnp.bool_, axis=-1)  # [B,C,vs,vs,vs]
        stamp = jnp.any(zhot & hit[..., None], axis=1)  # [B, y, x, z]
        acc = stamp.astype(jnp.int32)
        # (y-1, x), (y, x-1), (y-1, x-1): writing to yi=y-1 means voxel row
        # r receives stamps computed at pixel row r+1 -> shift stamp down
        sh_y = jnp.pad(stamp[:, 1:], [(0, 0), (0, 1), (0, 0), (0, 0)])
        sh_x = jnp.pad(stamp[:, :, 1:], [(0, 0), (0, 0), (0, 1), (0, 0)])
        sh_yx = jnp.pad(stamp[:, 1:, 1:], [(0, 0), (0, 1), (0, 1), (0, 0)])
        acc = acc | sh_y.astype(jnp.int32) | sh_x.astype(jnp.int32) | sh_yx.astype(jnp.int32)
        return vox | acc, None

    voxels, _ = jax.lax.scan(step, voxels, (f, fmask))
    return voxels


def voxelize_vertices(faces, voxel_size: int, voxels=None):
    """Stamp floor(vertex) cells (sub2)."""
    B, F = faces.shape[:2]
    vs = voxel_size
    if voxels is None:
        voxels = jnp.zeros((B, vs, vs, vs), jnp.int32)
    v = jnp.floor(faces.reshape(B, F * 3, 3)).astype(jnp.int32)
    ok = jnp.all((v >= 0) & (v < vs), axis=-1)
    flat_idx = (v[..., 0] * vs + v[..., 1]) * vs + v[..., 2]
    flat_idx = jnp.where(ok, flat_idx, 0)
    updates = ok.astype(jnp.int32)
    out = voxels.reshape(B, -1)
    out = jax.vmap(lambda o, i, u: o.at[i].max(u))(out, flat_idx, updates)
    return out.reshape(B, vs, vs, vs)


def fill_interior(voxels):
    """Flood exterior visibility from the boundary, solidify the rest
    (sub3 + iterated sub4 until fixpoint)."""
    B, vs = voxels.shape[0], voxels.shape[1]
    empty = voxels == 0

    boundary = jnp.zeros((vs, vs, vs), bool)
    boundary = boundary.at[0].set(True).at[-1].set(True)
    boundary = boundary.at[:, 0].set(True).at[:, -1].set(True)
    boundary = boundary.at[:, :, 0].set(True).at[:, :, -1].set(True)
    visible = empty & boundary[None]

    def dilate(vis):
        grown = vis
        for axis in (1, 2, 3):
            grown = (
                grown
                | jnp.pad(vis, [(0, 0)] * axis + [(1, 0)] + [(0, 0)] * (3 - axis))[
                    tuple(
                        slice(None) if a != axis else slice(0, vs)
                        for a in range(4)
                    )
                ]
                | jnp.pad(vis, [(0, 0)] * axis + [(0, 1)] + [(0, 0)] * (3 - axis))[
                    tuple(
                        slice(None) if a != axis else slice(1, vs + 1)
                        for a in range(4)
                    )
                ]
            )
        return grown & empty

    def cond(state):
        vis, changed = state
        return changed

    def body(state):
        vis, _ = state
        new = dilate(vis)
        return new, jnp.any(new != vis)

    visible, _ = jax.lax.while_loop(cond, body, (visible, jnp.asarray(True)))
    return (~visible).astype(jnp.int32)


def voxelize(faces, voxel_size: int, *, normalize: bool = False):
    """Full pipeline: surface + vertices + interior fill.

    With ``normalize`` the faces (in [0, 1]) are scaled to the grid as the
    reference's python wrapper does.
    """
    if normalize:
        faces = faces * (voxel_size - 1)
    vox = voxelize_surface(faces, voxel_size)
    vox = vox | voxelize_vertices(faces, voxel_size)
    return fill_interior(vox)
