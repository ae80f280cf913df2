"""Voxelization and texture-atlas loading tests."""

import jax.numpy as jnp
import numpy as np

from lbm_ferrofluid_tpu.render.texture import load_textures
from lbm_ferrofluid_tpu.render.voxelize import (
    fill_interior,
    voxelize,
    voxelize_surface,
)


def _box_mesh(lo, hi):
    """12-triangle axis-aligned box with (y, x, z) vertex components."""
    l, h = float(lo), float(hi)
    corners = np.array(
        [[a, b, c] for a in (l, h) for b in (l, h) for c in (l, h)]
    )
    quads = [
        (0, 1, 3, 2), (4, 5, 7, 6),  # y faces? (any orientation works)
        (0, 1, 5, 4), (2, 3, 7, 6),
        (0, 2, 6, 4), (1, 3, 7, 5),
    ]
    tris = []
    for (a, b, c, d) in quads:
        tris.append([corners[a], corners[b], corners[c]])
        tris.append([corners[a], corners[c], corners[d]])
    return jnp.asarray(np.asarray(tris)[None], jnp.float32)  # [1, 12, 3, 3]


def _sphere_mesh(vs, r):
    """Generic (non-axis-aligned) sphere mesh via marching tetrahedra.

    The column-ray surface test (reference voxelize_sub1) skips faces whose
    (y, x) projection is degenerate, so axis-aligned boxes are pathological
    for this algorithm (inherited behavior); generic meshes are the
    intended input.
    """
    from lbm_ferrofluid_tpu.render.mesh import marching_tetrahedra

    c = vs / 2
    i, j, k = np.mgrid[0:vs, 0:vs, 0:vs]
    vol = np.sqrt((i - c) ** 2 + (j - c) ** 2 + (k - c) ** 2) - r
    verts, faces = marching_tetrahedra(vol, 0.0)
    return jnp.asarray(verts[faces][None], jnp.float32)  # [1, F, 3, 3]


def test_voxelize_sphere_solid():
    vs = 16
    faces = _sphere_mesh(vs, 5.0)
    vox = np.asarray(voxelize(faces, vs))
    assert vox[0, 8, 8, 8] == 1  # center solid
    assert vox[0, 1, 1, 1] == 0  # outside empty
    # volume ~ 4/3 pi r^3 = 524, plus shell thickness
    assert 300 < vox.sum() < 1200


def test_surface_only_is_hollow():
    vs = 16
    faces = _box_mesh(4.0, 11.0)
    surf = np.asarray(voxelize_surface(faces, vs))
    assert surf[0, 7, 7, 7] == 0  # hollow before fill
    assert surf.sum() > 100


def test_fill_interior_closed_cavity():
    vs = 8
    vox = jnp.zeros((1, vs, vs, vs), jnp.int32)
    # hollow shell
    shell = np.zeros((vs, vs, vs), np.int32)
    shell[2:6, 2:6, 2:6] = 1
    shell[3:5, 3:5, 3:5] = 0
    vox = jnp.asarray(shell[None])
    solid = np.asarray(fill_interior(vox))
    assert solid[0, 3, 3, 3] == 1  # cavity filled
    assert solid[0, 0, 0, 0] == 0


def test_load_textures_constant_image():
    img = jnp.full((8, 8, 3), 0.25, jnp.float32)
    uv = jnp.asarray([[[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]], jnp.float32)
    tex = np.asarray(load_textures(img, uv, texture_res=4))
    assert tex.shape == (1, 16, 3)
    np.testing.assert_allclose(tex, 0.25, rtol=1e-6)


def test_load_textures_gradient_image():
    # image varying along x: texel colors must follow UV x position
    W = 32
    img = jnp.broadcast_to(
        jnp.linspace(0, 1, W)[None, :, None], (W, W, 3)
    ).astype(jnp.float32)
    uv_left = jnp.asarray([[[0.0, 0.5], [0.1, 0.5], [0.05, 0.6]]], jnp.float32)
    uv_right = jnp.asarray([[[0.9, 0.5], [1.0, 0.5], [0.95, 0.6]]], jnp.float32)
    t_left = np.asarray(load_textures(img, uv_left, 2)).mean()
    t_right = np.asarray(load_textures(img, uv_right, 2)).mean()
    assert t_left < 0.2 and t_right > 0.8
