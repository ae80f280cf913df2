"""Differentiable rendering: SoftRas pipeline + isosurface extraction.

TPU-native re-design of the reference render stack (renderutils/): the
CUDA soft-rasterizer becomes a vectorized-JAX streaming-softmax rasterizer,
PyMCubes becomes a vectorized marching-tetrahedra extractor.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .camera import (
    eye_from_angles,
    look,
    look_at,
    perspective_distortion,
    vertices_to_faces,
)
from .lighting import (
    apply_ambient_light,
    apply_directional_light,
    compute_ambient_light,
    compute_directional_light,
)
from . import dibr
from .mesh import marching_cubes, marching_tetrahedra
from .texture import load_textures
from .voxelize import voxelize
from .renderer import SoftRenderer
from .softras import soft_rasterize

__all__ = [
    "SoftRenderer",
    "soft_rasterize",
    "look_at",
    "look",
    "perspective_distortion",
    "vertices_to_faces",
    "eye_from_angles",
    "compute_ambient_light",
    "compute_directional_light",
    "apply_ambient_light",
    "apply_directional_light",
    "marching_cubes",
    "marching_tetrahedra",
    "dibr",
    "load_textures",
    "voxelize",
    "phi_to_mesh",
    "render_phi_frame",
    "make_render_pipeline",
    "default_renderer",
]


def default_renderer(image_size: int = 256) -> SoftRenderer:
    """The camera used by the reference 3D demos
    (demo_3d_LBM_Rosensweig_instability.py:102-113)."""
    eye = jnp.asarray([1.6, 0.8, 1.6])
    direction = jnp.asarray([-1.0 / math.sqrt(2.0), 0.0, -1.0 / math.sqrt(2.0)])
    return SoftRenderer(
        image_size=image_size,
        camera_mode="look_at",
        eye=eye,
        camera_direction=direction,
        near=1.0,
        bg_color=jnp.asarray([1.0, 1.0, 1.0]),
    )


def phi_to_mesh(phi, res, dx: float = 1.0, method: str = "mt"):
    """Order parameter -> normalized triangle mesh, as the reference's
    save_rendered_image preamble (utils/io.py:50-64): pad interior with
    phi.max to close the surface, extract the -phi isosurface at 0, map
    vertices to [-1, 1].  ``method``: "mt" marching tetrahedra (default;
    native/C++ + on-device twins exist) or "mc" classic 256-case
    marching cubes (the reference's PyMCubes role, render/mcubes.py)."""
    phi = np.asarray(phi)
    interior = phi[..., 1:-1, 1:-1, 1:-1]
    pad = [(0, 0)] * (phi.ndim - 3) + [(1, 1)] * 3
    closed = np.pad(interior, pad, constant_values=float(phi.max()))
    volume = -closed[0, 0] * (2.0 / max(res) / dx)
    extract = marching_cubes if method == "mc" else marching_tetrahedra
    verts, faces = extract(volume, 0.0)
    verts = (verts - np.asarray(res, np.float32) / 2.0) * (2.0 / max(res))
    return verts, faces


def _bucket_mesh(verts, faces, far_z: float = 1e6):
    """Pad the mesh so the face count falls on a power-of-2 bucket.

    Marching the evolving interface gives a different face count every
    frame, which would recompile the jitted rasterizer each time; padding
    with degenerate far-away faces (all three corners on one distant point,
    rejected by the z clip) keeps the compiled shape stable across frames.
    """
    n = len(faces)
    bucket = 1 << max(10, (n - 1).bit_length())
    if n == bucket:
        return verts, faces
    pad_v = np.asarray([[0.0, 0.0, far_z]], np.float32)
    verts_p = np.concatenate([verts, pad_v])
    pad_f = np.full((bucket - n, 3), len(verts_p) - 1, np.int64)
    return verts_p, np.concatenate([faces, pad_f])


def make_render_pipeline(res, dx: float = 1.0, renderer=None,
                         gray: float = 0.68, budget: int = 1 << 16):
    """ONE jitted computation: phi -> marching tetrahedra -> soft-rasterize.

    Closes the step->render loop fully on device (round-4 verdict #4 /
    BASELINE north star "full step->render loops stay on TPU"): field
    data never crosses to the host — the returned function maps the
    [B, 1, *res] phi (or the raw [D, H, W] volume) to an
    ([image, image, 3] f32 image, triangle count) pair, and only the
    final image is read back for the PNG.  The triangle budget is static
    (fixed topology: unused face slots are far-away degenerates the z
    clip rejects, render/mesh_jax.py); a count above budget means the
    surface overflowed and the caller should rebuild with a larger one.

    Hold on to the returned callable — it owns the jit cache.
    """
    if renderer is None:
        renderer = default_renderer()

    from .mesh_jax import phi_to_mesh_jax

    @jax.jit
    def run(phi):
        verts, faces, count = phi_to_mesh_jax(phi, res, dx, budget)
        textures = jnp.full((1, faces.shape[0], 2, 3), gray, jnp.float32)
        out = renderer.forward(verts[None], faces[None], textures)
        img = jnp.clip(out[0, :3], 0.0, 1.0).transpose(1, 2, 0)
        return img, count

    return run


def render_phi_frame(phi, filename, res, dx: float = 1.0, renderer=None,
                     gray: float = 0.68, pipeline=None, method: str = "mt"):
    """save_rendered_image equivalent (utils/io.py:50-84): extract the
    interface mesh from phi, render with constant-gray textures, write PNG.
    Returns (verts, faces).

    With ``pipeline`` (from :func:`make_render_pipeline`) the extraction
    and rasterization run fully ON DEVICE in one jitted computation and
    only the final image is read back; verts/faces are then returned as
    (None, None) — use the host path (default) when the mesh itself is
    needed (OBJ export)."""
    if pipeline is not None:
        img_dev, count = pipeline(phi if hasattr(phi, "ndim") else
                                  jnp.asarray(phi))
        img = (np.asarray(img_dev) * 255).astype(np.uint8)
        from PIL import Image

        Image.fromarray(img).save(filename)
        return None, None
    if renderer is None:
        renderer = default_renderer()
    verts, faces = phi_to_mesh(phi, res, dx, method=method)
    if len(faces) == 0:
        img = np.full((renderer.image_size, renderer.image_size, 3), 255, np.uint8)
    else:
        verts_b, faces_b = _bucket_mesh(verts, faces)
        textures = jnp.full((1, faces_b.shape[0], 2, 3), gray, jnp.float32)
        out = renderer.forward(
            jnp.asarray(verts_b)[None], jnp.asarray(faces_b)[None], textures
        )
        img = np.asarray(out[0, :3]).transpose(1, 2, 0)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(img).save(filename)
    return verts, faces
