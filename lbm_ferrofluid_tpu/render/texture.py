"""Texture atlas loading: per-texel barycentric UV -> bilinear image sample.

JAX port of the reference CUDA extension
(renderutils/cuda/load_textures_cuda_kernel.cu:20-81): for each face and
each texel of its R x R atlas, compute the texel's barycentric position on
the triangle's UVs and bilinearly sample the source image.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["load_textures"]


def load_textures(image, faces_uv, texture_res: int, is_update=None):
    """Build per-face texture atlases.

    Args:
        image: ``[H, W, 3]`` source image.
        faces_uv: ``[F, 3, 2]`` per-face UVs in [0, 1].
        texture_res: atlas resolution R (atlas has R*R texels per face).
        is_update: optional ``[F]`` bool; faces with False get zeros.

    Returns:
        textures ``[F, R*R, 3]``.
    """
    H, W = image.shape[:2]
    R = texture_res
    F = faces_uv.shape[0]
    dtype = image.dtype

    # texel barycentric coordinates (kernel :39-49)
    tex_i = np.arange(R * R)
    w_y = (tex_i // R).astype(np.float64)
    w_x = (tex_i % R).astype(np.float64)
    lower = w_x + w_y < R
    w0 = np.where(lower, (w_x + 1.0 / 3.0) / R, ((R - 1.0 - w_x) + 2.0 / 3.0) / R)
    w1 = np.where(lower, (w_y + 1.0 / 3.0) / R, ((R - 1.0 - w_y) + 2.0 / 3.0) / R)
    w2 = 1.0 - w0 - w1
    w = jnp.asarray(np.stack([w0, w1, w2], axis=1), dtype)  # [R*R, 3]

    # uv position per (face, texel)
    uv = jnp.einsum("tk,fkc->ftc", w, faces_uv.astype(dtype))  # [F, R*R, 2]
    pos_x = uv[..., 0] * (W - 1)
    pos_y = uv[..., 1] * (H - 1)

    x0 = jnp.clip(jnp.floor(pos_x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(pos_y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx1 = pos_x - jnp.floor(pos_x)
    wx0 = 1.0 - wx1
    wy1 = pos_y - jnp.floor(pos_y)
    wy0 = 1.0 - wy1

    img = image.reshape(-1, 3)
    flat = lambda yy, xx: img[(yy * W + xx).reshape(-1)].reshape(F, R * R, 3)  # noqa: E731
    tex = (
        flat(y0, x0) * (wx0 * wy0)[..., None]
        + flat(y1, x0) * (wx0 * wy1)[..., None]
        + flat(y0, x1) * (wx1 * wy0)[..., None]
        + flat(y1, x1) * (wx1 * wy1)[..., None]
    )
    if is_update is not None:
        tex = jnp.where(jnp.asarray(is_update)[:, None, None], tex, 0.0)
    return tex
