"""Camera transforms: look_at / look / perspective distortion.

JAX ports of the reference SoftRenderer camera math
(renderutils/softrenderer.py:469-645); all pure functions over
``[B, V, 3]`` vertex arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "look_at",
    "look",
    "perspective_distortion",
    "vertices_to_faces",
    "eye_from_angles",
]

_EPS = 1e-5


def _normalize(v, eps=_EPS):
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def _camera_rotation(z_axis, up):
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    return jnp.stack([x_axis, y_axis, z_axis], axis=-2)  # [B, 3, 3]


def look_at(vertices, eye, at=None, up=None):
    """Transform vertices into the frame of a camera at ``eye`` looking at
    ``at`` (default origin) with ``up`` (default +y)
    (reference: softrenderer.py:469-538)."""
    vertices = jnp.asarray(vertices)
    eye = jnp.atleast_2d(jnp.asarray(vertices.dtype.type(1) * eye))
    B = vertices.shape[0]
    if at is None:
        at = jnp.zeros(3, vertices.dtype)
    if up is None:
        up = jnp.asarray([0.0, 1.0, 0.0], vertices.dtype)
    at = jnp.broadcast_to(jnp.atleast_2d(at), (B, 3))
    up = jnp.broadcast_to(jnp.atleast_2d(up), (B, 3))
    eye = jnp.broadcast_to(eye, (B, 3))

    z_axis = _normalize(at - eye)
    R = _camera_rotation(z_axis, up)
    return jnp.einsum("bvj,bij->bvi", vertices - eye[:, None], R)


def look(vertices, eye, direction=None, up=None):
    """Camera at ``eye`` looking along ``direction``
    (reference: softrenderer.py:540-600)."""
    vertices = jnp.asarray(vertices)
    B = vertices.shape[0]
    eye = jnp.broadcast_to(jnp.atleast_2d(eye), (B, 3))
    if direction is None:
        direction = jnp.asarray([0.0, 1.0, 0.0], vertices.dtype)
    if up is None:
        up = jnp.asarray([0.0, 1.0, 0.0], vertices.dtype)
    direction = jnp.broadcast_to(jnp.atleast_2d(direction), (B, 3))
    up = jnp.broadcast_to(jnp.atleast_2d(up), (B, 3))

    z_axis = _normalize(direction)
    R = _camera_rotation(z_axis, up)
    return jnp.einsum("bvj,bij->bvi", vertices - eye[:, None], R)


def perspective_distortion(vertices, angle: float = 30.0):
    """Divide (x, y) by z*tan(angle) (reference: softrenderer.py:602-623)."""
    width = math.tan(angle / 180.0 * math.pi)
    z = vertices[..., 2:3]
    xy = vertices[..., :2] / (z * width)
    return jnp.concatenate([xy, z], axis=-1)


def vertices_to_faces(vertices, faces):
    """Gather per-face vertex triplets: [B,V,3],[B,F,3] -> [B,F,3,3]
    (reference: softrenderer.py:625-645)."""
    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces).astype(jnp.int32)
    return jnp.stack(
        [
            jnp.take_along_axis(
                vertices, jnp.repeat(faces[..., k : k + 1], 3, axis=-1), axis=1
            )
            for k in range(3)
        ],
        axis=2,
    )


def eye_from_angles(distance, elevation, azimuth, degrees=True):
    """Spherical camera placement (reference: softrenderer.py:665-700)."""
    if degrees:
        elevation = math.radians(elevation)
        azimuth = math.radians(azimuth)
    return jnp.asarray(
        [
            distance * math.cos(elevation) * math.sin(azimuth),
            distance * math.sin(elevation),
            -distance * math.cos(elevation) * math.cos(azimuth),
        ]
    )
