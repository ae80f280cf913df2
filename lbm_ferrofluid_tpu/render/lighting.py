"""Ambient and Lambertian directional lighting.

JAX ports of renderutils/lighting.py:19-321 — per-face light factors that
multiply into textures.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "compute_ambient_light",
    "compute_directional_light",
    "apply_ambient_light",
    "apply_directional_light",
]


def compute_ambient_light(face_vertices, textures, intensity=1.0, color=None):
    """I = I_a * K_a, constant per face -> [B, F, 1, 3]
    (reference: lighting.py:19-117)."""
    B, F = face_vertices.shape[:2]
    dtype = face_vertices.dtype
    if color is None:
        color = jnp.ones(3, dtype)
    intensity = min(max(float(intensity), 0.0), 1.0)
    light = intensity * jnp.broadcast_to(jnp.atleast_2d(color), (B, 3))[:, None]
    return jnp.broadcast_to(light, (B, F, 3))[:, :, None, :]


def compute_directional_light(
    face_vertices, textures, intensity=1.0, color=None, direction=None
):
    """Lambertian: cos = relu(n . l) per face -> [B, F, 1, 3]
    (reference: lighting.py:155-281)."""
    B, F = face_vertices.shape[:2]
    dtype = face_vertices.dtype
    if color is None:
        color = jnp.ones(3, dtype)
    if direction is None:
        direction = jnp.asarray([0.0, 1.0, 0.0], dtype)
    intensity = min(max(float(intensity), 0.0), 1.0)

    fv = face_vertices.reshape(B, F, 3, 3)
    v10 = fv[:, :, 0] - fv[:, :, 1]
    v12 = fv[:, :, 2] - fv[:, :, 1]
    n = jnp.cross(v12, v10)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)

    direction = jnp.broadcast_to(jnp.atleast_2d(direction), (B, 3))[:, None]
    cos = jnp.maximum(jnp.sum(n * direction, axis=-1), 0.0)  # [B, F]
    color = jnp.broadcast_to(jnp.atleast_2d(color), (B, 3))[:, None]
    light = intensity * color * cos[:, :, None]
    return light[:, :, None, :]


def apply_ambient_light(face_vertices, textures, intensity=1.0, color=None):
    return textures * compute_ambient_light(face_vertices, textures, intensity, color)


def apply_directional_light(
    face_vertices, textures, intensity=1.0, color=None, direction=None
):
    return textures * compute_directional_light(
        face_vertices, textures, intensity, color, direction
    )
