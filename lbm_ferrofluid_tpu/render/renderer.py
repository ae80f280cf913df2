"""SoftRenderer: lighting -> camera -> projection -> soft rasterization.

JAX port of the reference pipeline object (renderutils/softrenderer.py:24-700)
with the same defaults, anti-aliasing via 2x supersampling + average pooling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .camera import (
    eye_from_angles,
    look,
    look_at,
    perspective_distortion,
    vertices_to_faces,
)
from .lighting import compute_ambient_light, compute_directional_light
from .softras import soft_rasterize

__all__ = ["SoftRenderer"]


class SoftRenderer:
    def __init__(
        self,
        image_size: int = 256,
        anti_aliasing: bool = True,
        bg_color=None,
        fill_back: bool = True,
        camera_mode: str = "look_at",
        K=None,
        rmat=None,
        tvec=None,
        perspective_distort: bool = True,
        sigma_val: float = 1e-5,
        dist_func: str = "euclidean",
        dist_eps: float = 1e-4,
        gamma_val: float = 1e-4,
        aggr_func_rgb: str = "softmax",
        aggr_func_alpha: str = "prod",
        texture_type: str = "surface",
        viewing_angle: float = 30.0,
        eye=None,
        camera_direction=None,
        near: float = 1.0,
        far: float = 100.0,
        light_intensity_ambient: float = 0.5,
        light_intensity_directional: float = 0.5,
        light_color_ambient=None,
        light_color_directional=None,
        light_direction=None,
        device=None,  # accepted for API parity; unused under JAX
    ):
        self.image_size = image_size
        self.anti_aliasing = anti_aliasing
        self.bg_color = (
            jnp.zeros(3, jnp.float32) if bg_color is None else jnp.asarray(bg_color)
        )
        self.fill_back = fill_back
        self.camera_mode = camera_mode
        # 'projection' mode: intrinsics K (4x4, last row/col from identity),
        # rotation rmat (4x4 convention like the reference) and translation
        # tvec.  The reference's projection branch references undefined
        # variables (softrenderer.py:383-389, a dead branch); here it works.
        self.K = None if K is None else jnp.asarray(K)
        self.rmat = None if rmat is None else jnp.asarray(rmat)
        if tvec is None and camera_mode == "projection":
            tvec = jnp.zeros(3).at[2].set(-5.0)
        self.tvec = None if tvec is None else jnp.asarray(tvec)
        self.perspective_distort = perspective_distort
        self.viewing_angle = viewing_angle
        if eye is None:
            eye = jnp.asarray(
                [0.0, 0.0, -(1.0 / math.tan(math.radians(viewing_angle)) + 1.0)]
            )
        self.eye = jnp.asarray(eye)
        self.camera_direction = (
            jnp.asarray([0.0, 0.0, 1.0])
            if camera_direction is None
            else jnp.asarray(camera_direction)
        )
        self.near = near
        self.far = far
        self.sigma_val = sigma_val
        self.dist_func = dist_func
        self.dist_eps = dist_eps
        self.gamma_val = gamma_val
        self.aggr_func_rgb = aggr_func_rgb
        self.aggr_func_alpha = aggr_func_alpha
        self.texture_type = texture_type
        self.light_intensity_ambient = light_intensity_ambient
        self.light_intensity_directional = light_intensity_directional
        self.light_color_ambient = (
            jnp.ones(3) if light_color_ambient is None else jnp.asarray(light_color_ambient)
        )
        self.light_color_directional = (
            jnp.ones(3)
            if light_color_directional is None
            else jnp.asarray(light_color_directional)
        )
        self.light_direction = (
            jnp.asarray([0.0, 1.0, 0.0])
            if light_direction is None
            else jnp.asarray(light_direction)
        )
        self.rasterizer_eps = 1e-3

    # ------------------------------------------------------------------
    def forward(self, vertices, faces, textures=None, mode=None):
        return self.render(vertices, faces, textures, mode)

    __call__ = forward

    def render(self, vertices, faces, textures=None, mode=None):
        if mode not in ["depth", "silhouette"]:
            textures = self.lighting(vertices, faces, textures)
        vertices = self.transform_to_camera_frame(vertices)
        vertices = self.project_to_image(vertices)
        return self.rasterize(vertices, faces, textures)

    def lighting(self, vertices, faces, textures):
        faces_lighting = vertices_to_faces(vertices, faces)
        ambient = compute_ambient_light(
            faces_lighting, textures,
            self.light_intensity_ambient, self.light_color_ambient,
        )
        directional = compute_directional_light(
            faces_lighting, textures,
            self.light_intensity_directional, self.light_color_directional,
            self.light_direction,
        )
        return (ambient + directional) * textures

    def transform_to_camera_frame(self, vertices):
        if self.camera_mode == "look_at":
            return look_at(vertices, self.eye)
        if self.camera_mode == "look":
            return look(vertices, self.eye, self.camera_direction)
        if self.camera_mode == "projection":
            # X_cam = R^T (X - t), the projective-geometry convention the
            # reference documents (softrenderer.py:108-115)
            R = self.rmat[..., :3, :3]
            v = vertices - self.tvec.reshape(1, 1, 3)
            return jnp.einsum("bvj,ji->bvi", v, R)
        raise NotImplementedError(f"camera_mode {self.camera_mode}")

    def project_to_image(self, vertices):
        if self.camera_mode == "projection":
            Kh = self.K[..., :3, :3]
            proj = jnp.einsum("bvj,ij->bvi", vertices, Kh)
            z = proj[..., 2:3]
            xy = proj[..., :2] / jnp.where(z == 0, 1.0, z)
            return jnp.concatenate([xy, vertices[..., 2:3]], axis=-1)
        return perspective_distortion(vertices, angle=self.viewing_angle)

    def set_eye_from_angles(self, distance, elevation, azimuth, degrees=True):
        """Spherical camera placement (reference softrenderer.py:665-700)."""
        self.eye = eye_from_angles(distance, elevation, azimuth, degrees)

    def rasterize(self, vertices, faces, textures):
        face_vertices = vertices_to_faces(vertices, faces)
        image_size = self.image_size * (2 if self.anti_aliasing else 1)
        out = soft_rasterize(
            face_vertices,
            textures,
            image_size,
            self.bg_color,
            self.near,
            self.far,
            self.fill_back,
            self.rasterizer_eps,
            self.sigma_val,
            self.dist_func,
            self.dist_eps,
            self.gamma_val,
            self.aggr_func_rgb,
            self.aggr_func_alpha,
            self.texture_type,
        )
        if self.anti_aliasing:
            B, C, S, _ = out.shape
            out = out.reshape(B, C, S // 2, 2, S // 2, 2).mean(axis=(3, 5))
        return out
