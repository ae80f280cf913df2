"""DIB-R differentiable renderer (Chen et al. 2019) in pure JAX.

TPU-native port of the reference's dormant second render stack
(renderutils/dibr/): MVP vertex shader -> z-buffered linear rasterizer with
a soft silhouette probability map -> fragment shaders (vertex-color,
texture, spherical-harmonics, Phong).

The CUDA kernels (dibr/cuda/rasterizer_cuda.cu:30-330) become chunked
``lax.scan`` passes over faces, exactly like the SoftRas port; the z-buffer
is a running argmax over interpolated depth, and the probability map the
product 1 - prod(1 - exp(-sigmainv d^2)) over nearby faces.  The CUDA
caps that product at the FIRST ``knum=30`` candidate faces per pixel in
face-index order (:224-322, ``kid`` increments per expanded-bbox hit and
breaks at knum) — reproduced exactly via a per-pixel candidate counter
carried through the face scan (round 4; previously a documented
knum -> inf deviation).  ``knum=None`` selects the dense all-faces limit,
which only increases silhouette accuracy.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "perspective_projection",
    "linear_rasterize",
    "tex_interpolation",
    "fragment_tex",
    "fragment_sh",
    "fragment_phong",
    "VCRender",
    "TexRender",
    "SHRender",
    "PhongRender",
    "Renderer",
    "perspective_proj_matrix",
    "lookat_camera",
]

_EPS = 1e-10


# ----------------------------------------------------------------------
# vertex shader (dibr/renderer/vertex_shaders/perpsective.py:26-63)
# ----------------------------------------------------------------------
def perspective_projection(points, faces, cameras):
    """MVP transform + per-face gather.

    Args:
        points: ``[B, P, 3]`` vertices.
        faces: ``[F, 3]`` int indices.
        cameras: (rot ``[B,3,3]``, pos ``[B,3]``, proj ``[3, 1]`` or [B,3,1]).

    Returns:
        (points3d ``[B,F,3,3]`` camera-frame, points2d ``[B,F,3,2]``
        projected, normals ``[B,F,3]`` unnormalized camera-frame).
    """
    rot, pos, proj = cameras
    # reference: matmul(points - pos, rot.permute(0, 2, 1)) = (points-pos) @ rot^T
    pts = (points - pos[:, None]) @ jnp.swapaxes(rot, 1, 2)

    proj = jnp.reshape(proj, (-1, 1, 3))
    xyz = pts * proj
    xy = xyz[..., :2] / xyz[..., 2:3]

    faces = jnp.asarray(faces, jnp.int32)
    p3 = jnp.stack([pts[:, faces[:, k]] for k in range(3)], axis=2)  # [B,F,3,3]
    p2 = jnp.stack([xy[:, faces[:, k]] for k in range(3)], axis=2)  # [B,F,3,2]

    v01 = p3[:, :, 1] - p3[:, :, 0]
    v02 = p3[:, :, 2] - p3[:, :, 0]
    normal = jnp.cross(v01, v02)
    return p3, p2, normal


# ----------------------------------------------------------------------
# rasterizer (dibr/cuda/rasterizer_cuda.cu:30-167 + prob :169-330)
# ----------------------------------------------------------------------
def linear_rasterize(
    height: int,
    width: int,
    points3d,
    points2d,
    normalz,
    features,
    *,
    expand: float = 0.02,
    multiplier: float = 1000.0,
    sigmainv: float = 7000.0,
    face_chunk: int = 64,
    knum: int | None = 30,
):
    """Z-buffer rasterization with interpolated features + soft silhouette.

    Args:
        points3d: ``[B, F, 3, 3]`` camera-frame face vertices.
        points2d: ``[B, F, 3, 2]`` projected (pre-multiplier) coordinates.
        normalz: ``[B, F, 1]`` face-normal z (front if > 0).
        features: ``[B, F, 3, D]`` per-corner attributes to interpolate.
        knum: cap the silhouette probability product at the FIRST knum
            candidate faces per pixel in face-index order (the CUDA
            reference's semantics and default, rasterizer_cuda.cu:319);
            ``None`` uses all faces (the knum -> inf limit).

    Returns:
        (imfeat ``[B, H, W, D]``, improb ``[B, H, W, 1]``)
    """
    B, F = points2d.shape[:2]
    D = features.shape[-1]
    dtype = points2d.dtype

    p2m = multiplier * points2d  # [B,F,3,2]
    bb_min = jnp.min(p2m, axis=2)
    bb_max = jnp.max(p2m, axis=2)
    bb2_min = bb_min - expand * multiplier
    bb2_max = bb_max + expand * multiplier

    # pixel grid (kernel :61-63)
    wi = jnp.arange(width, dtype=dtype)
    hi = jnp.arange(height, dtype=dtype)
    x0 = multiplier / width * (2.0 * wi + 1.0 - width)  # [W]
    y0 = multiplier / height * (height - 2.0 * hi - 1.0)  # [H]
    X0 = jnp.broadcast_to(x0[None, :], (height, width))
    Y0 = jnp.broadcast_to(y0[:, None], (height, width))

    front = normalz[..., 0] > 0  # [B, F]

    n_chunks = -(-F // face_chunk)
    Fp = n_chunks * face_chunk

    def pad(x, fill=0.0):
        return jnp.pad(
            x, [(0, 0), (0, Fp - F)] + [(0, 0)] * (x.ndim - 2), constant_values=fill
        )

    def chunked(x):
        return x.reshape(B, n_chunks, face_chunk, *x.shape[2:]).swapaxes(0, 1)

    p2c = chunked(pad(p2m))
    p3c = chunked(pad(points3d))
    fc = chunked(pad(features))
    bbminc = chunked(pad(bb_min))
    bbmaxc = chunked(pad(bb_max))
    bb2minc = chunked(pad(bb2_min, fill=1e9))
    bb2maxc = chunked(pad(bb2_max, fill=-1e9))
    frontc = chunked(pad(front, fill=False))

    init_feat = jnp.zeros((B, height, width, D), dtype)
    init_dep = jnp.full((B, height, width), -1e9, dtype)
    init_unprob = jnp.ones((B, height, width), dtype)  # prod(1 - p)
    init_count = jnp.zeros((B, height, width), jnp.int32)  # knum candidates

    def step(carry, blk):
        feat, dep, unprob, count = carry
        p2b, p3b, fb, bminb, bmaxb, b2minb, b2maxb, frontb = blk

        x = X0[None, None]
        y = Y0[None, None]
        inb = (
            (x >= bminb[..., 0][..., None, None])
            & (x < bmaxb[..., 0][..., None, None])
            & (y >= bminb[..., 1][..., None, None])
            & (y < bmaxb[..., 1][..., None, None])
        )  # [B,C,H,W]

        ax, ay = p2b[..., 0, 0], p2b[..., 0, 1]
        bx, by = p2b[..., 1, 0], p2b[..., 1, 1]
        cx, cy = p2b[..., 2, 0], p2b[..., 2, 1]
        m = (bx - ax)[..., None, None]
        p = (by - ay)[..., None, None]
        n = (cx - ax)[..., None, None]
        q = (cy - ay)[..., None, None]
        s = x - ax[..., None, None]
        t = y - ay[..., None, None]
        k1 = s * q - n * t
        k2 = m * t - s * p
        k3 = m * q - n * p
        w1 = k1 / (k3 + _EPS)
        w2 = k2 / (k3 + _EPS)
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

        z0 = (
            w0 * p3b[..., 0, 2][..., None, None]
            + w1 * p3b[..., 1, 2][..., None, None]
            + w2 * p3b[..., 2, 2][..., None, None]
        )
        ok = inb & inside & frontb[..., None, None]
        z0 = jnp.where(ok, z0, -jnp.inf)

        blk_best = jnp.argmax(z0, axis=1)  # [B,H,W]
        blk_z = jnp.max(z0, axis=1)

        # interpolate the winning face's features: select via one-hot so the
        # whole thing is one dense contraction (no gathers)
        onehot = jax.nn.one_hot(blk_best, p2b.shape[1], dtype=dtype, axis=1)
        interp = sum(
            jnp.einsum(
                "bchw,bcd->bhwd",
                onehot * jnp.where(jnp.isfinite(w_k) & ok, w_k, 0.0),
                fb[..., k, :],
            )
            for k, w_k in enumerate((w0, w1, w2))
        )

        better = blk_z > dep
        dep = jnp.where(better, blk_z, dep)
        feat = jnp.where(better[..., None], interp, feat)

        # ---------------- probability map (kernel :169-330) ------------
        in2 = (
            (x >= b2minb[..., 0][..., None, None])
            & (x < b2maxb[..., 0][..., None, None])
            & (y >= b2minb[..., 1][..., None, None])
            & (y < b2maxb[..., 1][..., None, None])
        )
        # min over 3 edge distances (perpendicular, if the foot is inside
        # the segment) and 3 vertex distances
        big = 4.0 * multiplier * multiplier
        dis2 = jnp.full(k1.shape, big, dtype)
        for i in range(3):
            x1 = p2b[..., i, 0][..., None, None]
            y1 = p2b[..., i, 1][..., None, None]
            x2 = p2b[..., (i + 1) % 3, 0][..., None, None]
            y2 = p2b[..., (i + 1) % 3, 1][..., None, None]
            A = y2 - y1
            Bc = x1 - x2
            C = x2 * y1 - x1 * y2
            up = A * x + Bc * y + C
            down = A * A + Bc * Bc
            x3 = (Bc * Bc * x - A * Bc * y - A * C) / (down + _EPS)
            y3 = (A * A * y - A * Bc * x - Bc * C) / (down + _EPS)
            direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
            pd = jnp.where(direct > 0, big, up * up / (down + _EPS))
            dis2 = jnp.minimum(dis2, pd)
            vd = (x - x1) ** 2 + (y - y1) ** 2
            dis2 = jnp.minimum(dis2, vd)
        prob = jnp.exp(-sigmainv * dis2 / (multiplier * multiplier))
        prob = jnp.where(in2, prob, 0.0)
        if knum is not None:
            # reference semantics (rasterizer_cuda.cu:224-322): only the
            # FIRST knum expanded-bbox candidates per pixel, in
            # face-index order, contribute — kid increments per hit and
            # the loop breaks at knum.  prior = exclusive running count
            # of candidates before each face in the global face order.
            cand = in2.astype(jnp.int32)
            # explicit int32 dtype: cumsum/sum otherwise promote to int64
            # under x64, breaking the scan carry type
            prior = (
                count[:, None]
                + jnp.cumsum(cand, axis=1, dtype=jnp.int32) - cand
            )
            prob = jnp.where(prior < knum, prob, 0.0)
            count = count + jnp.sum(cand, axis=1, dtype=jnp.int32)
        unprob = unprob * jnp.prod(1.0 - prob, axis=1)

        return (feat, dep, unprob, count), None

    (feat, dep, unprob, _), _ = jax.lax.scan(
        step,
        (init_feat, init_dep, init_unprob, init_count),
        (p2c, p3c, fc, bbminc, bbmaxc, bb2minc, bb2maxc, frontc),
    )

    covered = dep > -1e8
    improb = jnp.where(covered, 1.0, 1.0 - unprob)[..., None]
    return feat, improb


# ----------------------------------------------------------------------
# fragment shaders
# ----------------------------------------------------------------------
def tex_interpolation(imtexcoord, texture, filtering: str = "nearest"):
    """OpenGL-convention texture sampling (dibr fragment_shaders/
    interpolation.py:26-50): uv in [0,1] with wrap, y bottom-up."""
    uv = jnp.remainder(imtexcoord, 1.0)
    tex = jnp.moveaxis(texture, 1, -1)  # [B, th, tw, 3]
    B, th, tw, C = tex.shape
    u = uv[..., 0] * tw - 0.5
    v = (1.0 - uv[..., 1]) * th - 0.5
    if filtering == "nearest":
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, tw - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, th - 1)
        return tex[jnp.arange(B)[:, None, None], vi, ui]
    # bilinear
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, tw - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, th - 1)
    u1 = jnp.clip(u0 + 1, 0, tw - 1)
    v1 = jnp.clip(v0 + 1, 0, th - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    b = jnp.arange(B)[:, None, None]
    c00 = tex[b, v0, u0]
    c01 = tex[b, v0, u1]
    c10 = tex[b, v1, u0]
    c11 = tex[b, v1, u1]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
    )


def fragment_tex(imtexcoord, texture, improb, filtering="nearest"):
    """frag_tex.py:30-44."""
    color = tex_interpolation(imtexcoord, texture, filtering) * improb
    return jnp.clip(color, 0.0, 1.0)


def fragment_sh(imnormal, lightparam, imtexcoord, texture, improb):
    """2nd-order spherical harmonics shading (frag_shtex.py:29-66)."""
    x = imnormal[..., 0:1]
    y = imnormal[..., 1:2]
    z = imnormal[..., 2:3]
    bands = jnp.concatenate(
        [
            0.2820948 * jnp.ones_like(x),
            -0.3257350 * y,
            0.3257350 * z,
            -0.3257350 * x,
            0.2731371 * (x * y),
            -0.2731371 * (y * z),
            0.1365686 * (z * z) - 0.0788479,
            -0.1931371 * (x * z),
            0.1365686 * (x * x - y * y),
        ],
        axis=-1,
    )
    coef = jnp.sum(bands * lightparam.reshape(-1, 1, 1, 9), axis=-1, keepdims=True)
    color = coef * tex_interpolation(imtexcoord, texture) * improb
    return jnp.clip(color, 0.0, 1.0)


def fragment_phong(
    imnormal, lightdirect, eyedirect, material, shininess, imtexcoord, texture, improb
):
    """Blinn-Phong with parallel light (frag_phongtex.py:31-90)."""
    light = lightdirect.reshape(-1, 1, 1, 3)
    cos_t = jnp.clip(jnp.sum(imnormal * light, -1, keepdims=True), 0.0, 1.0)
    reflect = -light + 2.0 * cos_t * imnormal
    cos_a = jnp.clip(jnp.sum(reflect * eyedirect, -1, keepdims=True), 1e-5, 1.0)
    cos_a = cos_a ** shininess.reshape(-1, 1, 1, 1)
    amb = material[:, 0:1, :].reshape(-1, 1, 1, 3)
    dif = material[:, 1:2, :].reshape(-1, 1, 1, 3) * cos_t
    spe = material[:, 2:3, :].reshape(-1, 1, 1, 3) * cos_a
    color = (amb + dif) * tex_interpolation(imtexcoord, texture) + spe
    return jnp.clip(color * improb, 0.0, 1.0)


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-10)


# ----------------------------------------------------------------------
# renderer modes (dibr/renderer/{vc,tex,sh,phong}render.py)
# ----------------------------------------------------------------------
class VCRender:
    """Vertex-color mode (vcrender.py:32-81)."""

    def __init__(self, height, width):
        self.height = height
        self.width = width

    def forward(self, points, cameras, colors):
        pts, faces = points
        p3, p2, normal = perspective_projection(pts, faces, cameras)
        normalz = normal[..., 2:3]
        normal1 = _normalize(normal)
        faces = jnp.asarray(faces, jnp.int32)
        c = jnp.stack([colors[:, faces[:, k]] for k in range(3)], axis=2)  # [B,F,3,3]
        mask = jnp.ones_like(c[..., :1])
        feat = jnp.concatenate([c, mask], axis=-1)  # [B,F,3,4]
        imfeat, improb = linear_rasterize(
            self.height, self.width, p3, p2, normalz, feat
        )
        return imfeat[..., :3], improb, normal1

    __call__ = forward


class TexRender:
    """UV-texture mode (texrender.py)."""

    def __init__(self, height, width, filtering="nearest"):
        self.height = height
        self.width = width
        self.filtering = filtering

    def forward(self, points, cameras, uv_bxpx2, texture_bx3xthxtw):
        pts, faces = points
        p3, p2, normal = perspective_projection(pts, faces, cameras)
        normalz = normal[..., 2:3]
        normal1 = _normalize(normal)
        faces = jnp.asarray(faces, jnp.int32)
        uv = jnp.stack([uv_bxpx2[:, faces[:, k]] for k in range(3)], axis=2)
        mask = jnp.ones_like(uv[..., :1])
        feat = jnp.concatenate([uv, mask], axis=-1)  # [B,F,3,3]
        imfeat, improb = linear_rasterize(
            self.height, self.width, p3, p2, normalz, feat
        )
        imtexcoord = imfeat[..., :2]
        hardmask = imfeat[..., 2:3]
        color = fragment_tex(
            imtexcoord, texture_bx3xthxtw, improb * hardmask, self.filtering
        )
        return color, improb, normal1

    __call__ = forward


class SHRender:
    """Spherical-harmonics mode (shrender.py)."""

    def __init__(self, height, width):
        self.height = height
        self.width = width

    def forward(self, points, cameras, uv_bxpx2, texture_bx3xthxtw, lightparam_bx9):
        pts, faces = points
        p3, p2, normal = perspective_projection(pts, faces, cameras)
        normalz = normal[..., 2:3]
        normal1 = _normalize(normal)
        faces = jnp.asarray(faces, jnp.int32)
        uv = jnp.stack([uv_bxpx2[:, faces[:, k]] for k in range(3)], axis=2)
        n3 = jnp.broadcast_to(normal1[:, :, None, :], p3.shape)
        feat = jnp.concatenate([uv, n3], axis=-1)  # [B,F,3,5]
        imfeat, improb = linear_rasterize(
            self.height, self.width, p3, p2, normalz, feat
        )
        imtexcoord = imfeat[..., :2]
        imnormal = _normalize(imfeat[..., 2:5])
        color = fragment_sh(
            imnormal, lightparam_bx9, imtexcoord, texture_bx3xthxtw, improb
        )
        return color, improb, normal1

    __call__ = forward


class PhongRender:
    """Phong mode (phongrender.py)."""

    def __init__(self, height, width):
        self.height = height
        self.width = width

    def forward(
        self, points, cameras, uv_bxpx2, texture_bx3xthxtw,
        lightdirect_bx3, material_bx3x3, shininess_bx1,
    ):
        pts, faces = points
        p3, p2, normal = perspective_projection(pts, faces, cameras)
        normalz = normal[..., 2:3]
        normal1 = _normalize(normal)
        faces = jnp.asarray(faces, jnp.int32)
        uv = jnp.stack([uv_bxpx2[:, faces[:, k]] for k in range(3)], axis=2)
        n3 = jnp.broadcast_to(normal1[:, :, None, :], p3.shape)
        # eye direction from camera-frame positions (eye at origin)
        feat = jnp.concatenate([uv, n3, p3], axis=-1)  # [B,F,3,8]
        imfeat, improb = linear_rasterize(
            self.height, self.width, p3, p2, normalz, feat
        )
        imtexcoord = imfeat[..., :2]
        imnormal = _normalize(imfeat[..., 2:5])
        eyedirect = _normalize(-imfeat[..., 5:8])
        color = fragment_phong(
            imnormal, lightdirect_bx3, eyedirect, material_bx3x3,
            shininess_bx1, imtexcoord, texture_bx3xthxtw, improb,
        )
        return color, improb, normal1

    __call__ = forward


class Renderer:
    """Mode dispatcher (dibr/renderer/base.py:33-98)."""

    def __init__(self, height, width, mode="VertexColor", filtering="nearest"):
        modes = {
            "VertexColor": VCRender(height, width),
            "Lambertian": TexRender(height, width, filtering),
            "SphericalHarmonics": SHRender(height, width),
            "Phong": PhongRender(height, width),
        }
        if mode not in modes:
            raise ValueError(f"unknown render mode {mode}")
        self.mode = mode
        self._impl = modes[mode]

    def forward(self, points, cameras, *args):
        return self._impl.forward(points, cameras, *args)

    __call__ = forward


# ----------------------------------------------------------------------
# camera helpers (dibr/utils/perspective.py:31-107)
# ----------------------------------------------------------------------
def perspective_proj_matrix(fovy: float, ratio: float = 1.0):
    """Projection coefficients [3, 1], matching the reference's
    perspectiveprojectionnp (dibr/utils/perspective.py:72-90) including the
    -1 z component."""
    tanfov = np.tan(fovy / 2.0)
    return np.asarray([[1.0 / (ratio * tanfov)], [1.0 / tanfov], [-1.0]], np.float32)


def lookat_camera(eye, center, up):
    """Camera (rot [3,3], pos [3]) looking from eye at center.

    Matches the reference's camera_info convention
    (dibr/utils/perspective.py:45-58): the camera z-axis points from the
    target TOWARD the eye, so nearer points have larger camera-frame z —
    which is what the rasterizer's z-buffer keeps.
    """
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    z = eye - center
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    rot = np.stack([x, y, z], axis=0)
    return rot.astype(np.float32), eye.astype(np.float32)
