"""DIB-R renderer tests: vertex shader, rasterizer, fragment shaders."""

import math

import jax.numpy as jnp
import numpy as np

from lbm_ferrofluid_tpu.render.dibr import (
    Renderer,
    VCRender,
    linear_rasterize,
    lookat_camera,
    perspective_proj_matrix,
    perspective_projection,
    tex_interpolation,
)


def _camera(eye=(0, 0, 4.0)):
    rot, pos = lookat_camera(eye, (0, 0, 0), (0, 1, 0))
    proj = perspective_proj_matrix(math.radians(45.0))
    return (
        jnp.asarray(rot)[None],
        jnp.asarray(pos)[None],
        jnp.asarray(proj),
    )


def _triangle():
    # triangle centered at the origin facing the camera on +z
    pts = jnp.asarray(
        [[[-0.7, -0.5, 0.0], [0.7, -0.5, 0.0], [0.0, 0.8, 0.0]]], jnp.float32
    )
    faces = np.asarray([[0, 1, 2]])
    return pts, faces


class TestVertexShader:
    def test_projection_centers(self):
        pts, faces = _triangle()
        cams = _camera()
        p3, p2, normal = perspective_projection(pts, faces, cams)
        assert p3.shape == (1, 1, 3, 3)
        assert p2.shape == (1, 1, 3, 2)
        # triangle centroid is at the optical axis -> mean 2D approx 0
        c2 = np.asarray(p2).mean(axis=2)
        np.testing.assert_allclose(c2, 0.0, atol=0.05)

    def test_normal_faces_camera(self):
        pts, faces = _triangle()
        p3, p2, normal = perspective_projection(pts, faces, _camera())
        # winding chosen so normal z > 0 (front) in camera frame
        assert float(normal[0, 0, 2]) != 0.0


class TestRasterizer:
    def test_vertex_color_render(self):
        pts, faces = _triangle()
        colors = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]], jnp.float32)
        vc = VCRender(64, 64)
        p3, p2, normal = perspective_projection(pts, faces, _camera())
        normalz = normal[..., 2:3]
        # orient front if needed
        if float(normalz[0, 0, 0]) < 0:
            faces = faces[:, ::-1]
            p3, p2, normal = perspective_projection(pts, faces, _camera())
            normalz = normal[..., 2:3]
        img, improb, n1 = vc.forward((pts, faces), _camera(), colors)
        img = np.asarray(img)
        improb = np.asarray(improb)
        assert img.shape == (1, 64, 64, 3)
        # center pixel covered with mixed color ~ barycentric mean
        center = img[0, 32, 32]
        assert center.sum() > 0.5
        assert improb[0, 32, 32, 0] == 1.0
        # corner uncovered: near-zero color, small prob
        assert img[0, 0, 0].sum() < 1e-6
        assert improb[0, 0, 0, 0] < 0.5

    def test_prob_map_decays_with_distance(self):
        pts, faces = _triangle()
        colors = jnp.ones((1, 3, 3), jnp.float32)
        img, improb, _ = VCRender(64, 64).forward((pts, faces), _camera(), colors)
        improb = np.asarray(improb)[0, :, :, 0]
        covered = improb == 1.0
        assert covered.any()
        # silhouette prob just outside the triangle is higher than far away
        assert improb[0, 0] < 0.1

    def test_zbuffer_picks_nearer_face(self):
        # two stacked faces; the one closer to the camera (larger camera z
        # in DIB-R's convention) must win
        pts = jnp.asarray(
            [
                [
                    [-0.9, -0.9, 0.0], [0.9, -0.9, 0.0], [0.0, 0.9, 0.0],  # far
                    [-0.9, -0.9, 1.0], [0.9, -0.9, 1.0], [0.0, 0.9, 1.0],  # near
                ]
            ],
            jnp.float32,
        )
        faces = np.asarray([[0, 1, 2], [3, 4, 5]])
        colors = jnp.asarray(
            [[[1, 0, 0]] * 3 + [[0, 1, 0]] * 3], jnp.float32
        )
        img, improb, _ = VCRender(32, 32).forward((pts, faces), _camera(), colors)
        center = np.asarray(img)[0, 16, 16]
        # camera at z=4 looking at origin: face at z=1 is nearer
        assert center[1] > 0.9 and center[0] < 0.1


class TestKnum:
    """Reference knum semantics (rasterizer_cuda.cu:224-322): the
    silhouette probability product uses only the FIRST knum
    expanded-bbox candidate faces per pixel, in face-index order."""

    @staticmethod
    def _row_scene(F=8):
        # F small triangles in a horizontal row right of center; the
        # probe pixel (left edge, mid height) is covered by none, but a
        # large expand makes every face a bbox candidate there
        tris = []
        for i in range(F):
            x = 0.1 + 0.08 * i
            tris.append([[x, -0.05, 0.0], [x + 0.06, -0.05, 0.0],
                         [x + 0.03, 0.05, 0.0]])
        p2 = jnp.asarray(tris, jnp.float32)[None][..., :2]  # [1,F,3,2]
        p3 = jnp.concatenate(
            [p2, jnp.ones((1, F, 3, 1), jnp.float32)], axis=-1
        )
        normalz = jnp.ones((1, F, 1), jnp.float32)
        feats = jnp.ones((1, F, 3, 3), jnp.float32)
        return p3, p2, normalz, feats

    def test_first_knum_candidates_in_face_order(self):
        F, k = 8, 3
        p3, p2, nz, ft = self._row_scene(F)
        # expand: every face is a bbox candidate at every pixel; soft
        # sigmainv keeps far faces' probs well above underflow so the
        # cap visibly binds
        kw = dict(expand=4.0, face_chunk=2, sigmainv=5.0)
        _, improb_k = linear_rasterize(16, 16, p3, p2, nz, ft, knum=k, **kw)
        # truncating the face list to the first k gives the same improb
        # at any uncovered pixel (same first-k candidates there)
        _, improb_trunc = linear_rasterize(
            16, 16, p3[:, :k], p2[:, :k], nz[:, :k], ft[:, :k],
            knum=None, **kw,
        )
        probe = (0, 8, 0, 0)  # left edge, mid height: uncovered
        assert float(improb_k[probe]) > 0.0
        np.testing.assert_allclose(
            float(improb_k[probe]), float(improb_trunc[probe]), rtol=1e-6
        )
        # the cap is binding: using all faces changes the probe value
        _, improb_all = linear_rasterize(
            16, 16, p3, p2, nz, ft, knum=None, **kw
        )
        assert float(improb_all[probe]) > float(improb_k[probe])

    def test_knum_geq_faces_matches_dense(self):
        p3, p2, nz, ft = self._row_scene(6)
        kw = dict(expand=4.0, face_chunk=4)
        _, a = linear_rasterize(16, 16, p3, p2, nz, ft, knum=6, **kw)
        _, b = linear_rasterize(16, 16, p3, p2, nz, ft, knum=None, **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestTexture:
    def test_tex_interpolation_nearest(self):
        # 2x2 texture with distinct corners
        tex = jnp.zeros((1, 3, 2, 2), jnp.float32)
        tex = tex.at[0, 0, 0, 0].set(1.0)  # top row (v=1) left
        uv = jnp.asarray([[[[0.25, 0.75]]]], jnp.float32)  # u=0.25, v=0.75 -> top-left
        out = np.asarray(tex_interpolation(uv, tex, "nearest"))
        np.testing.assert_allclose(out[0, 0, 0], [1, 0, 0], atol=1e-6)

    def test_renderer_modes_construct(self):
        for mode in ["VertexColor", "Lambertian", "SphericalHarmonics", "Phong"]:
            Renderer(16, 16, mode=mode)
