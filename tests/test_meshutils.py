"""DIB-R mesh/transform utility tests."""

import numpy as np

from lbm_ferrofluid_tpu.render.meshutils import (
    compose_transforms_3d,
    compute_camera_params,
    face2edge,
    get_spherical_coords_x,
    homogenize_points,
    invert_rigid_transform_3d,
    load_obj,
    mesh_resample,
    rotx,
    roty,
    rotz,
    save_mesh,
    transform3d,
    unhomogenize_points,
)


def test_obj_roundtrip(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]])
    p = tmp_path / "m.obj"
    save_mesh(verts, faces, str(p))
    v2, f2 = load_obj(str(p))
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_rotations_orthonormal():
    for rot in (rotx, roty, rotz):
        R = rot(0.7)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    np.testing.assert_allclose(rotz(90, enc="deg") @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_transform_invert():
    T = np.eye(4)
    T[:3, :3] = rotz(0.3) @ roty(0.5)
    T[:3, 3] = [1, 2, 3]
    pts = np.random.default_rng(0).normal(size=(10, 3))
    back = transform3d(transform3d(pts, T), invert_rigid_transform_3d(T))
    np.testing.assert_allclose(back, pts, atol=1e-12)
    comp = compose_transforms_3d([T, invert_rigid_transform_3d(T)])
    np.testing.assert_allclose(comp, np.eye(4), atol=1e-12)


def test_homogenize_roundtrip():
    pts = np.random.default_rng(1).normal(size=(5, 3))
    np.testing.assert_allclose(unhomogenize_points(homogenize_points(pts)), pts)


def test_face2edge_tetrahedron():
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    edges = face2edge(faces)
    assert len(edges) == 6  # complete graph K4


def test_mesh_resample_quadruples_faces():
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]])
    v2, f2 = mesh_resample(verts, faces)
    assert len(f2) == 4
    assert len(v2) == 6


def test_camera_params_distance():
    rot, pos = compute_camera_params(30.0, 20.0, 2.5)
    np.testing.assert_allclose(np.linalg.norm(pos), 2.5, rtol=1e-6)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)


def test_spherical_coords_in_range():
    X = np.random.default_rng(2).normal(size=(50, 3))
    uv = get_spherical_coords_x(X)
    assert uv.min() >= -1 and uv.max() <= 1
