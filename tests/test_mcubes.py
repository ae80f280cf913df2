"""Classic 256-case marching cubes (render/mcubes.py) — the reference's
PyMCubes role (src/LBM/utils/io.py:59-61), round-4 verdict #5.

The table is generated at import from face-consistent marching-squares
rules; these tests verify the two properties that table transcription
errors would break: watertightness on closed surfaces (every undirected
edge shared by exactly two faces, traversed in opposite directions — a
single wrong table entry fails this) and geometric agreement with both
the analytic surface and the marching-tetrahedra mesh, under the existing
Hausdorff bounds of tests/test_render.py::TestIsosurfaceGeometry.
"""

from collections import Counter

import numpy as np
import pytest

from lbm_ferrofluid_tpu.render.mcubes import (
    MC_TRI_TABLE,
    marching_cubes_classic,
)


def _sphere(n=28, r=0.35, blob=False, seed=0):
    ax = (np.arange(n) + 0.5) / n - 0.5
    Z, Y, X = np.meshgrid(ax, ax, ax, indexing="ij")
    phi = np.sqrt(X**2 + Y**2 + Z**2) - r
    if blob:
        rng = np.random.default_rng(seed)
        phi = phi + 0.02 * rng.normal(size=phi.shape)
    return phi, 1.0 / n


def _watertight(faces):
    d = Counter()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            d[e] += 1
    return all(
        cnt == 1 and d.get((e[1], e[0]), 0) == 1 for e, cnt in d.items()
    )


def test_table_shape_and_complement_symmetry():
    assert MC_TRI_TABLE.shape[0] == 256 and MC_TRI_TABLE.shape[2] == 3
    assert (MC_TRI_TABLE[0] == -1).all() and (MC_TRI_TABLE[255] == -1).all()
    # a case and its complement cross the same cube edges (the centroid
    # ids >= 12 and triangle counts can differ only in the ambiguous
    # configurations' topology choice)
    for c in range(256):
        def edges(cc):
            t = MC_TRI_TABLE[cc][MC_TRI_TABLE[cc, :, 0] >= 0].ravel()
            return set(int(e) for e in t if e < 12)
        assert edges(c) == edges(255 - c), c


@pytest.mark.parametrize("blob", [False, True])
def test_watertight_closed_surface(blob):
    phi, _ = _sphere(blob=blob)
    v, f = marching_cubes_classic(phi, 0.0)
    assert len(f) > 100
    assert _watertight(f), "unmatched mesh edges: table/topology error"


def test_hausdorff_sphere_and_vs_mt():
    """Same bounds as test_render.py::TestIsosurfaceGeometry; MC
    cube-edge vertices coincide with MT's cube-edge vertex subset
    (identical interpolation arithmetic) while polygon centroids sit
    within their cell — nearest-MT-vertex distance bounded by the cell
    diagonal."""
    from lbm_ferrofluid_tpu.render.mesh import marching_tetrahedra

    phi, hcell = _sphere()
    n = 28
    v, f = marching_cubes_classic(phi, 0.0)
    vv = (v + 0.5) / n - 0.5
    d = np.abs(np.linalg.norm(vv, axis=1) - 0.35)
    assert d.max() <= np.sqrt(3) * hcell

    v2, _ = marching_tetrahedra(phi, 0.0)
    v2 = (np.asarray(v2) + 0.5) / n - 0.5
    dmin = np.array(
        [np.linalg.norm(v2 - p, axis=1).min() for p in vv[::5]]
    )
    assert dmin.max() <= np.sqrt(3) * hcell
    # a large fraction ARE exact cube-edge crossings shared with MT
    assert (dmin < 1e-6).mean() > 0.5


def test_marching_cubes_alias_is_mc():
    """render.marching_cubes (the mcubes.marching_cubes API twin) now IS
    classic MC, not the MT alias it was through round 4."""
    from lbm_ferrofluid_tpu.render import marching_cubes

    phi, _ = _sphere()
    v, f = marching_cubes(phi, 0.0)
    v2, f2 = marching_cubes_classic(phi, 0.0)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(f, f2)


def test_phi_to_mesh_method_mc():
    from lbm_ferrofluid_tpu.render import phi_to_mesh

    phi3, _ = _sphere(n=16)
    phi = np.tanh(-phi3 * 8)[None, None].astype(np.float32)
    v_mt, f_mt = phi_to_mesh(phi, (16, 16, 16))
    v_mc, f_mc = phi_to_mesh(phi, (16, 16, 16), method="mc")
    assert len(f_mc) > 0 and len(f_mt) > 0
    assert len(f_mc) < len(f_mt)  # MC triangulates the same surface coarser
    assert _watertight(f_mc)
