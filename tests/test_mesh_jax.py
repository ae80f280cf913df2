"""On-device marching tetrahedra (render/mesh_jax.py) vs the host extractor.

Round-4 verdict #4: mesh extraction was the last host round-trip in the
step->render loop.  The device extractor must emit exactly the host
extractor's triangle set (same 6-tet decomposition, same case tables, same
canonical edge-interpolation order; vertices are per-triangle instead of
deduped — the rasterizer gathers per face anyway).
"""

import numpy as np
import pytest

from lbm_ferrofluid_tpu.render.mesh import marching_tetrahedra
from lbm_ferrofluid_tpu.render.mesh_jax import (
    MT_FAR,
    marching_tetrahedra_jax,
    phi_to_mesh_jax,
)


def _canon(tris, decimals=3):
    """Order-independent canonical form of a triangle soup."""
    t = np.round(np.asarray(tris, np.float64), decimals)
    out = []
    for tri in t:
        vs = sorted(map(tuple, tri))
        out.append(tuple(np.concatenate(vs)))
    return sorted(out)


def _volume(seed=0, shape=(14, 12, 16)):
    rng = np.random.default_rng(seed)
    D, H, W = shape
    z, y, x = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    vol = (
        (z - D / 2.0) ** 2 / 20
        + (y - H / 2.0) ** 2 / 14
        + (x - W / 2.0) ** 2 / 25
        - 1.0
    )
    return vol + 0.05 * rng.normal(size=vol.shape)


@pytest.mark.parametrize("seed", [0, 3])
def test_device_matches_host_triangle_set(seed):
    vol = _volume(seed)
    v_h, f_h = marching_tetrahedra(vol, 0.0)
    v_d, f_d, cnt = marching_tetrahedra_jax(
        np.asarray(vol, np.float32), 0.0, budget=1 << 13
    )
    cnt = int(cnt)
    assert cnt == len(f_h)
    tri_d = np.asarray(v_d).reshape(-1, 3, 3)[:cnt]
    ch, cd = _canon(v_h[f_h]), _canon(tri_d)
    assert len(ch) == len(cd)
    for a, b in zip(ch, cd):
        np.testing.assert_allclose(a, b, atol=2e-3)
    # unused buffer rows are far-away degenerates (z-clip rejected)
    rest = np.asarray(v_d).reshape(-1, 3, 3)[cnt:]
    assert (rest == MT_FAR).all()
    # faces are the static arange topology
    np.testing.assert_array_equal(
        np.asarray(f_d), np.arange((1 << 13) * 3).reshape(-1, 3)
    )


def test_budget_overflow_reported():
    vol = _volume(1)
    _, f_h = marching_tetrahedra(vol, 0.0)
    v_d, _, cnt = marching_tetrahedra_jax(
        np.asarray(vol, np.float32), 0.0, budget=64
    )
    assert int(cnt) == len(f_h)  # true count reported even past the budget
    tri = np.asarray(v_d).reshape(-1, 3, 3)
    assert (tri != MT_FAR).any(axis=(1, 2)).sum() == 64  # budget rows filled


def test_phi_pipeline_matches_host_mesh():
    """phi -> device mesh matches render.phi_to_mesh's triangle set."""
    from lbm_ferrofluid_tpu.render import phi_to_mesh

    res = (12, 10, 14)
    vol = _volume(2, res)
    phi = np.tanh(-vol)[None, None].astype(np.float32)
    v_h, f_h = phi_to_mesh(phi, res)
    v_d, f_d, cnt = phi_to_mesh_jax(phi, res, budget=1 << 13)
    cnt = int(cnt)
    assert cnt == len(f_h)
    tri_d = np.asarray(v_d).reshape(-1, 3, 3)[:cnt]
    ch, cd = _canon(v_h[f_h], 3), _canon(tri_d, 3)
    for a, b in zip(ch, cd):
        np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.slow
def test_render_pipeline_device_image_close_to_host():
    """One jitted phi -> image computation vs the host-extraction render
    path: images agree to a few gray levels (the host interpolates vertex
    positions in f64, the device in f32)."""
    from lbm_ferrofluid_tpu.render import (
        default_renderer,
        make_render_pipeline,
        phi_to_mesh,
        _bucket_mesh,
    )
    import jax.numpy as jnp

    res = (12, 10, 14)
    vol = _volume(2, res)
    phi = np.tanh(-vol)[None, None].astype(np.float32)

    renderer = default_renderer(image_size=64)
    pipe = make_render_pipeline(res, renderer=renderer, budget=1 << 13)
    img_d, cnt = pipe(jnp.asarray(phi))
    assert int(cnt) <= 1 << 13, "budget overflow would drop triangles"
    img_d = np.asarray(img_d)

    v_h, f_h = phi_to_mesh(phi, res)
    vb, fb = _bucket_mesh(v_h, f_h)
    textures = jnp.full((1, fb.shape[0], 2, 3), 0.68, jnp.float32)
    out = renderer.forward(jnp.asarray(vb)[None], jnp.asarray(fb)[None],
                           textures)
    img_h = np.clip(np.asarray(out[0, :3]).transpose(1, 2, 0), 0, 1)

    assert img_d.shape == img_h.shape
    assert np.abs(img_d - img_h).mean() < 2e-3
    assert np.abs(img_d - img_h).max() < 0.1
