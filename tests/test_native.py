"""Native C++ library tests (skipped when not built)."""

import numpy as np
import pytest

from lbm_ferrofluid_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="liblbmnative.so not built"
)


def test_native_matches_numpy_mtetra():
    from lbm_ferrofluid_tpu.render import mesh

    n, r = 24, 8.0
    c = (n - 1) / 2
    i, j, k = np.mgrid[0:n, 0:n, 0:n]
    vol = (np.sqrt((i - c) ** 2 + (j - c) ** 2 + (k - c) ** 2) - r).astype(np.float32)
    v_cc, f_cc = native.marching_tetrahedra_native(vol, 0.0)
    # numpy reference path (bypass the native fast path)
    import lbm_ferrofluid_tpu.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        v_np, f_np = mesh.marching_tetrahedra(vol, 0.0)
    finally:
        nat.available = orig
    assert len(v_cc) == len(v_np) and len(f_cc) == len(f_np)
    s_cc = np.sort(v_cc.round(5).view([("a", "f4"), ("b", "f4"), ("c", "f4")]).ravel())
    s_np = np.sort(
        v_np.astype(np.float32).round(5).view([("a", "f4"), ("b", "f4"), ("c", "f4")]).ravel()
    )
    np.testing.assert_array_equal(s_cc, s_np)


def test_native_tecplot_2d(tmp_path):
    H, W = 4, 5
    rng = np.random.default_rng(0)
    d = rng.uniform(size=(1, 1, H, W)).astype(np.float32)
    uv = rng.uniform(size=(1, 2, H, W)).astype(np.float32)
    p = tmp_path / "out.plt"
    native.dump_2d_plt_native(str(p), d[0, 0], uv[0, 0], uv[0, 1])
    lines = p.read_text().splitlines()
    assert lines[0].startswith("TITLE")
    assert f"ZONE I={W}, J={H}" in lines[2]
    assert len(lines) == 4 + H * W
    # spot check a value
    x, y, rho, u, v = lines[4].split()
    assert abs(float(rho) - d[0, 0, 0, 0]) < 1e-5
