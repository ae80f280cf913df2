"""Artifact IO tests: PNG, OBJ, Tecplot."""

import numpy as np

from lbm_ferrofluid_tpu.utils.io import (
    dump_2d_plt,
    dump_3d_plt,
    export_obj,
    save_img,
)


def test_save_img_2d(tmp_path):
    field = np.linspace(0, 1, 64).reshape(1, 1, 8, 8)
    p = tmp_path / "f.png"
    save_img(field, str(p))
    from PIL import Image

    img = np.asarray(Image.open(p))
    assert img.shape == (8, 8, 3)
    # min-max normalized: full range used
    assert img.min() == 0 and img.max() == 255
    # vertical flip: the largest value (last row of the field) is at the top
    assert img[0].max() == 255 and img[-1].min() == 0


def test_save_img_3d_projects_z(tmp_path):
    field = np.random.default_rng(0).uniform(size=(1, 1, 4, 8, 8))
    p = tmp_path / "f3.png"
    save_img(field, str(p))
    from PIL import Image

    assert np.asarray(Image.open(p)).shape == (8, 8, 3)


def test_export_obj_one_indexed(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.asarray([[0, 1, 2]])
    p = tmp_path / "m.obj"
    export_obj(str(p), verts, faces)
    text = p.read_text()
    assert "f 1 2 3" in text  # zero-based input becomes one-based OBJ


def test_dump_plt_matches_reference_format(tmp_path):
    H, W = 3, 4
    rng = np.random.default_rng(1)
    density = rng.uniform(size=(1, 1, H, W)).astype(np.float32)
    uv = rng.uniform(size=(1, 2, H, W)).astype(np.float32)
    p = tmp_path / "d.plt"
    dump_2d_plt(str(p), density, uv)
    lines = p.read_text().splitlines()
    assert lines[0] == 'TITLE ="Magnetic internal force"'
    assert lines[1] == 'VARIABLES = "X" "Y" "RHO" "U" "V" '
    assert lines[2] == f"ZONE I={W}, J={H}"
    assert lines[3] == "F=POINT"
    assert len(lines) == 4 + H * W


def test_dump_3d_plt(tmp_path):
    D, H, W = 2, 3, 4
    rng = np.random.default_rng(2)
    density = rng.uniform(size=(1, 1, D, H, W)).astype(np.float32)
    u = rng.uniform(size=(1, 1, D, H, W + 1)).astype(np.float32)
    v = rng.uniform(size=(1, 1, D, H + 1, W)).astype(np.float32)
    w = rng.uniform(size=(1, 1, D + 1, H, W)).astype(np.float32)
    p = tmp_path / "d3.plt"
    dump_3d_plt(str(p), density, u, v, w)
    lines = p.read_text().splitlines()
    assert len(lines) == 4 + D * H * W
