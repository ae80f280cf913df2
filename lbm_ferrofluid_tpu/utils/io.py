"""Artifact IO: field PNGs, OBJ export, Tecplot dumps.

Matches the reference's outputs (src/LBM/utils/io.py:11-152) so artifacts are
directly comparable: min-max-normalized PNGs with vertical flip, z-mean
projection for 3D, OBJ meshes, Tecplot POINT-format .plt files.
"""

from __future__ import annotations

import pathlib

import numpy as np

__all__ = ["save_img", "export_obj", "dump_2d_plt", "dump_3d_plt", "mkdir"]


def mkdir(path: str) -> None:
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)


def _to_uint8_2d(arr: np.ndarray) -> np.ndarray:
    """[B, C, H, W] -> min-max normalized uint8 [H, W, C] of batch 0."""
    arr = np.asarray(arr, dtype=np.float64)
    lo, hi = arr.min(), arr.max()
    arr = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)
    img = np.transpose(arr[0], (1, 2, 0)) * 255.0
    return img.astype(np.uint8)


def save_img(field, filename: str) -> None:
    """Save a field as a normalized PNG; 3D fields are z-mean projected and
    the image is vertically flipped (y up), as the reference (io.py:34-42)."""
    field = np.asarray(field)
    if field.ndim == 5:
        field = field.mean(axis=2)
    elif field.ndim != 4:
        raise ValueError("save_img expects [B, C, (D,) H, W]")
    img = _to_uint8_2d(field)[::-1]  # flip vertically
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    elif img.shape[-1] == 2:
        img = np.concatenate([img, np.zeros_like(img[..., :1])], axis=-1)
    from PIL import Image

    Image.fromarray(img[..., :3]).save(filename)


def export_obj(save_path: str, vertices, faces) -> None:
    """Write a triangle mesh as OBJ (1-indexed faces), as io.py:87-104."""
    np_faces = np.asarray(faces).reshape(-1, 3).astype(np.int64)
    np_vertices = np.asarray(vertices).reshape(-1, 3)
    if np_faces.size and np_faces.min() == 0:
        np_faces = np_faces + 1
    with open(save_path, "w") as fh:
        fh.write("# OBJ file\n")
        for v in np_vertices:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in np_faces:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")


def dump_2d_plt(filename: str, density, uv, batch: int = 0) -> None:
    """Tecplot ASCII dump, matching io.py:107-121 field-for-field.

    Uses the native writer when built (tools/build_native.sh)."""
    density = np.asarray(density)
    uv = np.asarray(uv)
    try:
        from ..native import available, dump_2d_plt_native

        if available():
            dump_2d_plt_native(
                filename, density[batch, 0], uv[batch, 0], uv[batch, 1]
            )
            return
    except Exception:
        pass
    H, W = density.shape[-2:]
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write('VARIABLES = "X" "Y" "RHO" "U" "V" \n')
        fo.write(f"ZONE I={W}, J={H}\n")
        fo.write("F=POINT\n")
        for j in range(H):
            for i in range(W):
                fo.write(
                    f"{i} {j} {density[batch, 0, j, i]} "
                    f"{uv[batch, 0, j, i]} {uv[batch, 1, j, i]}\n"
                )


def dump_3d_plt(filename: str, density, u, v, w, batch: int = 0, chan: int = 0) -> None:
    """Tecplot ASCII dump for 3D MAC-staggered velocities (io.py:124-152)."""
    density = np.asarray(density)
    u = np.asarray(u)
    v = np.asarray(v)
    w = np.asarray(w)
    D, H, W = density.shape[-3:]
    u = 0.5 * (u[..., 1:] + u[..., :-1])
    v = 0.5 * (v[..., 1:, :] + v[..., :-1, :])
    w = 0.5 * (w[..., 1:, :, :] + w[..., :-1, :, :])
    try:
        from ..native import available, dump_3d_plt_native

        if available():
            dump_3d_plt_native(
                filename, density[batch, chan], u[batch, chan],
                v[batch, chan], w[batch, chan],
            )
            return
    except Exception:
        pass
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write('VARIABLES = "X" "Y" "Z" "RHO" "U" "V" "W" \n')
        fo.write(f"ZONE I={W}, J={H}, K={D}\n")
        fo.write("F=POINT\n")
        for k in range(D):
            for j in range(H):
                for i in range(W):
                    fo.write(
                        f"{i} {j} {k} {density[batch, chan, k, j, i]} "
                        f"{u[batch, chan, k, j, i]} {v[batch, chan, k, j, i]} "
                        f"{w[batch, chan, k, j, i]}\n"
                    )
