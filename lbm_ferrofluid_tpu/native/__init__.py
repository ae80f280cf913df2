"""ctypes bindings for the native host-side library (liblbmnative.so).

Provides the C++ marching-tetrahedra extractor and fast Tecplot writers.
All entry points return None / raise ImportError gracefully when the library
has not been built (tools/build_native.sh); callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

__all__ = ["available", "marching_tetrahedra_native", "dump_2d_plt_native",
           "dump_3d_plt_native"]

_LIB_PATH = pathlib.Path(__file__).parent / "liblbmnative.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        raise ImportError(
            f"{_LIB_PATH} not built — run tools/build_native.sh"
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mtetra_run.restype = ctypes.c_void_p
    lib.mtetra_run.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mtetra_fill.restype = None
    lib.mtetra_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    for fn in (lib.dump_2d_plt, lib.dump_3d_plt):
        fn.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _LIB_PATH.exists()


def marching_tetrahedra_native(volume: np.ndarray, level: float = 0.0):
    """C++ marching tetrahedra; same output convention as render.mesh."""
    lib = _load()
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    D, H, W = vol.shape
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    handle = lib.mtetra_run(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        D, H, W, ctypes.c_float(level),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int64)
    lib.mtetra_fill(
        handle,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return verts, faces


def dump_2d_plt_native(filename: str, density, u, v) -> None:
    lib = _load()
    d = np.ascontiguousarray(density, np.float32)
    uu = np.ascontiguousarray(u, np.float32)
    vv = np.ascontiguousarray(v, np.float32)
    H, W = d.shape[-2:]
    ret = lib.dump_2d_plt(
        filename.encode(),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uu.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H, W,
    )
    if ret != 0:
        raise OSError(f"dump_2d_plt failed for {filename}")


def dump_3d_plt_native(filename: str, density, u, v, w) -> None:
    lib = _load()
    arrs = [np.ascontiguousarray(x, np.float32) for x in (density, u, v, w)]
    D, H, W = arrs[0].shape[-3:]
    ret = lib.dump_3d_plt(
        filename.encode(),
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs],
        D, H, W,
    )
    if ret != 0:
        raise OSError(f"dump_3d_plt failed for {filename}")
