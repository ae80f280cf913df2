"""Isotropic finite-difference stencils and staggered-grid helpers.

These reproduce the reference's 9-point (2D) / 19-point (3D) isotropic
gradient and Laplacian (LBM_collision_2d.py:183-256, LBM_collision_3d.py:
209-318) and the MAC-staggering helpers (utils/grid.py:7-64) as pure jnp
functions.  All boundary handling is functional (jnp.pad / jnp.where); under
jit the shifted-slice reads fuse into a single VPU stencil pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.types import CellType

__all__ = [
    "isotropic_grad",
    "isotropic_laplacian",
    "staggered_x",
    "staggered_y",
    "staggered_z",
    "staggered",
]


def _sh(x: jnp.ndarray, off: tuple[int, ...]) -> jnp.ndarray:
    """Interior view of ``x`` shifted by ``off`` (array-axis order (z,)y,x).

    ``_sh(x, (0,)*d)`` is the interior ``x[..., 1:-1, ..., 1:-1]``; an offset
    of +1/-1 along an axis reads the neighbor in that direction.
    """
    idx = [slice(None)] * (x.ndim - len(off))
    for o in off:
        idx.append(slice(1 + o, None if o == 1 else -1 + o))
    return x[tuple(idx)]


def _replicate_pad(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - dim) + [(1, 1)] * dim
    return jnp.pad(x, pad, mode="edge")


def _zero_pad(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - dim) + [(1, 1)] * dim
    return jnp.pad(x, pad)


def _interior(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    idx = [slice(None)] * (x.ndim - dim) + [slice(1, -1)] * dim
    return x[tuple(idx)]


def isotropic_grad(
    x: jnp.ndarray, dx: float, flags: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Isotropic central gradient of a scalar field [B, 1, *res] -> [B, dim, *res].

    On OBSTACLE cells the input is first replaced by its nearest-interior
    value (replicate pad of the interior), then a 9-point (2D) / 19-point (3D)
    isotropic stencil is evaluated on the interior and replicate-padded back
    out (reference: LBM_collision_2d.py:183-227, LBM_collision_3d.py:209-279).
    """
    if x.shape[1] != 1:
        raise ValueError("isotropic_grad expects a single-channel field")

    x_obs = _replicate_pad(_interior(x, dim), dim)
    xn = jnp.where(flags == int(CellType.OBSTACLE), x_obs, x)

    S = lambda *off: _sh(xn, off)  # noqa: E731

    if dim == 2:
        gx = (
            4.0 * (S(0, 1) - S(0, -1))
            + (S(1, 1) - S(-1, -1) + S(-1, 1) - S(1, -1))
        ) / (12.0 * dx)
        gy = (
            4.0 * (S(1, 0) - S(-1, 0))
            + (S(1, 1) - S(-1, -1) + S(1, -1) - S(-1, 1))
        ) / (12.0 * dx)
        out = jnp.concatenate([gx, gy], axis=1)
    elif dim == 3:
        gx = (
            2.0 * (S(0, 0, 1) - S(0, 0, -1))
            + (
                S(1, 0, 1) - S(-1, 0, -1) + S(-1, 0, 1) - S(1, 0, -1)
                + S(0, 1, 1) - S(0, -1, -1) + S(0, -1, 1) - S(0, 1, -1)
            )
        ) / (12.0 * dx)
        gy = (
            2.0 * (S(0, 1, 0) - S(0, -1, 0))
            + (
                S(1, 1, 0) - S(-1, -1, 0) + S(-1, 1, 0) - S(1, -1, 0)
                + S(0, 1, 1) - S(0, -1, -1) + S(0, 1, -1) - S(0, -1, 1)
            )
        ) / (12.0 * dx)
        gz = (
            2.0 * (S(1, 0, 0) - S(-1, 0, 0))
            + (
                S(1, 1, 0) - S(-1, -1, 0) + S(1, -1, 0) - S(-1, 1, 0)
                + S(1, 0, 1) - S(-1, 0, -1) + S(1, 0, -1) - S(-1, 0, 1)
            )
        ) / (12.0 * dx)
        out = jnp.concatenate([gx, gy, gz], axis=1)
    else:
        raise ValueError(f"unsupported dim {dim}")

    return _replicate_pad(out, dim)


def isotropic_laplacian(x: jnp.ndarray, dx: float, dim: int) -> jnp.ndarray:
    """Isotropic Laplacian, zero-padded at the boundary ring.

    2D: (4·Σ_face + Σ_diag − 20·C) / (5 dx²); 3D: (2·Σ_face + Σ_edge − 24·C)
    / (6 dx²) (reference: LBM_collision_2d.py:229-256, _3d.py:281-318).

    Note: the standard isotropic 2D normalization would be /6; the reference
    uses /5, overestimating the Laplacian by 6/5 (effectively rescaling kappa
    in 2D).  Reproduced verbatim for field parity.
    """
    S = lambda *off: _sh(x, off)  # noqa: E731
    if dim == 2:
        lap = (
            4.0 * (S(0, 1) + S(0, -1) + S(1, 0) + S(-1, 0))
            + (S(1, 1) + S(1, -1) + S(-1, 1) + S(-1, -1))
            - 20.0 * S(0, 0)
        ) / (5.0 * dx * dx)
    elif dim == 3:
        faces = (
            S(0, 0, 1) + S(0, 0, -1) + S(0, 1, 0) + S(0, -1, 0)
            + S(1, 0, 0) + S(-1, 0, 0)
        )
        edges = (
            S(0, 1, 1) + S(0, 1, -1) + S(0, -1, 1) + S(0, -1, -1)
            + S(1, 0, 1) + S(1, 0, -1) + S(-1, 0, 1) + S(-1, 0, -1)
            + S(1, 1, 0) + S(1, -1, 0) + S(-1, 1, 0) + S(-1, -1, 0)
        )
        lap = (2.0 * faces + edges - 24.0 * S(0, 0, 0)) / (6.0 * dx * dx)
    else:
        raise ValueError(f"unsupported dim {dim}")
    return _zero_pad(lap, dim)


# ----------------------------------------------------------------------
# MAC staggering (reference: utils/grid.py:7-64).  Face-centered averages
# along one axis, padded by one face on each side.
# ----------------------------------------------------------------------
def _stagger(x: jnp.ndarray, axis: int, mode: str) -> jnp.ndarray:
    lo = [slice(None)] * x.ndim
    hi = [slice(None)] * x.ndim
    lo[axis] = slice(None, -1)
    hi[axis] = slice(1, None)
    avg = 0.5 * (x[tuple(hi)] + x[tuple(lo)])
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    return jnp.pad(avg, pad, mode="edge" if mode == "replicate" else "constant")


def staggered_x(x: jnp.ndarray, mode: str = "replicate") -> jnp.ndarray:
    return _stagger(x, -1, mode)


def staggered_y(x: jnp.ndarray, mode: str = "replicate") -> jnp.ndarray:
    return _stagger(x, -2, mode)


def staggered_z(x: jnp.ndarray, mode: str = "replicate") -> jnp.ndarray:
    if x.ndim != 5:
        raise ValueError("staggered_z requires a 3D field [B, C, D, H, W]")
    return _stagger(x, -3, mode)


def staggered(vec: jnp.ndarray, mode: str = "replicate") -> list[jnp.ndarray]:
    """Split a vector field [B, dim, *res] into MAC face components."""
    dim = vec.shape[1]
    out = [
        staggered_x(vec[:, 0:1], mode),
        staggered_y(vec[:, 1:2], mode),
    ]
    if dim == 3:
        out.append(staggered_z(vec[:, 2:3], mode))
    return out
