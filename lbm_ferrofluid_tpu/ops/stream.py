"""Streaming (propagation) and bounce-back.

The reference implements streaming as replicate-pad + periodic halo writes +
per-direction shifted copies (LBM_propagation_2d.py:18-68,
LBM_propagation_3d.py:18-111).  For interior cells that construction is
*exactly* a periodic shift of each population along its lattice link, so the
TPU-native formulation is a static ``jnp.roll`` per direction — no halo
bookkeeping, and under ``jit`` with sharded inputs XLA lowers the rolls to
collective-permutes of 1-cell slabs over ICI automatically.

Bounce-back (LBM_propagation_2d.py:70-86) is a static permutation of the Q
axis masked onto OBSTACLE cells.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lattice import Lattice
from ..utils.types import CellType

__all__ = ["stream", "bounce_back"]


def stream(lat: Lattice, f: jnp.ndarray) -> jnp.ndarray:
    """Periodic streaming: population q moves one cell along e_q.

    Args:
        lat: lattice spec.
        f: distributions ``[B, Q, *res]``.

    Returns:
        streamed distributions, same shape.
    """
    axes = tuple(range(-lat.dim, 0))
    parts = []
    for q, shift in enumerate(lat.shifts()):
        if any(shift):
            parts.append(jnp.roll(f[:, q], shift, axis=axes))
        else:
            parts.append(f[:, q])
    return jnp.stack(parts, axis=1)


def bounce_back(lat: Lattice, f: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Full-way bounce back: on OBSTACLE cells replace f_q by f_{opp(q)}.

    Args:
        f: ``[B, Q, *res]``; flags: ``[B, 1, *res]`` uint8.
    """
    f_inv = f[:, lat.opposite]
    return jnp.where(flags == int(CellType.OBSTACLE), f_inv, f)
