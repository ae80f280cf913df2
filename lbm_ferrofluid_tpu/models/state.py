"""Simulation state pytrees.

The reference keeps all state as loose tensors in each demo driver
(SURVEY.md §1: "no classes own simulation state").  Here state is an explicit
pytree dataclass so the whole step is a pure ``state -> state`` function that
jits, shards, scans, donates and checkpoints as one unit.
"""

from __future__ import annotations

import dataclasses

import jax

from ..lattice import Lattice
from .params import SimulationParams

__all__ = ["SinglePhaseState", "HCZState", "FerrofluidState", "field_shapes"]


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(cls))


@_pytree_dataclass
class SinglePhaseState:
    """State of a single-phase BGK/KBC solver."""

    f: jax.Array  # [B, Q, *res]
    rho: jax.Array  # [B, 1, *res]
    vel: jax.Array  # [B, dim, *res]
    force: jax.Array  # [B, dim, *res]
    flags: jax.Array  # [B, 1, *res] uint8
    step: jax.Array  # [] int32


@_pytree_dataclass
class HCZState:
    """State of the HCZ two-distribution multiphase solver (also used for SC,
    where g/pressure are unused)."""

    f: jax.Array
    g: jax.Array | None
    rho: jax.Array
    vel: jax.Array
    density: jax.Array
    pressure: jax.Array | None
    force: jax.Array
    flags: jax.Array
    step: jax.Array
    # optional velocity pinning (e.g. the wave demo's inflow column,
    # demo_2d_wave.py:104,125,141): vel <- where(mask, value, vel)
    vel_pin_mask: jax.Array | None = None
    vel_pin_value: jax.Array | None = None


@_pytree_dataclass
class FerrofluidState:
    """HCZ multiphase + magnetic Poisson distribution h."""

    f: jax.Array
    g: jax.Array
    h: jax.Array
    rho: jax.Array
    vel: jax.Array
    density: jax.Array
    pressure: jax.Array
    # force is None on the mac-carried capillogue steady state: it is a
    # write-only diagnostic of the ferrofluid step (the reference
    # overwrites it unread each step, LBM_collision_HCZ_3d.py:225); the
    # non-carried paths still store it per step
    force: jax.Array | None
    # None on the mac-carried capillogue steady state (its only in-step
    # consumer, the Poisson rhs chain, is carried pre-computed in premac[5]);
    # models.phi_field derives phi from density on demand
    phi: jax.Array | None
    flags: jax.Array
    magnetic_flags: jax.Array
    # [B, dim, *res] constant external field.  None on the mac-carried
    # capillogue steady state: the step never reads it (H2 folds the
    # static params.h_ext_axis field; the rhs uses H_ext_mac), and as a
    # dead donated passthrough it costs a full-volume buffer-shuffle copy
    # per step.  models.make_H_ext rebuilds it on demand.
    H_ext: jax.Array | None
    H_ext_mac: tuple  # staggered components (x, y[, z])
    step: jax.Array
    # mac-carry fast path (models/ferrofluid.py:prime_premac): the previous
    # epilogue's in-kernel prologue output as a 5-tuple of SEPARATE f32
    # arrays (rho [B,1,*res], vel [B,3], density [B,1], m0g [B,1],
    # m1g [B,3]) — separate so consumers never slice a packed array (XLA
    # materializes such slices around Pallas custom calls).  When present,
    # the step skips its prologue kernel (no HBM re-read of f and g).
    # None by default so existing pytree structures (checkpoints, scans
    # without priming) are unchanged.
    premac: tuple | None = None
    # scalar Poisson carry (tau == 1 only; models/ferrofluid.py
    # _prime_steady): when the magnetic solve collapses to its 1-channel
    # form (ops/scalar_poisson.py), ``h`` holds the fused [B, 2, Z, Y, X]
    # f32 (s, s_prev) pair instead of the 19-channel distribution, and
    # ``cmask`` carries the static obstacle/wall-weight field the Pallas
    # kernel streams (-1 at obstacles, c(x) >= 0 at fluid).  The step
    # dispatches on h.shape[1] == 2; ops/scalar_poisson.py:h_from_scalar
    # reconstructs a channel-form h for external consumers.
    cmask: jax.Array | None = None


def field_shapes(params: SimulationParams, res: tuple[int, ...], batch: int = 1):
    """Canonical field shapes for a resolution (z, y, x ordering)."""
    lat: Lattice = params.lattice
    return {
        "f": (batch, lat.q, *res),
        "scalar": (batch, 1, *res),
        "vector": (batch, lat.dim, *res),
    }
