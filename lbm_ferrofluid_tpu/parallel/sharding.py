"""Sharding specs for simulation state pytrees.

Design (SURVEY.md §2.4, §5): fields are laid out [B, C, (z,) y, x]; mesh
axes 'batch'/'z'/'y'/'x' map onto the corresponding array axes.  Streaming
(jnp.roll) and the depth-1 stencils then lower, under jit's SPMD
partitioner, to collective-permutes of 1-cell slabs over ICI — the stencil
analog of ring attention.  No hand-written halo code is needed for
correctness; an explicit Pallas halo pipeline can later slot in under the
same function signatures for the last bit of overlap.

Leaves whose extent along a sharded axis is not divisible by the mesh axis
(e.g. MAC-staggered fields of size N+1) are replicated along that axis —
they are per-step constants in this framework.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["state_shardings", "shard_state", "SPATIAL_AXES"]

# array-axis position (from the right) for each named spatial mesh axis,
# given the [B, C, (z,) y, x] layout
SPATIAL_AXES = {"x": 1, "y": 2, "z": 3}


def _leaf_spec(leaf, mesh: Mesh) -> P:
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    spec = [None] * leaf.ndim
    for name, size in zip(mesh.axis_names, mesh.devices.shape):
        if size == 1:
            continue
        if name == "batch":
            axis = 0
        elif name in SPATIAL_AXES:
            axis = leaf.ndim - SPATIAL_AXES[name]
            if axis < 2:  # scalar/channel axes of low-rank leaves
                continue
        else:
            continue
        if 0 <= axis < leaf.ndim and leaf.shape[axis] % size == 0:
            spec[axis] = name
    return P(*spec)


def state_shardings(state, mesh: Mesh):
    """Pytree of NamedShardings matching ``state``'s leaves."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, mesh)), state
    )


def shard_state(state, mesh: Mesh):
    """Place a (host or single-device) state onto the mesh."""
    return jax.device_put(state, state_shardings(state, mesh))
