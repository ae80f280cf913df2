"""Device-mesh construction for spatial domain decomposition.

The reference is strictly single-GPU (SURVEY.md §2.4); grid sharding over an
ICI mesh is the headline distributed feature of this rebuild.  The scaling
axis of an LBM solver is the *grid*, so mesh axes map onto spatial array
axes ('z', 'y', 'x') plus 'batch' for data parallelism.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "auto_mesh_shape"]


def auto_mesh_shape(n_devices: int, n_axes: int = 2) -> tuple[int, ...]:
    """Factor ``n_devices`` into a near-balanced ``n_axes``-tuple.

    e.g. 8 -> (2, 4) for 2 axes, (2, 2, 2) for 3 axes.  Prefers putting the
    larger factor last (the axis usually mapped to the longest grid axis).
    """
    shape = [1] * n_axes
    remaining = n_devices
    i = 0
    while remaining > 1:
        # peel smallest prime factor
        for p in range(2, remaining + 1):
            if remaining % p == 0:
                break
        shape[i % n_axes] *= p
        remaining //= p
        i += 1
    return tuple(sorted(shape))


def make_mesh(
    axis_names: tuple[str, ...] = ("z", "y"),
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over ``devices`` (default: all) with the given axes.

    With ``shape=None`` the devices are auto-factored over the axes.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = auto_mesh_shape(n, len(axis_names))
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
