"""Device-mesh construction for spatial domain decomposition.

The reference is strictly single-GPU (SURVEY.md §2.4); grid sharding over an
ICI mesh is the headline distributed feature of this rebuild.  The scaling
axis of an LBM solver is the *grid*, so mesh axes map onto spatial array
axes ('z', 'y', 'x') plus 'batch' for data parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "auto_mesh_shape", "initialize_distributed"]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Multi-host entry: initialize jax.distributed and return process count.

    The reference has no multi-node story (SURVEY.md §2.4 'Multi-node:
    none'); on TPU pods the runtime is jax.distributed — after this call
    ``jax.devices()`` spans every host's chips and the existing
    ``make_mesh``/shard_map slab path scales across hosts unchanged (XLA
    routes the same ppermute collectives over ICI within a slice and DCN
    across slices).

    On TPU pod slices all three arguments are auto-detected from the
    environment (the common case — just call with no args on every host).
    Explicit args or the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars drive CPU/GPU clusters.  Safe to call when
    single-process (returns 1 without initializing).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # pod auto-detect: only when the worker list actually names >1 hosts
    # (single-host environments — like the tunneled dev chip — also export
    # TPU_WORKER_HOSTNAMES)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = len([w for w in workers.split(",") if w.strip()]) > 1 or (
        "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if coordinator_address is None and not on_pod:
        return 1  # single-process run: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


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
