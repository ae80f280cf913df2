"""Explicit halo exchange: shard_map slab decomposition + Pallas kernels.

The default multi-chip path lets XLA's SPMD partitioner lower the jnp
rolls/stencils to collective-permutes automatically (parallel/sharding.py).
This module is the *explicit* formulation — ``shard_map`` over a 1D 'z' mesh
with ``ppermute`` ring exchange of 1-plane halos — which composes with the
fused Pallas kernels (GSPMD cannot partition a custom call) and gives
manual control of the communication schedule.  This is the stencil analog
of ring attention: per sweep, each device exchanges one plane of the
z-moving channel groups with its ring neighbors over ICI.

Demonstrated here for the magnetic Poisson inner loop (the hot 30-sweep
kernel); the same ghost-plane pattern extends to the full HCZ step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..lattice import D3Q19
from ..utils.types import CellType
from ..ops.equilibrium import heq
from ..ops.stream import bounce_back, stream

__all__ = ["ring_halo", "sharded_poisson_sweeps"]


def ring_halo(x, axis_name: str, shift: int):
    """Ring-permute ``x`` to the neighbor ``shift`` steps up the axis."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _local_sweeps(h_local, flags_local, rhs_local, *, tau, n_iters, axis_name):
    """Body run per z-slab: exchange 1-plane halos, sweep locally.

    h_local: ``[1, 19, Zl, Y, X]``.  The up-moving channels (q9-13) pull from
    z-1, so each sweep needs their last plane from the ring-previous device;
    the down-moving channels (q14-18) need their first plane from the
    ring-next device.  In-plane shifts stay local (full Y, X per slab).
    """
    lat = D3Q19
    w = jnp.asarray(lat.w_bcast(), dtype=jnp.float32)
    w0 = float(lat.weights[0])
    is_obs = flags_local == int(CellType.OBSTACLE)
    add_h = w * rhs_local

    def one_sweep(carry, _):
        h, _psi = carry
        up = h[:, 9:14]
        dn = h[:, 14:19]
        # ghost planes over ICI: one plane per direction per sweep
        up_ghost = ring_halo(up[:, :, -1:], axis_name, +1)  # from z-prev
        dn_ghost = ring_halo(dn[:, :, :1], axis_name, -1)  # from z-next
        # assemble padded slabs whose local periodic wrap lands on the ghost
        up_in = jnp.concatenate([up_ghost, up[:, :, :-1]], axis=2)
        dn_in = jnp.concatenate([dn[:, :, 1:], dn_ghost], axis=2)
        # local streaming with the ghost-substituted z-neighbors: rolling the
        # substituted arrays by one plane in z is now exact
        h_sub = jnp.concatenate([h[:, :9], up_in, dn_in], axis=1)
        shifts = lat.shifts()
        parts = []
        for q in range(19):
            sz, sy, sx = shifts[q]
            v = h_sub[:, q]
            # z shift was pre-applied via the ghost assembly for q>=9
            if sy or sx:
                v = jnp.roll(v, (sy, sx), axis=(-2, -1))
            parts.append(v)
        hs = jnp.stack(parts, axis=1)
        hs = bounce_back(lat, hs, flags_local)
        psi = jnp.sum(hs[:, 1:], axis=1, keepdims=True) / (1.0 - w0)
        heq_val = heq(lat, psi)
        coll = (1.0 - 1.0 / tau) * hs + heq_val / tau + add_h
        h_new = jnp.where(is_obs, hs, coll)
        return (h_new, psi), None

    psi0 = jnp.zeros_like(rhs_local)
    (h, psi), _ = jax.lax.scan(one_sweep, (h_local, psi0), None, length=n_iters)
    return h, psi


def sharded_poisson_sweeps(
    h, magnetic_flags, rhs_scaled, mesh: Mesh, *, tau: float, n_iters: int,
    axis_name: str = "z",
):
    """Run the Poisson inner loop under shard_map over a 1D z mesh.

    Semantically identical to the single-device loop (tests assert this on
    the virtual CPU mesh); communication is one ppermute of a
    ``[1, 5, 1, Y, X]`` plane per direction per sweep, riding ICI.
    """
    spec = P(None, None, axis_name, None, None)
    fn = shard_map(
        functools.partial(
            _local_sweeps, tau=tau, n_iters=n_iters, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec),
    )
    return fn(h, magnetic_flags, rhs_scaled)
