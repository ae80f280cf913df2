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

__all__ = ["stream", "bounce_back", "stream_bounce_moments", "stream_bounce_macro"]


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


def stream_bounce_moments(
    lat: Lattice, f: jnp.ndarray, flags: jnp.ndarray, use_pallas: bool = True,
    mesh=None,
):
    """stream -> bounce-back -> raw moments, fused on TPU when possible.

    Returns (f_post, m0 = Σ_q f_q, m1 = Σ_q f_q e_q), with moments taken from
    the post-bounce-back field.  On FLUID cells this equals the reference's
    pre-bounce moments (bounce back only rewrites OBSTACLE cells), and
    OBSTACLE-cell moments are discarded by the frozen-moment update anyway.

    With ``mesh`` the fused kernel runs multi-chip under shard_map slab
    decomposition (parallel/step3d.py); otherwise with sharded inputs the
    jnp path below is taken, whose rolls GSPMD lowers to collective-permutes.
    """
    import os

    import jax

    from .pallas.stream3d import stream3d_supported, stream_bounce_moments as _pk

    pallas_on = (
        use_pallas and lat.dim == 3 and lat.q == 19
        and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    if pallas_on and mesh is not None:
        from ..parallel.step3d import (
            default_interpret, sharded3d_ok, stream_bounce_moments_sharded,
        )

        interp = default_interpret()
        if sharded3d_ok(mesh, f.shape, interp):
            return stream_bounce_moments_sharded(f, flags, mesh, interpret=interp)
    elif (
        pallas_on
        and stream3d_supported(lat, f.shape)
        and jax.default_backend() == "tpu"
    ):
        return _pk(f, flags)

    f = stream(lat, f)
    f = bounce_back(lat, f, flags)
    ff = f.astype(jnp.float32) if f.dtype == jnp.bfloat16 else f
    m0 = jnp.sum(ff, axis=1, keepdims=True)
    moments = []
    import numpy as np

    for d in range(lat.dim):
        ed = jnp.asarray(
            lat.e[:, d].reshape(1, lat.q, *([1] * lat.dim)).astype(np.float64),
            dtype=ff.dtype,
        )
        moments.append(jnp.sum(ff * ed, axis=1, keepdims=True))
    return f, m0, jnp.concatenate(moments, axis=1)


def stream_bounce_macro(
    lat: Lattice,
    f: jnp.ndarray,
    flags: jnp.ndarray,
    rho_old: jnp.ndarray,
    vel_old: jnp.ndarray,
    *,
    c: float,
    rho_gas: float,
    rho_fluid: float,
    density_gas: float,
    density_fluid: float,
    use_pallas: bool = True,
    mesh=None,
):
    """Full hydrodynamic prologue in one pass: stream -> bounce-back ->
    frozen macro moments -> linear density map.

    Returns (f_post, rho, vel, density).  ``mesh`` as in
    :func:`stream_bounce_moments`.
    """
    import os

    import jax

    from .pallas.stream3d import stream3d_supported
    from .pallas.stream3d import stream_bounce_macro as _pk

    pallas_on = (
        use_pallas and lat.dim == 3 and lat.q == 19
        and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    if pallas_on and mesh is not None:
        from ..parallel.step3d import (
            default_interpret, sharded3d_ok, stream_bounce_macro_sharded,
        )

        interp = default_interpret()
        if sharded3d_ok(mesh, f.shape, interp):
            return stream_bounce_macro_sharded(
                f, flags, rho_old, vel_old, mesh, c=c, rho_gas=rho_gas,
                rho_fluid=rho_fluid, density_gas=density_gas,
                density_fluid=density_fluid, interpret=interp,
            )
    elif (
        pallas_on
        and stream3d_supported(lat, f.shape)
        and jax.default_backend() == "tpu"
    ):
        return _pk(
            f, flags, rho_old, vel_old, c=c, rho_gas=rho_gas,
            rho_fluid=rho_fluid, density_gas=density_gas,
            density_fluid=density_fluid,
        )

    f2, m0, m1 = stream_bounce_moments(lat, f, flags, use_pallas=False)
    is_obs = flags == int(CellType.OBSTACLE)
    rho = jnp.where(is_obs, rho_old, m0)
    vel = jnp.where(is_obs, vel_old, m1 * (c / rho))
    density = density_gas + (density_fluid - density_gas) * (
        (rho - rho_gas) / (rho_fluid - rho_gas)
    )
    return f2, rho, vel, density
