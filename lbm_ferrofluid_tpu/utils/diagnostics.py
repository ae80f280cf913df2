"""Per-step scalar diagnostics and NaN guards.

The reference has no observability beyond per-frame normalized PNGs
(SURVEY.md §5); we add structured scalars (total mass, kinetic energy,
max |u|) and a finite-check, all as one jitted reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["diagnostics", "assert_finite"]


@jax.jit
def diagnostics(rho: jax.Array, vel: jax.Array) -> dict:
    """Cheap global scalars: {mass, kinetic_energy, max_speed, finite}."""
    u2 = jnp.sum(vel * vel, axis=1, keepdims=True)
    return {
        "mass": jnp.sum(rho),
        "kinetic_energy": 0.5 * jnp.sum(rho * u2),
        "max_speed": jnp.sqrt(jnp.max(u2)),
        "finite": jnp.isfinite(rho).all() & jnp.isfinite(vel).all(),
    }


def assert_finite(state, fields=("f", "rho", "vel")) -> None:
    """Host-side NaN guard (the exponential feq can pole at |u| -> c,
    reference LBM_collision_2d.py:127-145)."""
    for name in fields:
        arr = getattr(state, name, None)
        if arr is None:
            continue
        if not bool(jnp.isfinite(arr).all()):
            raise FloatingPointError(
                f"non-finite values in state.{name} at step {int(state.step)}"
            )
