"""Pallas TPU kernels for the hot loops.

Each kernel has a jnp reference implementation in ops/ with identical
semantics; the kernels are swapped in behind the same function signatures
when the array shapes and backend allow it.
"""

import os as _os

from .poisson import poisson_sweeps, poisson_supported

__all__ = ["poisson_sweeps", "poisson_supported", "force_fastpath"]


def force_fastpath() -> bool:
    """Test hook: LBM_FORCE_FASTPATH=interpret runs the single-device fused
    dispatch (incl. the capillogue steady state) in Pallas interpret mode
    off-TPU — the only way to exercise this dispatch under pytest.

    The SAME predicate must gate every fused-path dispatch decision
    (models/ferrofluid.py step + prime_premac, ops/collide.py) or the
    lax.scan carry structure desynchronizes between priming and stepping.
    """
    import jax

    return (
        _os.environ.get("LBM_FORCE_FASTPATH") == "interpret"
        and jax.default_backend() != "tpu"
    )
