"""Pallas TPU kernels for the hot loops.

Each kernel has a jnp reference implementation in ops/ with identical
semantics; the kernels are swapped in behind the same function signatures
when the array shapes and backend allow it.
"""

from .poisson import poisson_sweeps, poisson_supported

__all__ = ["poisson_sweeps", "poisson_supported"]
