"""lbm_ferrofluid_tpu — a TPU-native multiphase / ferrofluid LBM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch+CUDA solver (meng-yijie1996/LBM-Ferrofluid): D2Q9/D3Q19 lattice
Boltzmann with BGK / entropic-KBC / Shan-Chen / He-Chen-Zhang collisions, a
Poisson-LBM magnetic sub-solver for ferrofluids, and a differentiable
soft-rasterizer rendering stack — built SPMD-first on jax.sharding meshes.
"""

from . import lattice, models, ops, parallel, utils
from .lattice import D2Q9, D3Q19, Lattice, get_lattice
from .utils.types import CellType, KBCType

__version__ = "0.1.0"

__all__ = [
    "lattice",
    "models",
    "ops",
    "parallel",
    "utils",
    "Lattice",
    "D2Q9",
    "D3Q19",
    "get_lattice",
    "CellType",
    "KBCType",
]
