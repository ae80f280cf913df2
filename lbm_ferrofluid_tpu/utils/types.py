"""Cell-type flags and KBC collision variants.

Mirrors the reference's enums (src/LBM/utils/types.py:7-104) so scene
descriptions and golden data are interchangeable.  These are plain Python
ints used at *trace time* — flag grids are uint8 arrays compared against
``int(CellType.X)``.
"""

from __future__ import annotations

from enum import IntEnum

__all__ = ["CellType", "KBCType", "celltype_colormap"]


class CellType(IntEnum):
    """Bitmask cell classification (reference: utils/types.py:7-15)."""

    NOTHING = 0
    FLUID = 1
    OBSTACLE = 2
    EMPTY = 4
    INFLOW = 8
    OUTFLOW = 16
    OPEN = 32
    STICK = 64

    @staticmethod
    def get_colormap():
        return celltype_colormap()


def celltype_colormap():
    """Matplotlib colormap/formatter for plotting flag fields
    (reference: utils/types.py:20-58)."""
    import matplotlib
    import numpy as np
    from matplotlib.colors import ListedColormap

    col_dict = {
        0: "black", 1: "blue", 2: "grey", 4: "white",
        8: "green", 16: "red", 32: "yellow", 64: "orange",
    }
    cm = ListedColormap([col_dict[x] for x in col_dict])
    labels = np.array([
        "NOTHING", "FLUID", "OBSTACLE", "EMPTY",
        "INFLOW", "OUTFLOW", "OPEN", "STICK",
    ])
    norm_bins = np.sort(list(col_dict)) + 0.5
    norm_bins = np.insert(norm_bins, 0, np.min(norm_bins) - 1.0)
    norm = matplotlib.colors.BoundaryNorm(norm_bins, len(labels), clip=True)
    fmt = matplotlib.ticker.FuncFormatter(lambda x, pos: labels[norm(x)])
    return cm, fmt, norm, norm_bins


class KBCType(IntEnum):
    """Entropic-KBC variant selector (reference: utils/types.py:61-104).

    Bit layout: 0b1000_0000 marks "is KBC"; low bits select which moments
    live in the shear part ``s`` (A/C keep N, A/B use central moments).
    """

    LBGK = 0
    KBC_A = 0b10000101
    KBC_B = 0b10000110
    KBC_C = 0b10001001
    KBC_D = 0b10001010

    @staticmethod
    def is_KBC(v) -> bool:
        return v is not None and (int(v) & 0b10000000) > 0

    @staticmethod
    def is_KBC_AC(v) -> bool:
        return v is not None and (int(v) & 0b10000001) > 0

    @staticmethod
    def is_KBC_BD(v) -> bool:
        return v is not None and (int(v) & 0b10000010) > 0

    @staticmethod
    def is_KBC_AB(v) -> bool:
        return v is not None and (int(v) & 0b10000100) > 0

    @staticmethod
    def is_KBC_CD(v) -> bool:
        return v is not None and (int(v) & 0b10001000) > 0
