"""Utilities: cell types, IO, diagnostics, checkpointing."""

from .types import CellType, KBCType

__all__ = ["CellType", "KBCType"]
