"""Checkpoint / resume for state pytrees.

The reference has no state save/load at all (SURVEY.md §5).  We store the
flattened pytree leaves in one .npz keyed by tree path; restore requires a
template state (same structure), which init functions provide cheaply.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def _keystr(path) -> str:
    return jax.tree_util.keystr(path).replace("/", "_")


def save_checkpoint(path, state) -> None:
    """Write all array leaves of ``state`` to ``path`` (.npz).

    bfloat16 leaves are stored widened to float32 (exact) since numpy's npz
    cannot serialize bf16; load_checkpoint casts back via the template dtype.
    """
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for kp, leaf in leaves:
        arr = leaf
        if hasattr(arr, "dtype") and arr.dtype == jax.numpy.bfloat16:
            arr = arr.astype(jax.numpy.float32)
        arrays[_keystr(kp)] = np.asarray(arr)
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path, template):
    """Restore a state pytree with the same structure as ``template``."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for kp, leaf in leaves:
        key = _keystr(kp)
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        new_leaves.append(jax.numpy.asarray(data[key], dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves
    )
