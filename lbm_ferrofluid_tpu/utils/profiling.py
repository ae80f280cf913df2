"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5: only tqdm bars).  Here:
* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  TensorBoard-compatible traces of the compiled steps,
* ``StepTimer`` — cheap wall-clock step timing with MLUPS reporting, using
  the readback-based sync (block_until_ready is unreliable under tunneled
  TPU backends; see models/runner.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "enable_compile_cache"]


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at the repo-local
    ``.jax_cache`` (or ``path``).

    The tunneled TPU backend compiles through a remote compile server at
    minutes per big program; with the cache enabled a re-run of the same
    program is near-instant.  Harmless on backends that can't serialize
    executables.  bench.py and __graft_entry__ already do this inline;
    measurement tools (tools/*.py) should call this before building
    state.
    """
    import os
    import pathlib

    if path is None:
        path = str(pathlib.Path(__file__).resolve().parents[2] /
                   ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates wall-clock over step calls; reports MLUPS.

    Usage:
        timer = StepTimer(sites=H*W)
        for _ in range(n):
            with timer:
                state = step(params, state)
            timer.sync(state)
        print(timer.summary())
    """

    def __init__(self, sites: int):
        self.sites = sites
        self.steps = 0
        self.seconds = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._t0
        self.steps += 1
        return False

    def sync(self, state) -> None:
        """Force completion (readback of the smallest leaf); folds the wait
        into the accumulated time."""
        t0 = time.perf_counter()
        leaves = jax.tree_util.tree_leaves(state)
        small = min(leaves, key=lambda a: getattr(a, "size", 1 << 62))
        np.asarray(small)
        self.seconds += time.perf_counter() - t0

    @property
    def mlups(self) -> float:
        return self.sites * self.steps / max(self.seconds, 1e-12) / 1e6

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "seconds": round(self.seconds, 4),
            "mlups": round(self.mlups, 2),
        }
