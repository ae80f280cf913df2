"""Simulation runner: chunked scan stepping, IO hooks, timing.

The reference's ``SimulationRunner`` is only a factory + frame counter
(src/LBM/simulation/simulation_runner.py:22-195) and every demo open-codes a
Python step loop with one dispatch per op.  Here the runner compiles K steps
into a single XLA computation via ``lax.scan`` — on TPU this removes all
host dispatch from the hot loop — and surfaces MLUPS timing (the benchmark
metric) plus periodic host IO.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import numpy as np

from .params import SimulationParams

__all__ = ["SimulationRunner", "sync"]


def sync(state):
    """Fence: block until ``state`` is fully materialized on device.

    ``jax.block_until_ready`` does not reliably block under tunneled TPU
    backends (observed: returns in <1ms while the step chunk is still
    executing), so we force a host readback of a scalar *output* of the
    computation — an executable's outputs are ready only when it finished.
    """
    leaves = jax.tree_util.tree_leaves(state)
    small = min(leaves, key=lambda a: getattr(a, "size", 1 << 62))
    np.asarray(small)
    return state


class SimulationRunner:
    """Drives ``step_fn(params, state) -> state`` efficiently.

    Args:
        params: static simulation parameters.
        step_fn: one of the model step functions (singlephase_step, sc_step,
            hcz_step, ferrofluid_step) or any compatible pure function.
    """

    def __init__(self, params: SimulationParams, step_fn):
        self.params = params
        self._step = step_fn
        self._chunks: dict[int, callable] = {}

    # ------------------------------------------------------------------
    def step(self, state):
        return self._step(self.params, state)

    def _prepare(self, state):
        """Model-specific pre-scan priming: ferrofluid states get their
        premac populated so the fast path runs mac-carried (the scan carry
        must be structure-stable, so this happens before chunking)."""
        if getattr(state, "premac", "no") is None:
            from .ferrofluid import prime_premac

            return prime_premac(self.params, state)
        return state

    def _chunk(self, n: int):
        """A jitted function advancing the state n steps in one XLA call."""
        if n not in self._chunks:
            params, step = self.params, self._step

            @partial(jax.jit, donate_argnums=0)
            def run_n(state):
                def body(carry, _):
                    return step(params, carry), None

                state, _ = jax.lax.scan(body, state, None, length=n)
                return state

            self._chunks[n] = run_n
        return self._chunks[n]

    # ------------------------------------------------------------------
    def run(self, state, n_steps: int, *, io_interval: int = 0, io_fn=None,
            nan_guard: bool = False):
        """Advance ``n_steps``; call ``io_fn(state)`` every ``io_interval``
        steps (host transfer happens only then).  With ``nan_guard`` the
        fields are finite-checked at every IO point (the exponential feq can
        pole at |u| -> c; reference LBM_collision_2d.py:127-145)."""
        state = self._prepare(state)
        if io_interval and (io_fn or nan_guard):
            from ..utils.diagnostics import assert_finite

            done = 0
            while done < n_steps:
                k = min(io_interval, n_steps - done)
                state = self._chunk(k)(state)
                done += k
                if nan_guard:
                    assert_finite(state)
                if io_fn:
                    io_fn(state)
            return state
        return self._chunk(n_steps)(state)

    # ------------------------------------------------------------------
    def benchmark(self, state, *, n_steps: int = 50, warmup: int = 5,
                  repeats: int = 1):
        """Wall-clock MLUPS (million lattice-site updates per second).

        Counts *outer* steps: one step of the ferrofluid model (which
        internally runs poisson_iters extra sweeps) is one lattice update,
        matching how the reference workloads are specified.  With
        ``repeats`` > 1 the timed chunk runs that many times; ``mlups`` is
        the median and per-repeat seconds are reported for variance.
        """
        state = self._prepare(state)
        res = state.rho.shape[2:]
        sites = state.rho.shape[0] * int(np.prod(res))

        # warm up with the SAME chunk that gets timed, so compilation never
        # lands inside the measured region
        chunk = self._chunk(n_steps)
        for _ in range(max(1, warmup // n_steps + 1) if warmup else 1):
            state = chunk(state)
        sync(state)

        times = []
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            state = chunk(state)
            sync(state)
            times.append(time.perf_counter() - t0)

        dt = float(np.median(times))
        mlups = sites * n_steps / dt / 1e6
        return state, {
            "mlups": mlups,
            "mlups_best": sites * n_steps / min(times) / 1e6,
            "seconds": dt,
            "seconds_all": [round(t, 4) for t in times],
            "steps": n_steps,
            "sites": sites,
            "res": tuple(res),
        }
