#!/usr/bin/env python
"""Microbench: Poisson kernel variants on the real TPU at 256^3.

Usage: python tools/bench_poisson.py [variant ...]
  variants: v2, v3 (default both), dtypes f32 + bf16.
Prints ms per 30-sweep solve and the implied MLUPS-equivalent share.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lbm_ferrofluid_tpu.ops.pallas.poisson import (
    poisson_multisweep2,
    poisson_wavefront,
    _wf_plan,
    _multisweep2_plan,
)
from lbm_ferrofluid_tpu.utils.types import CellType


def sync(x):
    np.asarray(jax.device_get(x[..., :1, :1, :1]))


def main():
    variants = sys.argv[1:] or ["v2", "v3"]
    Z = Y = X = 256
    n_iters = 30
    rng = np.random.default_rng(0)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 1, Z, Y, X)), jnp.float32)

    for dtype in (jnp.float32, jnp.bfloat16):
        h = jnp.asarray(
            rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32
        ).astype(dtype)
        name = np.dtype(dtype).name if dtype != jnp.bfloat16 else "bf16"
        for v in variants:
            fn = {"v2": poisson_multisweep2, "v3": poisson_wavefront}[v]
            plan = (
                _multisweep2_plan(h.shape, dtype)
                if v == "v2"
                else _wf_plan(h.shape, dtype, n_iters)
            )
            try:
                out = fn(h, flags, rhs, tau=0.8, n_iters=n_iters)
                sync(out[0])
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = fn(h, flags, rhs, tau=0.8, n_iters=n_iters)
                    sync(out[0])
                    ts.append(time.perf_counter() - t0)
                ms = min(ts) * 1e3
                print(f"{v} {name}: plan={plan} {ms:.1f} ms "
                      f"({ms / n_iters:.2f} ms/sweep)", flush=True)
            except Exception as e:
                print(f"{v} {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
