"""Probe the scalar Poisson wavefront kernel on real TPU hardware.

Correctness at a reduced grid vs the jnp scalar sweeps, then timing at
256^3 (30 sweeps) vs the channel wavefront.  Run with run_in_background;
first compile goes through the remote compile server (minutes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.ops.scalar_poisson import fluid_mask, make_cmask
from lbm_ferrofluid_tpu.ops.pallas.scalar_poisson import (
    _sp_plan,
    scalar_sweeps_cmask,
    scalar_wavefront,
)
from lbm_ferrofluid_tpu.models.runner import sync


def shell_flags(z, y, x):
    mf = np.full((1, 1, z, y, x), int(CellType.OBSTACLE), np.uint8)
    mf[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    return jnp.asarray(mf)


def build(z, y, x, seed=0):
    rng = np.random.default_rng(seed)
    mf = shell_flags(z, y, x)
    mask = np.asarray(fluid_mask(mf))
    s = rng.uniform(-1, 1, (1, 1, z, y, x)).astype(np.float32) * mask
    sp = rng.uniform(-1, 1, (1, 1, z, y, x)).astype(np.float32) * mask
    s2 = jnp.asarray(np.concatenate([s, sp], axis=1))
    rhs = jnp.asarray(rng.uniform(-1e-2, 1e-2, (1, 1, z, y, x)).astype(np.float32))
    return s2, make_cmask(mf), rhs, mf


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- correctness at reduced grid --------------------------------
    Zc, Yc, Xc = 32, 64, 256
    s2, cmask, rhs, mf = build(Zc, Yc, Xc, seed=1)
    n_iters = 10
    print(f"plan k={_sp_plan(s2.shape, n_iters)} at {Zc}x{Yc}x{Xc}", flush=True)
    t0 = time.time()
    s2_k, psi_k = scalar_wavefront(s2, cmask, rhs, n_iters=n_iters, emit="psi")
    sync(s2_k)
    print(f"kernel compile+run {time.time()-t0:.1f}s", flush=True)
    s2_j, psi_j = jax.jit(scalar_sweeps_cmask, static_argnums=3)(
        s2, cmask, rhs, n_iters
    )
    sync(s2_j)
    for name, a, b in (("s2", s2_k, s2_j), ("psi", psi_k, psi_j)):
        a, b = np.asarray(a), np.asarray(b)
        rtol, atol = 2e-5, 1e-6  # the interpret-test bar
        viol = np.abs(a - b) - (atol + rtol * np.abs(b))
        print(f"{name}: max abs {np.max(np.abs(a-b)):.3e}, "
              f"worst allclose margin {np.max(viol):.3e}", flush=True)
        if not np.isfinite(a).all():
            print(f"{name}: NON-FINITE!", flush=True)
            return 1
        if np.max(viol) > 0:
            bad = np.unravel_index(np.argmax(viol), a.shape)
            print(f"{name}: MISMATCH at {bad}: a={a[bad]!r} b={b[bad]!r}",
                  flush=True)
            return 1

    # h2 mode correctness (vs psi + jnp grad composition not needed here;
    # interpret tests cover math — this is a HW compile/DMA check)
    h_ext = (0.0, 0.0, 0.5)
    s2_k2, h2 = scalar_wavefront(
        s2, cmask, rhs, n_iters=n_iters, emit="h2", h_ext=h_ext
    )
    sync(h2)
    print("h2 mode ran; finite:", bool(np.isfinite(np.asarray(h2)).all()),
          flush=True)

    # ---- timing at 256^3 --------------------------------------------
    Z = Y = X = 256
    s2, cmask, rhs, mf = build(Z, Y, X, seed=2)
    n_iters = 30
    k = _sp_plan(s2.shape, n_iters)
    print(f"plan k={k} at 256^3 (LBM_SP_VMEM={os.environ.get('LBM_SP_VMEM')})",
          flush=True)

    @jax.jit
    def solve(s2):
        out, h2 = scalar_wavefront(
            s2, cmask, rhs, n_iters=n_iters, emit="h2", h_ext=h_ext
        )
        return out, h2

    t0 = time.time()
    out, h2 = solve(s2)
    sync(h2)
    print(f"256^3 compile+first run {time.time()-t0:.1f}s", flush=True)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out, h2 = solve(out)
    sync(h2)
    dt = (time.time() - t0) / reps
    cells = Z * Y * X
    print(f"256^3 30-sweep solve: {dt*1e3:.2f} ms "
          f"({dt/n_iters*1e3:.3f} ms/sweep, "
          f"{cells*n_iters/dt/1e9:.1f} Gcell-sweeps/s)", flush=True)
    print("finite:", bool(np.isfinite(np.asarray(h2)).all()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
