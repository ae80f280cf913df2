"""Scalar-wavefront timing on TPU — scan-chunked, scalar-readback sync.

(First version read back the full 128 MB s2 through the tunnel per rep —
~4.7 s of transfer that swamped the ~2.4 ms kernel.  Lesson: sync() picks
the smallest LEAF; pass it a state-like tuple that includes a scalar.)
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
import lbm_ferrofluid_tpu.ops.pallas.scalar_poisson as sp
from lbm_ferrofluid_tpu.models.runner import sync
from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache


def build(z, y, x, seed=0):
    rng = np.random.default_rng(seed)
    mf = np.full((1, 1, z, y, x), int(CellType.OBSTACLE), np.uint8)
    mf[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    mf = jnp.asarray(mf)
    mask = np.asarray(fluid_mask(mf))
    s = rng.uniform(-1, 1, (1, 1, z, y, x)).astype(np.float32) * mask
    sp_ = rng.uniform(-1, 1, (1, 1, z, y, x)).astype(np.float32) * mask
    s2 = jnp.asarray(np.concatenate([s, sp_], axis=1))
    rhs = jnp.asarray(rng.uniform(-1e-2, 1e-2, (1, 1, z, y, x)).astype(np.float32))
    return s2, make_cmask(mf), rhs


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    Z = Y = X = 256
    s2, cmask, rhs = build(Z, Y, X)
    N = 20  # solves per timed chunk

    cases = [
        ("k15 h2 n30", None, 30, "h2"),
        ("k15 psi n30", None, 30, "psi"),
        ("k30 h2 n30", 100 * 1024 * 1024, 30, "h2"),
        ("k10 h2 n30", 40 * 1024 * 1024, 30, "h2"),
        ("k6 h2 n30", 26 * 1024 * 1024, 30, "h2"),
    ]
    for name, vmem, n_iters, emit in cases:
        if vmem is None:
            os.environ.pop("LBM_SP_VMEM", None)
        else:
            os.environ["LBM_SP_VMEM"] = str(vmem)
        k = sp._sp_plan(s2.shape, n_iters)
        kw = dict(n_iters=n_iters, emit=emit)
        if emit == "h2":
            kw["h_ext"] = (0.0, 0.0, 0.5)

        @jax.jit
        def chunk(s2_, kw=kw):
            def body(c, _):
                out, aux = sp.scalar_wavefront(c, cmask, rhs, **kw)
                return out, aux[0, 0, 0, 0]
            out, auxs = jax.lax.scan(body, s2_, None, length=N)
            return out, auxs[-1]

        try:
            t0 = time.time()
            out, a = chunk(s2)
            sync(a)
            tc = time.time() - t0
            t0 = time.time()
            out, a = chunk(out)
            sync(a)
            dt = (time.time() - t0) / N
            print(f"{name}: plan k={k}, {dt*1e3:.2f} ms/solve "
                  f"({dt/n_iters*1e3:.3f} ms/sweep) [compile {tc:.0f}s]",
                  flush=True)
        except Exception as e:
            print(f"{name}: plan k={k}, FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
