"""Device-trace one scalar-wavefront pass to find where time goes."""

import glob
import gzip
import json
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
from lbm_ferrofluid_tpu.utils.profiling import trace


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
    n_iters = int(os.environ.get("N_ITERS", "15"))
    Z = Y = X = 256
    s2, cmask, rhs = build(Z, Y, X)
    print("plan k:", sp._sp_plan(s2.shape, n_iters), flush=True)

    fn = jax.jit(lambda s2_: sp.scalar_wavefront(
        s2_, cmask, rhs, n_iters=n_iters, emit="psi")[0])
    out = fn(s2)
    sync(out)
    t0 = time.time()
    out = fn(out)
    sync(out)
    print(f"warm pass: {time.time()-t0:.3f}s", flush=True)

    logdir = "/tmp/sp_trace"
    os.system(f"rm -rf {logdir}")
    with trace(logdir):
        out = fn(out)
        sync(out)
    # summarize trace events
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and e.get("dur", 0) > 0]
        # aggregate by name
        agg = {}
        for e in evs:
            nm = e["name"][:80]
            agg.setdefault(nm, [0, 0.0])
            agg[nm][0] += 1
            agg[nm][1] += e["dur"] / 1e3  # ms
        top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]
        for nm, (cnt, ms) in top:
            print(f"{ms:10.2f} ms  x{cnt:<6} {nm}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
