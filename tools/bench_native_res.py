"""MLUPS at the reference demos' NATIVE (lane-unaligned) resolutions.

Round-4 verdict #1: every reference demo default is unaligned
(demo_3d_LBM_Rosensweig_instability.py:253 -> [130, 66, 130],
demo_3d_LBM_two_droplets.py:259 -> [50, 50, 193],
demo_2d_LBM_two_droplets.py:256 -> [98, 384]), where the Pallas fast path
cannot engage — so what a reference user actually measures is the jnp
path.  This benches exactly that, A/B:

  A  channel-form jnp step (the un-primed state: Q-channel magnetic solve)
  B  scalar tau==1 carry (prime_premac; exact-order jnp sweeps)

Usage:  python tools/bench_native_res.py [--steps N] [--scenes a,b,...]
Writes one JSON line per (scene, leg).  Run on TPU (default) or CPU
(JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from lbm_ferrofluid_tpu.models import scenes  # noqa: E402
from lbm_ferrofluid_tpu.models.ferrofluid import (  # noqa: E402
    ferrofluid_step_impl,
    prime_premac,
)
from lbm_ferrofluid_tpu.models.runner import sync  # noqa: E402

SCENES = {
    "rosensweig_3d": dict(res=(130, 66, 130)),
    "two_droplets_3d": dict(res=(50, 50, 193)),
    "two_droplets_2d": dict(res=(98, 384)),
}


def bench_leg(params, state, steps, warmup=2):
    @partial(jax.jit, donate_argnums=0)
    def chunk(st):
        def body(carry, _):
            return ferrofluid_step_impl(params, carry), None

        st, _ = jax.lax.scan(body, st, None, length=steps)
        return st

    for _ in range(warmup):
        state = chunk(state)
    sync(state)
    t0 = time.perf_counter()
    state = chunk(state)
    sync(state)
    dt = time.perf_counter() - t0
    sites = int(np.prod(state.rho.shape)) * 1
    return sites * steps / dt / 1e6, dt, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scenes", type=str, default=",".join(SCENES))
    args = ap.parse_args()

    out = []
    for name in args.scenes.split(","):
        cfg = SCENES[name]
        params, raw = getattr(scenes, name)(**cfg)

        mlups_a, dt_a, _ = bench_leg(params, raw, args.steps)
        rec_a = {
            "scene": name, "res": list(cfg["res"]), "leg": "channel_jnp",
            "mlups": round(mlups_a, 2), "seconds": round(dt_a, 3),
            "steps": args.steps, "backend": jax.default_backend(),
        }
        print(json.dumps(rec_a), flush=True)

        params2, raw2 = getattr(scenes, name)(**cfg)
        primed = prime_premac(params2, raw2)
        engaged = primed.h.shape[1] == 2
        mlups_b, dt_b, _ = bench_leg(params2, primed, args.steps)
        rec_b = {
            "scene": name, "res": list(cfg["res"]), "leg": "scalar_carry",
            "engaged": engaged, "mlups": round(mlups_b, 2),
            "seconds": round(dt_b, 3), "steps": args.steps,
            "speedup": round(mlups_b / mlups_a, 2),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec_b), flush=True)
        out += [rec_a, rec_b]
    return out


if __name__ == "__main__":
    main()
