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

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin overrides the env var alone (CLAUDE.md)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


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
    # padded transposed layout: same PHYSICS at the same physical
    # resolution, but the fused fast path engages; mlups counts PHYSICAL
    # cells so the number is comparable to the rosensweig_3d rows
    "rosensweig_3d_tpu": dict(res=(130, 66, 130)),
}


def bench_leg(params, state, steps, warmup=2, sites=None):
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
    if sites is None:
        sites = int(np.prod(state.rho.shape))
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
        sites = int(np.prod(cfg["res"]))  # physical cells

        if params.phys_extent is not None:
            # the un-primed channel leg is NotImplemented on padded
            # layouts (requires the scalar carry) — only leg B runs
            params2, raw2 = getattr(scenes, name)(**cfg)
            primed = prime_premac(params2, raw2)
            mlups_b, dt_b, _ = bench_leg(
                params2, primed, args.steps, sites=sites
            )
            rec_b = {
                "scene": name, "res": list(cfg["res"]),
                "array_res": list(raw2.rho.shape[2:]),
                "leg": "padded_fast_path",
                "engaged": primed.h.shape[1] == 2,
                "mac_carry": primed.premac is not None,
                "mlups_phys": round(mlups_b, 2),
                "seconds": round(dt_b, 3), "steps": args.steps,
                "backend": jax.default_backend(),
            }
            print(json.dumps(rec_b), flush=True)
            out.append(rec_b)
            continue

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
