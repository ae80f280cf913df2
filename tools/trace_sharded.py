#!/usr/bin/env python
"""Device-trace the sharded-on-1-device step vs the single-device step.

The measured slab overhead (docs/PERFORMANCE.md: 38% / 48% at 256^3 turbo)
needs a per-op breakdown to attack.  This runs N steps of the chosen
configuration under ``jax.profiler`` and prints the top device ops by
total duration, plus writes the aggregate to a JSON next to the logdir so
the analysis survives a TPU-worker crash.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_sharded.py \
        [single|sharded|sharded-fullh][-scan] [Z Y X] [steps]

A ``-scan`` suffix traces the PRODUCTION form — one jitted lax.scan chunk
of ``steps`` steps (same shape as SimulationRunner._chunk) — instead of
per-step dispatch.  Scanned and dispatched runs differ materially: each
dispatch pays a tunnel RPC (~4 ms at 256^3) and buffer-donation pins
differ inside a while carry (docs/PERFORMANCE.md, scan-vs-dispatch
aliasing), so overhead attribution must come from the scanned trace.

Traces land in /tmp/trace_<mode>/ ; the summary in /tmp/trace_<mode>.json.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_trace(logdir: str, top: int = 40) -> list[dict]:
    """Aggregate device-track event durations by name from the newest
    .trace.json.gz under ``logdir``."""
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print(f"no trace files under {logdir}", flush=True)
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: process names containing TPU / device; fall back to
    # aggregating everything with a duration if metadata is absent
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {
        p for p, n in pid_name.items()
        if ("TPU" in n or "device" in n.lower()) and "python" not in n.lower()
    }
    agg: dict[str, list[float]] = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        agg.setdefault(ev["name"], []).append(ev["dur"])
    rows = [
        {"name": k, "total_us": round(sum(v), 1), "count": len(v),
         "mean_us": round(sum(v) / len(v), 1)}
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:top]


def main():
    mode = "sharded"
    res = (256, 256, 256)
    steps = 3
    args = sys.argv[1:]
    if args and not args[0].isdigit():
        mode = args[0]
        args = args[1:]
    if len(args) >= 3:
        res = tuple(int(x) for x in args[:3])
        args = args[3:]
    if args:
        steps = int(args[0])

    scan = mode.endswith("-scan")
    if scan:
        mode = mode[: -len("-scan")]
    if mode.startswith("sharded"):
        # trace the SLAB kernels: at nz == 1 the wrappers would otherwise
        # dispatch the single-device kernels (pure-DP dispatch)
        os.environ["LBM_SLAB_FORCE"] = "1"

    import jax

    import bench

    from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        ferrofluid_step_impl,
        prime_premac,
    )
    from lbm_ferrofluid_tpu.models.runner import sync

    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=30, h_dtype="bfloat16", fg_dtype="bfloat16",
        mag_flags_shell=True,
    )

    if mode == "single":
        state = bench.build_state(params, res)
        state = prime_premac(params, state)
        step1 = lambda s: ferrofluid_step_impl(params, s)  # noqa: E731
        out_sh = None
    else:
        from lbm_ferrofluid_tpu.parallel.mesh import make_mesh
        from lbm_ferrofluid_tpu.parallel.sharding import (
            shard_state, state_shardings,
        )

        if mode == "sharded-fullh":
            params = params.replace(poisson_psi_halo=False)
        mesh = make_mesh(("batch", "z"), (1, 1), devices=jax.devices()[:1])
        state = bench.build_state(params, res)
        state = shard_state(state, mesh)
        state = prime_premac(params, state, mesh=mesh)
        step1 = lambda s: ferrofluid_step_impl(params, s, mesh=mesh)  # noqa: E731
        out_sh = state_shardings(state, mesh)

    tag = f"{mode}-scan" if scan else mode
    if scan:
        # the production form: one XLA program advancing `steps` steps
        def chunk_fn(s):
            s, _ = jax.lax.scan(lambda c, _: (step1(c), None), s, None,
                                length=steps)
            return s

        step = jax.jit(chunk_fn, donate_argnums=0,
                       **({"out_shardings": out_sh} if out_sh else {}))
        per_call_steps = steps
    else:
        step = jax.jit(step1, donate_argnums=0,
                       **({"out_shardings": out_sh} if out_sh else {}))
        per_call_steps = 1

    # warmup/compile
    t0 = time.perf_counter()
    state = step(state)
    sync(state)
    print(f"[{tag}] compiled+call0 in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    state = step(state)
    sync(state)
    per = (time.perf_counter() - t0) / per_call_steps
    sites = int(np.prod(res))
    print(f"[{tag}] {per*1e3:.1f} ms/step = {sites/per/1e6:.1f} MLUPS",
          flush=True)

    logdir = f"/tmp/trace_{tag}"
    jax.profiler.start_trace(logdir)
    for _ in range(steps if not scan else 1):
        state = step(state)
    sync(state)
    jax.profiler.stop_trace()

    rows = parse_trace(logdir)
    out = {"mode": tag, "res": list(res), "steps": steps,
           "ms_per_step": round(per * 1e3, 2),
           "mlups": round(sites / per / 1e6, 1), "top_ops": rows}
    with open(f"/tmp/trace_{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    total = sum(r["total_us"] for r in rows)
    print(f"top ops (sum {total/1e3:.1f} ms over {steps} steps):")
    for r in rows[:30]:
        print(f"  {r['total_us']/1e3/steps:8.3f} ms/step  x{r['count']:<4d}"
              f" {r['name'][:90]}")
    print(json.dumps({"trace_summary": f"/tmp/trace_{tag}.json"}))


if __name__ == "__main__":
    main()
