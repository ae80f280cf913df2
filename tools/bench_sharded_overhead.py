"""Measure the sharded fast path's per-chip overhead on ONE real chip.

VERDICT r2 #4: the ghost-plane kernel variants + shard_map glue had never
been timed on hardware.  Running the shard_map path on a 1-device
('batch'=1, 'z'=1) mesh at the flagship resolution measures exactly the
cost delta of the slab-mode kernel machinery (ghost refs in place of wrap
DMAs, depth-k Poisson halo exchange that degenerates to self-permutes,
boundary mac fix-ups) against the single-device kernels — the only
multi-chip performance evidence obtainable on one chip.

Usage:  python tools/bench_sharded_overhead.py [Z Y X] [steps]
Prints one JSON line: single-chip MLUPS, sharded-on-1 MLUPS, overhead %,
and the implied N-chip aggregate projection MLUPS(N) = N * per_chip *
(1 - overhead) for N in {4, 8, 16}.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    res = (256, 256, 256)
    steps = 20
    args = sys.argv[1:]
    if len(args) >= 3:
        res = tuple(int(x) for x in args[:3])
        args = args[3:]
    if args:
        steps = int(args[0])

    import jax

    import bench

    from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        SimulationRunner,
        ferrofluid_step_impl,
        prime_premac,
    )
    from lbm_ferrofluid_tpu.parallel.mesh import make_mesh
    from lbm_ferrofluid_tpu.parallel.sharding import shard_state

    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
        poisson_iters=30, h_dtype="bfloat16", fg_dtype="bfloat16",
        mag_flags_shell=True,
        # LBM_SLIVER=1 A/Bs the round-5 s_prev sliver exchange (on a
        # 1-chip slab-forced run its ICI saving is invisible — the
        # collectives are self-permutes — but its glue/launch cost is
        # measurable: 647.7 vs 706.3 MLUPS, the measured-negative
        # result behind its off-by-default gate)
        scalar_sliver=os.environ.get("LBM_SLIVER", "0") == "1",
    )
    sites = int(np.prod(res))

    # --- single-chip fast path ------------------------------------------
    state = bench.build_state(params, res)
    state = prime_premac(params, state)
    runner = SimulationRunner(params, ferrofluid_step_impl)
    state, stats = runner.benchmark(state, n_steps=steps, warmup=2, repeats=1)
    single = stats["mlups"]
    print(f"single-chip: {single:.1f} MLUPS", flush=True)

    # --- shard_map path on a 1-device mesh ------------------------------
    # A/B the tau=1 psi ghost refresh (step3d._psi_refresh_ghosts): on one
    # device its ring exchanges are self-permutes, so the delta isolates
    # the reconstruction math's compute cost (the ICI saving needs a slice)
    #
    # Scan-chunked through the SAME SimulationRunner as the single-chip
    # leg: a per-step Python dispatch pays a tunnel RPC per step (~4 ms
    # at 256^3, measured), which a production run — scanned on either
    # path — never pays.  Timing the sharded leg per-step while the
    # single leg scanned overstated the slab overhead (25.7% dispatched
    # per-step vs 19.1% scanned, and it charged the psi-halo mode a
    # phantom 6.6% "recompute" cost that is actually dispatch: scanned,
    # psi-halo and full-h run within 0.3% of each other, 2026-08-19).
    # Slab machinery under test: at nz == 1 the wrappers would otherwise
    # dispatch the single-device kernels (pure-DP dispatch, step3d.py:
    # _dp_dispatch) and measure nothing
    os.environ["LBM_SLAB_FORCE"] = "1"
    mesh = make_mesh(("batch", "z"), (1, 1), devices=jax.devices()[:1])
    sharded = {}
    scalar_carried = mac_carried = False
    # A/B the tau=1 SCALAR Poisson carry (round 4) against the 19-channel
    # slab solve: the production config primes the (s, s_prev) pair
    # (2-channel ghost bands, in-kernel h2); mag_flags_shell=False gates
    # it off (gating only — the flags ARE the shell either way).  NOTE:
    # the same flag also gates the round-3 psi ghost refresh, so the
    # channel leg runs the FULL-H band exchange structure — on this
    # 1-device box that is compute-equivalent to the psi-halo variant
    # (measured identical, docs/PERFORMANCE.md), but on a real slice the
    # psi refresh would narrow the channel leg's ICI gap.
    for variant in ("scalar", "channel"):
        # round 5: mag_flags_shell=False no longer forces the channel
        # form (the concrete boundary-only gate admits the geometry
        # anyway) — scalar_carry=False is the explicit A/B switch
        params_s = params if variant == "scalar" else params.replace(
            mag_flags_shell=False, scalar_carry=False
        )
        state_s = bench.build_state(params_s, res)
        state_s = shard_state(state_s, mesh)
        state_s = prime_premac(params_s, state_s, mesh=mesh)
        if variant == "scalar":  # report the production priming status
            mac_carried = state_s.premac is not None
            scalar_carried = state_s.h.shape[1] == 2
        runner_s = SimulationRunner(
            params_s, lambda p, s, m=mesh: ferrofluid_step_impl(p, s, mesh=m)
        )
        _, stats_s = runner_s.benchmark(
            state_s, n_steps=steps, warmup=2, repeats=1
        )
        sharded[variant] = stats_s["mlups"]
        print(f"shard_map-on-1[{variant}]: "
              f"{sharded[variant]:.1f} MLUPS "
              f"({stats_s['seconds']:.2f}s/{steps} steps)", flush=True)

    # Pure-DP leg: same 1-device mesh with the DP dispatch active (the
    # wrappers run the single-device kernels inside shard_map) — the
    # per-chip cost of data-parallel scaling, expected ~= single-chip
    del os.environ["LBM_SLAB_FORCE"]
    params_dp = params
    state_dp = bench.build_state(params_dp, res)
    state_dp = shard_state(state_dp, mesh)
    state_dp = prime_premac(params_dp, state_dp, mesh=mesh)
    runner_dp = SimulationRunner(
        params_dp, lambda p, s, m=mesh: ferrofluid_step_impl(p, s, mesh=m)
    )
    _, stats_dp = runner_dp.benchmark(state_dp, n_steps=steps, warmup=2,
                                      repeats=1)
    dp = stats_dp["mlups"]
    print(f"shard_map-on-1[dp_dispatch]: {dp:.1f} MLUPS", flush=True)

    overhead = 1.0 - sharded["scalar"] / single
    out = {
        "res": list(res), "steps": steps,
        "single_chip_mlups": round(single, 1),
        "sharded_1dev_mlups": round(sharded["scalar"], 1),
        "sharded_1dev_mlups_channel_solve": round(sharded["channel"], 1),
        "scalar_vs_channel_slab_gain_pct": round(
            100 * (sharded["scalar"] / sharded["channel"] - 1.0), 2
        ),
        "dp_dispatch_mlups": round(dp, 1),
        "dp_overhead_pct": round(100 * (1.0 - dp / single), 2),
        "overhead_pct": round(100 * overhead, 2),
        "sharded_mac_carry": bool(mac_carried),
        "sharded_scalar_carry": bool(scalar_carried),
        "projection_note": "aggregate(N) = N * sharded_1dev (per-chip slab "
                           "cost measured; ICI exchange latency NOT "
                           "included — needs a real multi-chip slice)",
        "aggregate_projection": {
            str(n): round(n * sharded["scalar"], 1) for n in (4, 8, 16, 32)
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
