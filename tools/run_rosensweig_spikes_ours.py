"""Run OUR 3D Rosensweig scene from the reference run's exact initial
condition and compare spike-pattern statistics at each stored snapshot.

Usage:  python tools/run_rosensweig_spikes_ours.py [f32|turbo]

Loads tests/golden/rosensweig3d_spikes_ref.npz (produced by
tools/run_rosensweig_spikes_ref.py — perturbed init + density snapshots
every 500 steps), runs the same number of steps with the TPU-native solver
(fast path on TPU; jnp path on CPU), and reports the spike metrics
(tools/spike_metric.py): dominant wavenumber, amplitude ratio and
height-field correlation per snapshot.  Writes
tests/golden/rosensweig3d_spikes_ours_<mode>.npz and prints a JSON summary.
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

from tools.spike_metric import compare_runs, interface_height, spike_stats  # noqa: E402

GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


def main(mode: str = "f32"):
    ref = np.load(GOLDEN / "rosensweig3d_spikes_ref.npz")
    have = sorted(int(k.split("_")[1]) for k in ref.files
                  if k.startswith("den_"))
    assert have, "reference spike run has no snapshots yet"
    # run the full planned horizon even if the (slow, incremental) reference
    # run hasn't landed all snapshots yet — ours are stored for later compare
    snaps = list(range(have[0], max(have[-1], 4000) + 1, have[0]))

    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        SimulationRunner,
        ferrofluid_step_impl,
        init_ferrofluid_state,
        prime_premac,
    )

    dt = "bfloat16" if mode == "turbo" else "float32"
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508,
        kappa=0.01, tau_f=0.68, tau_g=0.68,
        gravity=float(ref["gravity"]), mag_strength=float(ref["mag"]),
        poisson_iters=30, fg_dtype=dt, h_dtype=dt,
        mag_flags_shell=True,
    )
    res = ref["flags"].shape[2:]
    vel0 = np.zeros((1, 3, *res), np.float32)
    state = init_ferrofluid_state(
        params, ref["rho0"].astype(np.float32), ref["den0"].astype(np.float32),
        vel0, ref["flags"], ref["mflags"],
    )
    state = prime_premac(params, state)
    runner = SimulationRunner(params, ferrofluid_step_impl)

    out = {"mode": mode, "snapshots": {}}
    save = {}
    out_path = GOLDEN / f"rosensweig3d_spikes_ours_{mode}.npz"
    prev = 0
    for step in snaps:
        state = runner.run(state, step - prev)
        prev = step
        den = np.asarray(state.density, np.float32)
        save[f"den_{step}"] = den
        # incremental save: a partial run still yields usable data
        np.savez(out_path, **save, mag=ref["mag"], gravity=ref["gravity"])
        s = spike_stats(interface_height(den[0, 0]))
        line = (f"step {step}: ours k={s['k_dominant']} "
                f"amp_std={s['amp_std']:.4f}")
        if f"den_{step}" in ref.files:
            m = compare_runs(ref[f"den_{step}"][0, 0], den[0, 0])
            out["snapshots"][step] = {
                k: (v if not isinstance(v, (np.floating, np.bool_)) else
                    (float(v) if isinstance(v, np.floating) else bool(v)))
                for k, v in m.items()
            }
            line += (f" | ref k={m['ref']['k_dominant']} "
                     f"amp_ratio={m['amp_ratio']:.3f} "
                     f"corr={m['height_correlation']:.3f}")
        print(line, flush=True)

    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "f32")
