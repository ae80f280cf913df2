"""Hardware validation: N-step full-state parity of the Pallas fast path
vs the jnp path, ON THE REAL CHIP.

VERDICT r2 #3/#2: interpret mode has lied before (the fused_step
unconsumed-DMA bug passed interpreted and faulted hardware), so every
kernel on the default path must earn an on-chip parity check.  The
established bar: 30 steps f32, relative error <= 5e-5 (FMA-level) on
every state field.

Usage:  python tools/hw_validate.py [Z Y X] [steps] [fg_dtype] [--sharded]

``--sharded`` runs the shard_map slab path on a 1-device ('batch'=1,
'z'=1) mesh instead of the single-device fast path: the ghost-plane
kernel variants (slab capillogue/epilogue/capmac, depth-k Poisson halos)
then COMPILE and execute on the real chip — the only hardware validation
of the multi-chip kernels obtainable on one chip (interpret mode has
missed DMA-semaphore bugs before).

Pick the resolution to exercise the config under test:
  * 256 256 256 f32  — compact-ring mac-carry epilogue (emit_mac_mode ->
    "compact") + capmac; capillogue does not fit f32 at 256^2 planes.
  * 64 128 256 f32   — capillogue + emit_rhs + contact3d fit at f32
    (smaller planes): validates the full steady-state fusion stack in f32
    where a 5e-5 bar is meaningful.
  * bfloat16 modes track f32 physics (tests/test_bf16_physics.py), not
    5e-5 parity — use fg_dtype=bfloat16 only for crash/finiteness checks.

Prints one JSON line with per-field max relative errors and pass/fail.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon site hook pins the TPU platform; the env var alone is not
    # enough to force CPU (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

TOL = 5e-5


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b).max(), 1e-30)
    return float(np.abs(a - b).max() / denom)


def main():
    res = (256, 256, 256)
    steps = 30
    dtype = "float32"
    args = sys.argv[1:]
    if len(args) >= 3:
        res = tuple(int(x) for x in args[:3])
        args = args[3:]
    if args and args[0].isdigit():
        steps = int(args[0])
        args = args[1:]
    sharded = "--sharded" in args
    dp = "--dp" in args
    args = [a for a in args if a not in ("--sharded", "--dp")]
    sharded = sharded or dp
    if sharded and not dp:
        # validate the SLAB kernels: at nz == 1 the wrappers would
        # otherwise dispatch the single-device kernels (pure-DP dispatch);
        # --dp validates that dispatch instead
        os.environ["LBM_SLAB_FORCE"] = "1"
    if args:
        dtype = args[0]

    import bench

    from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from lbm_ferrofluid_tpu.models import (
        SimulationParams,
        SimulationRunner,
        ferrofluid_step_impl,
        prime_premac,
    )

    def make_params(use_pallas=True):
        return SimulationParams(
            dim=3, density_gas=0.02381, density_fluid=0.2508,
            rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
            tau_f=0.68, tau_g=0.68, gravity=1e-4, mag_strength=85.0,
            poisson_iters=30, h_dtype=dtype, fg_dtype=dtype,
            use_pallas=use_pallas, mag_flags_shell=True,
        )

    def make(use_pallas):
        p = make_params(use_pallas)
        s = bench.build_state(p, res)
        if use_pallas:
            s = prime_premac(p, s)
        return p, s

    from lbm_ferrofluid_tpu.ops.pallas.capillogue import capillogue_fits
    from lbm_ferrofluid_tpu.ops.pallas.fused_step import emit_mac_mode

    import jax.numpy as jnp

    shape = (1, 19, *res)
    dt_ = jnp.dtype(dtype)
    print(f"config: res={res} steps={steps} dtype={dtype} "
          f"emit_mac_mode={emit_mac_mode(shape, dt_)} "
          f"capillogue_fits={capillogue_fits(shape, dt_)}", flush=True)

    if sharded:
        # shard_map slab path on a 1-device mesh: compiles + executes the
        # ghost-variant kernels on the real chip
        import jax

        from lbm_ferrofluid_tpu.parallel.mesh import make_mesh
        from lbm_ferrofluid_tpu.parallel.sharding import (
            shard_state,
            state_shardings,
        )

        mesh = make_mesh(("batch", "z"), (1, 1), devices=jax.devices()[:1])
        # the same physics constants as the jnp reference (one literal);
        # the sharded state is primed with mesh= below instead
        p_fast = make_params()
        s_fast = shard_state(bench.build_state(p_fast, res), mesh)
        s_fast = prime_premac(p_fast, s_fast, mesh=mesh)
        print(f"sharded path: premac="
              f"{len(s_fast.premac) if s_fast.premac else None}", flush=True)
        step_s = jax.jit(
            lambda s: ferrofluid_step_impl(p_fast, s, mesh=mesh),
            out_shardings=state_shardings(s_fast, mesh),
            donate_argnums=0,
        )
        for _ in range(steps):
            s_fast = step_s(s_fast)
        from lbm_ferrofluid_tpu.models.runner import sync
        sync(s_fast)
        print("sharded path done", flush=True)
    else:
        p_fast, s_fast = make(True)
        runner_fast = SimulationRunner(p_fast, ferrofluid_step_impl)
        s_fast = runner_fast.run(s_fast, steps)
        print("fast path done", flush=True)

    p_ref, s_ref = make(False)
    runner_ref = SimulationRunner(p_ref, ferrofluid_step_impl)
    s_ref = runner_ref.run(s_ref, steps)
    print("jnp path done", flush=True)

    fields = ["f", "g", "h", "density", "vel", "pressure", "force"]
    # the capillogue steady state elides write-only diagnostics
    # (force/phi ride as None) — only compare what the fast state carries
    fields = [n for n in fields if getattr(s_fast, n) is not None]

    def pair(name):
        a, b = getattr(s_fast, name), getattr(s_ref, name)
        if name == "h" and a.shape[1] == 2 and b.shape[1] != 2:
            # scalar tau==1 Poisson carry: compare through the collapse
            # contract (shared helper — masks s_prev to the wall-adjacent
            # cells where the solve actually reads it)
            from lbm_ferrofluid_tpu.ops.scalar_poisson import compare_views

            a, b = compare_views(a, b, s_ref.magnetic_flags)
        return a, b

    errs = {name: rel_err(*pair(name)) for name in fields}
    abs_errs = {
        name: float(np.abs(
            np.asarray(pair(name)[0], np.float64)
            - np.asarray(pair(name)[1], np.float64)
        ).max())
        for name in fields
    }
    check = dtype == "float32"
    # vel's relative bar is growth-aware: its denominator max|v| DECAYS
    # ~30x over the run (an initial pressure transient peaks at |v|~0.26
    # by step 2, then the field settles toward ~0.009), so pure FMA-level
    # noise inflates the rel metric even as the ABSOLUTE error stays
    # sub-1e-6.  Measured on-chip (2026-08-19, 64x128x256 f32, fast vs
    # jnp, bit-identical across contact3d/emit_rhs/tau-spec toggles):
    # step 1 rel 4.4e-7; abs max 8.6e-7 at step 30 while rel reads
    # 1.0e-4.  vel therefore passes on EITHER rel <= 5e-5 or
    # abs <= 5e-6 (5x the measured level, ~0.06% of the settled |v|).
    VEL_ABS_TOL = 5e-6
    ok = (not check) or all(
        e <= TOL or (n == "vel" and abs_errs[n] <= VEL_ABS_TOL)
        for n, e in errs.items()
    )
    finite = all(
        bool(np.isfinite(np.asarray(getattr(s_fast, n), np.float32)).all())
        for n in fields
    )
    print(json.dumps({
        "res": list(res), "steps": steps, "dtype": dtype,
        "sharded": sharded,
        "tol": TOL if check else None,
        "vel_abs_tol": VEL_ABS_TOL if check else None,
        "max_rel_err": errs, "max_abs_err": abs_errs, "finite": finite,
        "ok": bool(ok and finite),
    }), flush=True)
    sys.exit(0 if (ok and finite) else 1)


if __name__ == "__main__":
    main()
