"""Runner, diagnostics, and checkpoint/resume tests."""

import numpy as np
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    SimulationRunner,
    init_singlephase_state,
    singlephase_step,
    singlephase_step_impl,
)
from lbm_ferrofluid_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from lbm_ferrofluid_tpu.utils.diagnostics import diagnostics


def _make(params, res=(16, 16)):
    flags = np.full((1, 1, *res), int(CellType.FLUID), np.uint8)
    rho = np.full((1, 1, *res), 0.265, np.float32)
    rng = np.random.default_rng(7)
    vel = rng.uniform(-0.05, 0.05, (1, 2, *res)).astype(np.float32)
    return init_singlephase_state(params, rho, vel, flags)


def test_runner_scan_matches_eager():
    params = SimulationParams(dim=2, tau=0.8)
    a = _make(params)
    for _ in range(7):
        a = singlephase_step(params, a)

    runner = SimulationRunner(params, singlephase_step_impl)
    b = runner.run(_make(params), 7)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f), rtol=1e-6)
    assert int(b.step) == 7


def test_runner_io_hook():
    params = SimulationParams(dim=2, tau=0.8)
    runner = SimulationRunner(params, singlephase_step_impl)
    seen = []
    runner.run(_make(params), 10, io_interval=3, io_fn=lambda s: seen.append(int(s.step)))
    assert seen == [3, 6, 9, 10]


def test_benchmark_reports_mlups():
    params = SimulationParams(dim=2, tau=0.8)
    runner = SimulationRunner(params, singlephase_step_impl)
    _, stats = runner.benchmark(_make(params), n_steps=4, warmup=1)
    assert stats["mlups"] > 0
    assert stats["sites"] == 16 * 16


def test_checkpoint_roundtrip(tmp_path):
    params = SimulationParams(dim=2, tau=0.8)
    state = _make(params)
    for _ in range(3):
        state = singlephase_step(params, state)

    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, state)

    template = _make(params)
    restored = load_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(state.f), np.asarray(restored.f))
    assert int(restored.step) == 3

    # deterministic resume: stepping restored == stepping original
    a = singlephase_step(params, state)
    b = singlephase_step(params, restored)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))


def test_diagnostics():
    params = SimulationParams(dim=2, tau=0.8)
    state = _make(params)
    d = diagnostics(state.rho, state.vel)
    assert bool(d["finite"])
    np.testing.assert_allclose(float(d["mass"]), 0.265 * 256, rtol=1e-5)
    assert float(d["max_speed"]) <= 0.05 * np.sqrt(2) + 1e-6


def test_checkpoint_ferrofluid_bf16(tmp_path):
    """Checkpoint/resume works for the ferrofluid state including tuple
    fields and bfloat16 h-storage (saved widened to f32, restored exactly)."""
    from lbm_ferrofluid_tpu.models import (
        ferrofluid_step,
        init_ferrofluid_state,
    )

    res = (8, 8, 8)
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508,
        mag_strength=85.0, poisson_iters=3, h_dtype="bfloat16",
    )
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((1, 1, *res), params.rho_gas, np.float32)
    den = np.full((1, 1, *res), params.density_gas, np.float32)
    rho[..., :4, :] = params.rho_fluid
    den[..., :4, :] = params.density_fluid

    def fresh():
        return init_ferrofluid_state(
            params, rho, den, np.zeros((1, 3, *res), np.float32), flags, mflags
        )

    state = fresh()
    state = ferrofluid_step(params, state)
    path = tmp_path / "ferro.npz"
    save_checkpoint(path, state)
    restored = load_checkpoint(path, fresh())
    assert restored.h.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(state.h, np.float32), np.asarray(restored.h, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(state.f), np.asarray(restored.f))
    # deterministic resume
    a = ferrofluid_step(params, state)
    b = ferrofluid_step(params, restored)
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))


def test_checkpoint_premac_tuple(tmp_path):
    """A mac-carried state (premac tuple of separate arrays) checkpoints
    and restores: with a matching template the tuple round-trips exactly;
    with a fresh template (premac=None) the restore degrades gracefully
    and the state can simply be re-primed."""
    import dataclasses

    from lbm_ferrofluid_tpu.models import (
        ferrofluid_step,
        init_ferrofluid_state,
    )

    res = (8, 8, 8)
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508,
        mag_strength=85.0, poisson_iters=3,
    )
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((1, 1, *res), params.rho_gas, np.float32)
    den = np.full((1, 1, *res), params.density_gas, np.float32)
    rho[..., :4, :] = params.rho_fluid
    den[..., :4, :] = params.density_fluid

    def fresh():
        return init_ferrofluid_state(
            params, rho, den, np.zeros((1, 3, *res), np.float32), flags,
            mflags,
        )

    state = ferrofluid_step(params, fresh())
    # emulate the TPU fast path's mac-carry structure (prime_premac is a
    # no-op on CPU): a 6-tuple incl. the pre-scaled rhs
    premac = (
        state.rho, state.vel, state.density,
        jnp.sum(state.g, axis=1, keepdims=True),
        jnp.zeros_like(state.vel), jnp.zeros_like(state.rho),
    )
    state = dataclasses.replace(state, premac=premac)

    path = tmp_path / "premac.npz"
    save_checkpoint(path, state)

    template = dataclasses.replace(
        fresh(), premac=tuple(jnp.zeros_like(x) for x in premac)
    )
    restored = load_checkpoint(path, template)
    assert isinstance(restored.premac, tuple) and len(restored.premac) == 6
    for a, b in zip(state.premac, restored.premac):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fresh template: premac leaves are simply absent from the structure
    plain = load_checkpoint(path, fresh())
    assert plain.premac is None
    np.testing.assert_array_equal(np.asarray(state.f), np.asarray(plain.f))
