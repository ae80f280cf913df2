"""Every demo scene builds and steps without NaNs at tiny resolution."""

import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu.models import (
    ferrofluid_step,
    hcz_step,
    sc_step,
    scenes,
    singlephase_step,
)

CASES = [
    ("shear_layer", lambda: scenes.shear_layer((24, 24)), singlephase_step),
    ("shear_layer_kbc", lambda: scenes.shear_layer((24, 24), kbc=True), singlephase_step),
    ("sc", lambda: scenes.multiphase_drop_sc((24, 24)), sc_step),
    ("hcz", lambda: scenes.multiphase_drop_hcz((24, 24)), hcz_step),
    ("wave", lambda: scenes.wave((24, 24)), hcz_step),
    ("droplet_spread_2d", lambda: scenes.droplet_spread_2d((24, 24)), hcz_step),
    ("two_droplets_2d", lambda: scenes.two_droplets_2d((16, 48)), ferrofluid_step),
    ("rosensweig_2d", lambda: scenes.rosensweig_2d((24, 24)), ferrofluid_step),
    ("multiphase_3d", lambda: scenes.multiphase_3d((12, 12, 12)), hcz_step),
    ("droplet_spread_3d", lambda: scenes.droplet_spread_3d((12, 12, 12)), hcz_step),
    ("two_droplets_3d", lambda: scenes.two_droplets_3d((10, 10, 24)), ferrofluid_step),
    ("rosensweig_3d", lambda: scenes.rosensweig_3d((12, 10, 12)), ferrofluid_step),
]


@pytest.mark.parametrize("name,build,step", CASES, ids=[c[0] for c in CASES])
def test_scene_steps_finite(name, build, step):
    params, state = build()
    params = params.replace(poisson_iters=min(params.poisson_iters, 3))
    for _ in range(2):
        state = step(params, state)
    assert bool(jnp.isfinite(state.f).all()), f"{name}: non-finite f"
    assert bool(jnp.isfinite(state.vel).all()), f"{name}: non-finite vel"
    assert int(state.step) == 2


def test_mag_flags_shell_validation():
    """init_ferrofluid_state rejects mag_flags_shell=True when the magnetic
    flags have OBSTACLE cells outside the x-edge-columns + z-edge-planes
    shell (the psi ghost refresh would silently corrupt the multi-chip
    solve there — parallel/step3d.py:_psi_refresh_ghosts)."""
    import numpy as np

    from lbm_ferrofluid_tpu import CellType
    from lbm_ferrofluid_tpu.models import SimulationParams, init_ferrofluid_state

    res = (8, 8, 8)
    params = SimulationParams(
        dim=3, mag_strength=10.0, poisson_iters=2, mag_flags_shell=True,
    )
    flags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    rho = np.full((1, 1, *res), params.rho_gas, np.float32)
    vel = np.zeros((1, 3, *res), np.float32)

    mflags = np.full((1, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    # the shell pattern passes
    init_ferrofluid_state(params, rho, rho, vel, flags, mflags)

    # an interior obstacle (or y-edge walls, as in two_droplets_3d) fails
    bad = mflags.copy()
    bad[..., 4, 4, 4] = int(CellType.OBSTACLE)
    with pytest.raises(ValueError, match="mag_flags_shell"):
        init_ferrofluid_state(params, rho, rho, vel, flags, bad)

    # prime_premac re-validates, catching states that bypassed init (e.g.
    # checkpoint resume or a replaced flags field under a shell-declaring
    # params)
    from lbm_ferrofluid_tpu.models import prime_premac

    state = init_ferrofluid_state(
        params.replace(mag_flags_shell=False), rho, rho, vel, flags, bad
    )
    with pytest.raises(ValueError, match="mag_flags_shell"):
        prime_premac(params, state)
