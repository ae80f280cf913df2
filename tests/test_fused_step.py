"""Ring-pipelined prologue/epilogue kernels vs the classic kernel pair
(interpret mode on CPU): macro fields and post-collision distributions must
be bit-identical."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops.pallas.fused_step import (
    fused_step_supported,
    lbm_epilogue,
    lbm_prologue,
)
from lbm_ferrofluid_tpu.ops.pallas.hcz3d import hcz_collide_fused
from lbm_ferrofluid_tpu.ops.pallas.stream3d import (
    stream_bounce_macro,
    stream_bounce_moments,
)

C = 1.0
RHO_GAS, RHO_FLUID = 0.02381, 0.2508


def _setup(dtype):
    Z, Y, X = 6, 8, 128
    rng = np.random.default_rng(9)
    f = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    f, g = f.astype(dtype), g.astype(dtype)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rho_old = jnp.asarray(rng.uniform(0.1, 1.0, (1, 1, Z, Y, X)), jnp.float32)
    vel_old = jnp.asarray(
        rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)), jnp.float32
    )
    return f, g, flags, rho_old, vel_old


def test_supported():
    assert fused_step_supported(D3Q19, (1, 19, 6, 8, 128))
    assert not fused_step_supported(D3Q19, (1, 19, 6, 8, 128), kbc_type=2)
    assert not fused_step_supported(D3Q19, (1, 19, 2, 8, 128))  # Z < 4
    assert not fused_step_supported(D3Q19, (1, 19, 6, 8, 130))


def test_emit_mac_mode_gate():
    from lbm_ferrofluid_tpu.ops.pallas.fused_step import (
        emit_mac_fits,
        emit_mac_mode,
    )

    # the flagship 256^3 configs: bf16 keeps the proven full layout; f32's
    # full rings measured OOM on v5e -> compact
    assert emit_mac_mode((1, 19, 256, 256, 256), jnp.bfloat16) == "full"
    assert emit_mac_mode((1, 19, 256, 256, 256), jnp.float32) == "compact"
    # smaller planes fit the full layout even at f32
    assert emit_mac_mode((1, 19, 64, 128, 256), jnp.float32) == "full"
    # absurd planes fit nothing
    assert emit_mac_mode((1, 19, 16, 1024, 1024), jnp.float32) is None
    assert emit_mac_fits((1, 19, 256, 256, 256), jnp.float32)


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_prologue_matches_classic(dtype):
    f, g, flags, rho_old, vel_old = _setup(jnp.dtype(dtype))
    kw = dict(c=C, rho_gas=RHO_GAS, rho_fluid=RHO_FLUID,
              density_gas=RHO_GAS, density_fluid=RHO_FLUID)

    _, rho_ref, vel_ref, den_ref = stream_bounce_macro(
        f, flags, rho_old, vel_old, interpret=True, **kw
    )
    _, m0_ref, m1_ref = stream_bounce_moments(g, flags, interpret=True)

    rho, vel, den, m0g, m1g = lbm_prologue(
        f, g, flags, rho_old, vel_old, interpret=True, **kw
    )
    for got, want, name in [
        (rho, rho_ref, "rho"), (vel, vel_ref, "vel"),
        (den, den_ref, "density"), (m0g, m0_ref, "m0g"),
        (m1g, m1_ref, "m1g"),
    ]:
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name
        )


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_epilogue_matches_classic(dtype):
    f, g, flags, rho_old, vel_old = _setup(jnp.dtype(dtype))
    Z, Y, X = f.shape[2:]
    rng = np.random.default_rng(10)

    kw = dict(c=C, rho_gas=RHO_GAS, rho_fluid=RHO_FLUID,
              density_gas=RHO_GAS, density_fluid=RHO_FLUID)
    f_post, rho, vel, den = stream_bounce_macro(
        f, flags, rho_old, vel_old, interpret=True, **kw
    )
    g_post, _, _ = stream_bounce_moments(g, flags, interpret=True)

    pressure = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dfai = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dprho = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)

    f_ref, g_ref = hcz_collide_fused(
        f_post, g_post, rho, vel, den, pressure, flags, force, dfai, dprho,
        tau_f=0.68, tau_g=0.68, interpret=True,
    )
    f_new, g_new = lbm_epilogue(
        f, g, flags, rho, vel, den, pressure, force, dfai, dprho,
        tau_f=0.68, tau_g=0.68, interpret=True,
    )
    if dtype == "bfloat16":
        # storage rounding absorbs compiler FMA-contraction differences
        np.testing.assert_array_equal(np.asarray(f_new), np.asarray(f_ref))
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))
    else:
        # the two kernels are separate XLA programs; the CPU backend
        # contracts mul+add to FMA differently around the re-stream vs the
        # buffer load, so f32 differs at the ulp level (amplified by the
        # geq cancellation in the g update) — well under golden tolerances
        np.testing.assert_allclose(
            np.asarray(f_new), np.asarray(f_ref), rtol=1e-4, atol=5e-7
        )
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=5e-7
        )


@pytest.mark.slow
@pytest.mark.parametrize("compact", [False, True], ids=["full", "compact"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("Z", [4, 7])
def test_epilogue_emit_mac_matches_prologue(dtype, Z, compact):
    """The emit_mac trailing stage == running the classic prologue on the
    epilogue's written-back f', g' (mac-carry correctness), and it leaves
    f'/g' themselves bit-identical to the plain epilogue.  The compact
    ring layout (3-slot input rings + HBM seam stashes, the f32-at-256^2
    configuration — emit_mac_mode) must be bit-identical to full: only
    the DMA schedule differs."""
    import jax.numpy as jnp

    from lbm_ferrofluid_tpu.ops.pallas.fused_step import (
        lbm_epilogue as _epi,
        lbm_prologue as _pro,
    )

    rng = np.random.default_rng(11)
    Y, X = 8, 128
    dt_ = jnp.dtype(dtype)
    f = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32).astype(dt_)
    g = jnp.asarray(rng.uniform(0.0, 1.0, (1, 19, Z, Y, X)), jnp.float32).astype(dt_)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    sh1, sh3 = (1, 1, Z, Y, X), (1, 3, Z, Y, X)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, sh1), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.1, 0.1, sh3), jnp.float32)
    den = jnp.asarray(rng.uniform(0.1, 0.3, sh1), jnp.float32)
    pres = jnp.asarray(rng.uniform(0.0, 0.1, sh1), jnp.float32)
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, sh3), jnp.float32)
    dfai = jnp.asarray(rng.uniform(-1e-3, 1e-3, sh3), jnp.float32)
    dprho = jnp.asarray(rng.uniform(-1e-3, 1e-3, sh3), jnp.float32)
    kw = dict(tau_f=0.68, tau_g=0.68, dx=1.0, dt=1.0, interpret=True)
    mk = dict(c=C, rho_gas=RHO_GAS, rho_fluid=RHO_FLUID,
              density_gas=RHO_GAS, density_fluid=RHO_FLUID)

    f1, g1 = _epi(f, g, flags, rho, vel, den, pres, force, dfai, dprho, **kw)
    f2, g2, mac = _epi(
        f, g, flags, rho, vel, den, pres, force, dfai, dprho,
        emit_mac=True, mac_consts=tuple(mk.values()), compact=compact, **kw,
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    refs = _pro(f1, g1, flags, rho, vel, interpret=True, **mk)
    assert isinstance(mac, tuple) and len(mac) == 5
    for name, got, want in zip(
        ("rho", "vel", "density", "m0g", "m1g"), mac, refs
    ):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=name
        )
