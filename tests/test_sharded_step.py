"""Multi-chip Pallas fast path: shard_map slab decomposition vs single device.

These run the REAL kernel+exchange code (Pallas interpret mode off-TPU) on
the virtual CPU mesh — the same code path a TPU pod executes compiled.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.models import (
    SimulationParams,
    ferrofluid_step,
    init_ferrofluid_state,
)
from lbm_ferrofluid_tpu.ops import bounce_back, stream
from lbm_ferrofluid_tpu.ops.pallas.poisson import poisson_sweeps
from lbm_ferrofluid_tpu.ops.pallas.stencil3d import grad_fields
from lbm_ferrofluid_tpu.ops.stencils import isotropic_laplacian
from lbm_ferrofluid_tpu.parallel import step3d
from lbm_ferrofluid_tpu.parallel.mesh import make_mesh
from lbm_ferrofluid_tpu.parallel.sharding import shard_state

pytestmark = pytest.mark.slow  # interpret-mode Pallas / long-horizon: fast tier skips


def _mesh_z(nz=4):
    return make_mesh(("z",), (nz,), devices=jax.devices()[:nz])


@pytest.fixture
def fields(rng):
    Z, Y, X = 8, 8, 16
    f = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    return f, jnp.asarray(flags)


def test_stream_sharded_matches(fields):
    f, flags = fields
    ref = bounce_back(D3Q19, stream(D3Q19, f), flags)
    out, m0, m1 = step3d.stream_bounce_moments_sharded(
        f, flags, _mesh_z(), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m0), np.asarray(jnp.sum(ref, axis=1, keepdims=True)),
        rtol=1e-5,
    )


def test_stencils_sharded_match(fields, rng):
    _, flags = fields
    Z, Y, X = 8, 8, 16
    den = jnp.asarray(rng.uniform(0.1, 0.9, (1, 1, Z, Y, X)), jnp.float32)
    mesh = _mesh_z()

    lap_ref = isotropic_laplacian(den, 1.0, 3)
    lap_s = step3d.laplacian_field_sharded(den, mesh, dx=1.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(lap_s), np.asarray(lap_ref), rtol=1e-5, atol=1e-6
    )

    g_ref = grad_fields(den, dx=1.0, interpret=True)
    g_s = step3d.grad_fields_sharded(den, mesh, dx=1.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("k", [1, 2, 5])
def test_poisson_sharded_depth_k_bitexact(fields, rng, k):
    """Depth-k halo widening is bit-identical to the single-device kernel
    for any k (n_iters=7 exercises the remainder round for k∈{2,5})."""
    _, flags = fields
    Z, Y, X = 8, 8, 16
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    h_ref, psi_ref = poisson_sweeps(h, flags, rhs, tau=0.8, n_iters=7, interpret=True)
    h_s, psi_s = step3d.poisson_sweeps_sharded(
        h, flags, rhs, _mesh_z(), tau=0.8, n_iters=7, halo_depth=k,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(psi_s), np.asarray(psi_ref))


@pytest.mark.parametrize("h2", [False, True])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_poisson_sharded_psi_halo_matches(rng, h2, dtype):
    """tau == 1 psi ghost refresh (1-channel f32 psi exchange + local h
    reconstruction + thin true-h slivers; ~2.5x less ICI volume on the
    step's dominant exchange) tracks the full 19-channel h exchange.

    NOT bit-exact by design: the reconstruction w_q*(psi+rhs) may be
    FMA-contracted differently than the kernel's collision (measured 1-2
    f32 ulp on ghost planes of the contractive relaxation — see
    step3d._psi_refresh_ghosts), so the bar is rtol ~1e-6 (f32) / bf16
    storage rounding.  n_iters=7 at depth 2 exercises the peeled full-h
    first round, the psi-refresh scan, and the remainder round; the
    obstacle geometry is the mag_flags_shell pattern (x-edge columns +
    z-edge planes) whose true h rides the thin exchanges."""
    Z, Y, X = 16, 8, 16
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), dtype)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    kw = dict(tau=1.0, n_iters=7, halo_depth=2, interpret=True)
    if h2:
        kw["emit_h2"] = (0.0, 85.0, 0.0)
    mesh = _mesh_z()
    off = step3d.poisson_sweeps_sharded(h, flags, rhs, mesh,
                                        psi_halo=False, **kw)
    on = step3d.poisson_sweeps_sharded(h, flags, rhs, mesh,
                                       psi_halo=True, **kw)
    if h2:
        assert off[2] == on[2]
    rtol = 3e-6 if dtype == "float32" else 2e-2
    for i, (a, b) in enumerate(zip(off[:2], on[:2])):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert rel <= rtol, f"out[{i}]: rel dev {rel:.2e}"
        if dtype == "bfloat16":
            # a bf16 max-rel bar alone cannot distinguish rounding noise
            # (sparse straddle flips, in practice zero) from structural
            # ghost corruption (whole boundary planes, ~2/Zl of cells):
            # bound the FRACTION of differing cells too
            frac = (np.abs(a - b) > 1e-12).mean()
            assert frac <= 1e-3, f"out[{i}]: {frac:.2%} of cells differ"


@pytest.mark.parametrize("nz,n_iters", [(2, 4), (2, 30), (4, 30)])
def test_poisson_sharded_h2_small_slab_depth_clamp(rng, nz, n_iters):
    """Regression: at Zl-plane slabs the h2 mode's G=k+1 ghost planes must
    satisfy G <= Zl (one neighbor exchange can supply at most Zl real
    planes).  With the default halo_depth=5 and Zl∈{4,8}, the unclamped k
    made _refresh_ghosts slice a STALE ghost plane in as real data — h
    came back corrupt (rel ~1) decaying inward from the slab edges."""
    Z, Y, X = 4 * nz, 8, 16
    HEXT = (0.0, 85.0, 0.0)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    h_ref, _ = poisson_sweeps(
        h, flags, rhs, tau=0.8, n_iters=n_iters, interpret=True
    )
    out = step3d.poisson_sweeps_sharded(
        h, flags, rhs, _mesh_z(nz), tau=0.8, n_iters=n_iters,
        halo_depth=5, emit_h2=HEXT, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(h_ref))


def test_fused_prologue_epilogue_sharded_match(fields, rng):
    """Slab-mode ghost wrap of the ring-pipelined fused kernels == the
    single-device periodic kernels (bit-identical plane maths)."""
    from lbm_ferrofluid_tpu.ops.pallas.fused_step import (
        lbm_epilogue,
        lbm_prologue,
    )

    f, flags = fields
    Z, Y, X = 8, 8, 16
    g = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    rho_old = jnp.asarray(rng.uniform(0.1, 1.0, (1, 1, Z, Y, X)), jnp.float32)
    vel_old = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)), jnp.float32)
    kw = dict(c=1.0, rho_gas=0.02381, rho_fluid=0.2508,
              density_gas=0.02381, density_fluid=0.2508)
    mesh = _mesh_z()

    ref = lbm_prologue(f, g, flags, rho_old, vel_old, interpret=True, **kw)
    got = step3d.fused_prologue_sharded(
        f, g, flags, rho_old, vel_old, mesh, interpret=True, **kw
    )
    for r, s, name in zip(ref, got, ("rho", "vel", "density", "m0g", "m1g")):
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(r), rtol=1e-6, atol=1e-7, err_msg=name
        )

    rho, vel, den = ref[0], ref[1], ref[2]
    pres = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dfai = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dprho = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    ekw = dict(tau_f=0.68, tau_g=0.68, dx=1.0, dt=1.0)
    f_ref, g_ref = lbm_epilogue(
        f, g, flags, rho, vel, den, pres, force, dfai, dprho,
        interpret=True, **ekw
    )
    f_s, g_s = step3d.fused_epilogue_sharded(
        f, g, flags, rho, vel, den, pres, force, dfai, dprho, mesh,
        interpret=True, **ekw
    )
    np.testing.assert_allclose(
        np.asarray(f_s), np.asarray(f_ref), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_ref), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("compact", [False, True], ids=["full", "compact"])
def test_fused_epilogue_sharded_emit_mac(fields, rng, compact):
    """Sharded mac-carry: the slab-mode epilogue's in-kernel interior
    emissions + the post-kernel ring fix-up of the two boundary planes ==
    the single-device emit_mac kernel.  The compact (3-slot-ring) layout —
    the f32-at-256^2-planes VMEM gate — must be bit-identical to full in
    slab mode too (no seam stashes there: ghost refs replace the wraps)."""
    from lbm_ferrofluid_tpu.ops.pallas.fused_step import lbm_epilogue

    f, flags = fields
    Z, Y, X = 8, 8, 16
    g = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, (1, 1, Z, Y, X)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)), jnp.float32)
    den = jnp.asarray(rng.uniform(0.1, 0.3, (1, 1, Z, Y, X)), jnp.float32)
    pres = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dfai = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    dprho = jnp.asarray(rng.uniform(-1e-3, 1e-3, (1, 3, Z, Y, X)), jnp.float32)
    kw = dict(tau_f=0.68, tau_g=0.68, dx=1.0, dt=1.0)
    mk = (1.0, 0.02381, 0.2508, 0.02381, 0.2508)

    f_ref, g_ref, mac_ref = lbm_epilogue(
        f, g, flags, rho, vel, den, pres, force, dfai, dprho,
        emit_mac=True, mac_consts=mk, interpret=True, **kw,
    )
    # 2-device mesh: local slabs of 4 planes (the slab emit_mac floor)
    f_s, g_s, mac_s = step3d.fused_epilogue_sharded(
        f, g, flags, rho, vel, den, pres, force, dfai, dprho, _mesh_z(2),
        emit_mac=True, mac_consts=mk, compact=compact, interpret=True, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(f_s), np.asarray(f_ref), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g_s), np.asarray(g_ref), rtol=1e-6, atol=1e-7
    )
    assert isinstance(mac_s, tuple) and len(mac_s) == 5
    for name, got, want in zip(
        ("rho", "vel", "density", "m0g", "m1g"), mac_s, mac_ref
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )


@pytest.mark.parametrize("Z", [8, 10], ids=["Zl4", "Zl5"])
@pytest.mark.parametrize("emit_rhs", [None, (1, 85.0, 0.8)],
                         ids=["plain", "emit_rhs"])
def test_capillogue_sharded_matches(rng, emit_rhs, Z):
    """Slab-mode capillogue (ghost refs for f/g + the 5 stencil-window
    fields, pre-computed boundary lap planes, per-device z-clamp, jnp
    boundary mac/rhs fix-up) == the single-device fused kernel.

    Zl=4 and Zl=5 local slabs exercise both ghost-slot aliasing patterns
    of the 5-slot rings (slot5(-1)=4 vs slot5(Z): equal at Zl=4,
    adjacent at Zl=5)."""
    from lbm_ferrofluid_tpu.ops.collide import MU0
    from lbm_ferrofluid_tpu.ops.pallas.capillogue import lbm_capillogue

    Y, X = 8, 16
    f = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    g = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    RG, RF = 0.02381, 0.2508
    rho_pre = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    den_pre = RG + (RF - RG) * ((rho_pre - RG) / (RF - RG))
    pres = jnp.asarray(rng.uniform(0.0, 0.05, (1, 1, Z, Y, X)), jnp.float32)
    rho_ca = jnp.asarray(rng.uniform(RG, RF, (1, 1, Z, Y, X)), jnp.float32)
    H2 = jnp.asarray(rng.uniform(0.0, 100.0, (1, 1, Z, Y, X)), jnp.float32)
    g_sum = jnp.asarray(rng.uniform(0.0, 0.1, (1, 1, Z, Y, X)), jnp.float32)
    g_mom = jnp.asarray(
        rng.uniform(-1e-2, 1e-2, (1, 3, Z, Y, X)), jnp.float32
    )
    vel_old = jnp.asarray(
        rng.uniform(-0.1, 0.1, (1, 3, Z, Y, X)), jnp.float32
    )
    mflags = flags if emit_rhs else None
    kw = dict(
        kappa=0.01, gravity=(0.0, -1e-4, 0.0), mu0_half=0.5 * MU0,
        rho_gas=RG, rho_fluid=RF, density_gas=RG, density_fluid=RF,
        tau_f=0.68, tau_g=0.68, dx=1.0, dt=1.0, emit_rhs=emit_rhs,
    )

    r_f, r_g, r_vel, r_pres, r_force, r_den, r_mac = lbm_capillogue(
        f, g, flags, rho_pre, den_pre, pres, rho_ca, H2,
        g_sum, g_mom, vel_old, mflags, emit_force=False, interpret=True,
        **kw,
    )
    assert r_force is None
    s_f, s_g, s_vel, s_pres, s_den, s_mac = step3d.capillogue_sharded(
        f, g, flags, rho_pre, den_pre, pres, rho_ca, H2,
        g_sum, g_mom, vel_old, mflags, _mesh_z(2), interpret=True, **kw,
    )
    pairs = [
        ("f", s_f, r_f), ("g", s_g, r_g), ("vel", s_vel, r_vel),
        ("pressure", s_pres, r_pres), ("density", s_den, r_den),
    ] + [
        (f"mac[{i}]", sm, rm) for i, (sm, rm) in enumerate(zip(s_mac, r_mac))
    ]
    assert len(s_mac) == len(r_mac) == (6 if emit_rhs else 5)
    for name, got, want in pairs:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-6,
            err_msg=name,
        )


def test_poisson_sharded_ghost_flow_bitexact(rng):
    """The ghost-ref fast flow (single-pass plan, rem==0: real-only h
    carry aliased in-place, exchanged ghost BANDS as separate kernel
    operands — no extended-array pad/DUS/slice) is bit-identical to the
    single-device kernel.  n_iters=6 at depth 2 keeps rem==0 so the flow
    engages (the depth-k tests above use n_iters=7, which exercises the
    extended-array fallback)."""
    Z, Y, X = 16, 8, 16
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    h_ref, psi_ref = poisson_sweeps(
        h, flags, rhs, tau=0.8, n_iters=6, interpret=True
    )
    h_s, psi_s = step3d.poisson_sweeps_sharded(
        h, flags, rhs, _mesh_z(2), tau=0.8, n_iters=6, halo_depth=2,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(psi_s), np.asarray(psi_ref))


@pytest.mark.parametrize("h2", [False, True])
def test_poisson_sharded_ghost_flow_psi_halo(rng, h2):
    """psi ghost refresh through the ghost-ref flow (_psi_ghost_bands:
    bands built from exchanged psi + thin true-h slivers instead of
    DUSing an extended array) tracks the full-h band exchange at the
    same ulp-level bar as the extended-array version above."""
    Z, Y, X = 16, 8, 16
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    kw = dict(tau=1.0, n_iters=6, halo_depth=2, interpret=True)
    if h2:
        kw["emit_h2"] = (0.0, 85.0, 0.0)
    mesh = _mesh_z(2)
    off = step3d.poisson_sweeps_sharded(h, flags, rhs, mesh,
                                        psi_halo=False, **kw)
    on = step3d.poisson_sweeps_sharded(h, flags, rhs, mesh,
                                       psi_halo=True, **kw)
    if h2:
        assert off[2] == on[2]
    for i, (a, b) in enumerate(zip(off[:2], on[:2])):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert rel <= 3e-6, f"out[{i}]: rel dev {rel:.2e}"


def test_poisson_sharded_h2_emission(rng):
    """emit_h2 sharded: the wavefront's h2-emitting final round (per-device
    SMEM edge clamps + one spare ghost plane) == the single-device
    sweeps -> psi substitution -> grad -> |h_ext + H_int|^2 composition."""
    from lbm_ferrofluid_tpu.ops.pallas.poisson import poisson_sweeps
    from lbm_ferrofluid_tpu.ops.pallas.stencil3d import grad_fields

    Z, Y, X = 16, 8, 16
    HEXT = (0.0, 85.0, 0.0)
    h = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    rhs = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)), jnp.float32)

    h_ref, psi = poisson_sweeps(h, flags, rhs, tau=0.8, n_iters=4,
                                interpret=True)
    idx = (Ellipsis,) + (slice(1, -1),) * 3
    pad = [(0, 0)] * 2 + [(1, 1)] * 3
    psi_sub = jnp.where(
        flags == int(CellType.OBSTACLE),
        jnp.pad(psi[idx], pad, mode="edge"), psi,
    )
    H_int = -grad_fields(psi_sub, dx=1.0, interpret=True)
    hext = jnp.asarray(HEXT, jnp.float32).reshape(1, 3, 1, 1, 1)
    want = jnp.sum((H_int + hext) ** 2, axis=1, keepdims=True)

    h_s, h2, emitted = step3d.poisson_sweeps_sharded(
        h, flags, rhs, _mesh_z(2), tau=0.8, n_iters=4, halo_depth=2,
        emit_h2=HEXT, interpret=True,
    )
    assert emitted, "h2-emitting final round did not engage"
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_ref))
    np.testing.assert_allclose(
        np.asarray(h2), np.asarray(want), rtol=2e-5, atol=1e-6
    )


@pytest.mark.parametrize("nz", [1, 2, 4])
def test_scalar_poisson_sharded_matches(rng, nz):
    """The slab form of the tau==1 scalar Poisson solve (ghost bands =
    (s, s_prev) pairs, ghost-ref in-place kernel flow, in-kernel h2 with
    per-device edge clamp) is bit-identical to the single-device scalar
    wavefront.  nz=1 covers the pure-DP dispatch, nz=2 a single round
    (k=4), nz=4 two rounds of k=2 with a band exchange between."""
    from lbm_ferrofluid_tpu.ops.pallas.scalar_poisson import (
        scalar_wavefront,
    )
    from lbm_ferrofluid_tpu.ops.scalar_poisson import (
        fluid_mask, make_cmask,
    )

    Z, Y, X = 16, 8, 16
    HEXT = (0.0, 85.0, 0.0)
    mf = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    mf[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    mf = jnp.asarray(mf)
    mask = np.asarray(fluid_mask(mf))
    s = rng.uniform(-1, 1, (1, 1, Z, Y, X)).astype(np.float32) * mask
    sp = rng.uniform(-1, 1, (1, 1, Z, Y, X)).astype(np.float32) * mask
    s2 = jnp.asarray(np.concatenate([s, sp], axis=1))
    cmask = make_cmask(mf)
    rhs = jnp.asarray(
        rng.uniform(-0.01, 0.01, (1, 1, Z, Y, X)).astype(np.float32)
    )
    n_iters = 4

    s2_ref, h2_ref = scalar_wavefront(
        s2, cmask, rhs, n_iters=n_iters, emit="h2", h_ext=HEXT,
        interpret=True,
    )

    mesh = _mesh_z(nz)
    assert step3d.scalar_sharded_ok(mesh, s2.shape, n_iters, True)
    h2_s, s2_s = step3d.scalar_poisson_sharded(
        s2, cmask, rhs, mesh, n_iters=n_iters, h_ext=HEXT, interpret=True,
    )
    # the sliver ch1 exchange (round-5, gate mag_flags_shell) must be
    # bit-identical to the full-band exchange for this shell geometry —
    # ch1 zeros land only where c_pos == 0 multiplies them away
    h2_v, s2_v = step3d.scalar_poisson_sharded(
        s2, cmask, rhs, mesh, n_iters=n_iters, h_ext=HEXT, interpret=True,
        shell_sliver=True,
    )
    np.testing.assert_array_equal(np.asarray(s2_v), np.asarray(s2_s))
    np.testing.assert_array_equal(np.asarray(h2_v), np.asarray(h2_s))
    if nz <= 2:
        # same pipeline depth both sides (k = n_iters, one pass/round):
        # identical compiled sweep arithmetic -> bitwise
        np.testing.assert_array_equal(np.asarray(s2_s), np.asarray(s2_ref))
        np.testing.assert_array_equal(np.asarray(h2_s), np.asarray(h2_ref))
    else:
        # nz=4 runs two k=2 rounds vs the single k=4 pass: a different
        # compiled program may FMA-contract the identical sweep
        # expressions differently (the repo's documented ulp-level
        # class; measured 6e-8 abs on O(1) values)
        np.testing.assert_allclose(
            np.asarray(s2_s), np.asarray(s2_ref), rtol=3e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(h2_s), np.asarray(h2_ref), rtol=2e-5, atol=1e-6
        )


def test_capmac_sharded_matches(fields, rng):
    """Slab-mode capmac (ghost planes + edge-only z-clamp) == the
    single-device fused gradmac kernel."""
    from lbm_ferrofluid_tpu.ops.pallas.capmac import hcz_capillary_gradmac

    _, flags = fields
    Z, Y, X = 8, 8, 16
    sh1 = (1, 1, Z, Y, X)
    lap = jnp.asarray(rng.uniform(-0.05, 0.05, sh1), jnp.float32)
    rho_pre = jnp.asarray(rng.uniform(0.05, 0.25, sh1), jnp.float32)
    den_pre = jnp.asarray(rng.uniform(0.05, 0.25, sh1), jnp.float32)
    pres = jnp.asarray(rng.uniform(0.0, 0.05, sh1), jnp.float32)
    rho_ca = jnp.asarray(rng.uniform(0.05, 0.25, sh1), jnp.float32)
    h2 = jnp.asarray(rng.uniform(0.0, 10.0, sh1), jnp.float32)
    phi = jnp.asarray(rng.uniform(-1.0, 1.0, sh1), jnp.float32)
    gsum = jnp.asarray(rng.uniform(0.0, 0.05, sh1), jnp.float32)
    gmom = jnp.asarray(rng.uniform(-0.01, 0.01, (1, 3, Z, Y, X)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.05, 0.05, (1, 3, Z, Y, X)), jnp.float32)
    kw = dict(kappa=0.01, gravity=(0.0, -1e-4, 0.0), mu0_half=0.5,
              rho_gas=0.02381, rho_fluid=0.2508,
              density_gas=0.02381, density_fluid=0.2508)

    for H2a, phia in ((h2, phi), (None, None)):
        ref = hcz_capillary_gradmac(
            lap, rho_pre, den_pre, pres, rho_ca, H2a, phia, flags,
            gsum, gmom, vel, interpret=True, **kw,
        )
        # 2-device mesh: local slabs of 4 planes (capmac_sharded_ok floor)
        got = step3d.capmac_sharded(
            lap, rho_pre, den_pre, pres, rho_ca, H2a, phia, flags,
            gsum, gmom, vel, _mesh_z(2), interpret=True, **kw,
        )
        names = ("vel", "pressure", "force", "dfai", "dprho")
        for r, s, name in zip(ref, got, names):
            np.testing.assert_allclose(
                np.asarray(s), np.asarray(r), rtol=1e-6, atol=1e-7,
                err_msg=f"{name} h2={H2a is not None}",
            )


def _flagship(res, batch=1, poisson_iters=3, **extra):
    params = SimulationParams(
        dim=3, density_gas=0.02381, density_fluid=0.2508,
        rho_gas=0.02381, rho_fluid=0.2508, kappa=0.01,
        tau_f=0.68, tau_g=0.68, gravity=1e-4,
        mag_strength=85.0, poisson_iters=poisson_iters,
        poisson_halo_depth=2, **extra,
    )
    flags = np.full((batch, 1, *res), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    mflags = np.full((batch, 1, *res), int(CellType.OBSTACLE), np.uint8)
    mflags[..., 1:-1, :, 1:-1] = int(CellType.FLUID)
    rho = np.full((batch, 1, *res), params.rho_gas, np.float32)
    den = np.full((batch, 1, *res), params.density_gas, np.float32)
    rho[..., : res[1] // 2, :] = params.rho_fluid
    den[..., : res[1] // 2, :] = params.density_fluid
    vel = np.zeros((batch, 3, *res), np.float32)
    return params, init_ferrofluid_state(params, rho, den, vel, flags, mflags)


def test_ferrofluid_step_sharded_pallas_matches():
    """Full flagship step: shard_map Pallas fast path on a ('batch','z') mesh
    == single-device jnp composition."""
    res = (16, 8, 16)
    params, a = _flagship(res)
    # single-device reference: jnp path (pallas gated off-TPU anyway)
    for _ in range(3):
        a = ferrofluid_step(params.replace(use_pallas=False), a)

    mesh = make_mesh(("batch", "z"), (2, 4))
    params_b, b = _flagship(res, batch=2)
    b = shard_state(b, mesh)
    for _ in range(3):
        b = ferrofluid_step(params_b, b, mesh=mesh)

    # the sharded run used the Pallas interpret path; both batch entries
    # must match the single-device run
    for name in ("f", "g", "h", "vel", "density", "pressure"):
        got = np.asarray(getattr(b, name))
        want = np.asarray(getattr(a, name))
        for bi in range(2):
            np.testing.assert_allclose(
                got[bi : bi + 1], want, rtol=2e-5, atol=1e-6,
                err_msg=f"{name}[batch={bi}]",
            )
    assert "z" in str(b.f.sharding.spec)


def test_ferrofluid_step_sharded_turbo_tracks_single():
    """TURBO (bf16 f/g/h storage) sharded == single-device turbo to within
    bf16 storage rounding.  The two paths round at different points (ghost
    planes and boundary fix-ups round-trip bf16 in different orders), so
    the bar is coarse — but structural bugs show up orders of magnitude
    above it (the h2 ghost-depth overflow gave rel ~1 where rounding gives
    ~5e-3).  The same config at f32 matches at <=2e-5 (tests above)."""
    from lbm_ferrofluid_tpu.models import prime_premac

    res = (16, 8, 16)
    params, a = _flagship(res, fg_dtype="bfloat16", h_dtype="bfloat16")
    for _ in range(3):
        a = ferrofluid_step(params.replace(use_pallas=False), a)

    # mag_flags_shell engages the tau=1 psi ghost refresh — the production
    # turbo config (its bf16 reconstruction rounds inside the bar below)
    mesh = _mesh_z()
    params_b, b = _flagship(res, fg_dtype="bfloat16", h_dtype="bfloat16",
                            mag_flags_shell=True)
    b = shard_state(b, mesh)
    b = prime_premac(params_b, b, mesh=mesh)
    # shell+tau==1 at batch 1: the sharded scalar Poisson carry engages
    # (round 4) — h is the fused (s, s_prev) pair, f32 regardless of the
    # bf16 storage mode
    assert b.h.shape[1] == 2 and b.h.dtype == jnp.float32
    for _ in range(3):
        b = ferrofluid_step(params_b, b, mesh=mesh)
    assert b.h.shape[1] == 2

    from lbm_ferrofluid_tpu.ops.scalar_poisson import scalar_from_h

    for name in ("f", "g", "h", "vel", "density", "pressure"):
        got = np.asarray(getattr(b, name), np.float64)
        if name == "h":
            # compare s against the collapse contract applied to the
            # reference's channel h (s_prev is bf16-noise-dominated at
            # wall cells; s carries the solve)
            got = got[:, :1]
            want = np.asarray(
                scalar_from_h(a.h, a.magnetic_flags), np.float64
            )
        else:
            want = np.asarray(getattr(a, name), np.float64)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
        assert rel <= 2e-2, f"{name}: rel dev {rel:.2e}"


def test_ferrofluid_step_sharded_z_field_matches():
    """Sharded step with h_ext_axis=2 (z-directed field): the rhs's
    staggered difference is out-of-plane so there is NO rhs carry — the
    plain capillogue path must engage with premac a 5-tuple and phi/force
    kept as arrays, and the z-crossing rhs build must match the
    single-device jnp composition across slab boundaries."""
    from lbm_ferrofluid_tpu.models import prime_premac

    res = (16, 8, 16)
    params, a = _flagship(res)
    params = params.replace(h_ext_axis=2)
    for _ in range(2):
        a = ferrofluid_step(params.replace(use_pallas=False), a)

    mesh = _mesh_z()
    params_b, b = _flagship(res)
    params_b = params_b.replace(h_ext_axis=2)
    b = shard_state(b, mesh)
    b = prime_premac(params_b, b, mesh=mesh)
    assert b.premac is not None and len(b.premac) == 5
    assert b.phi is not None and b.force is not None
    for _ in range(2):
        b = ferrofluid_step(params_b, b, mesh=mesh)
    assert b.premac is not None and len(b.premac) == 5

    # round 5: the sharded side rides the tau==1 scalar carry (the
    # concrete boundary-only gate admits this geometry even with the
    # wavefront shape unavailable) while the use_pallas=False reference
    # keeps channel h — compare h through the collapse moment
    from lbm_ferrofluid_tpu.ops.scalar_poisson import scalar_from_h

    assert b.h.shape[1] == 2
    np.testing.assert_allclose(
        np.asarray(b.h[:, :1]),
        np.asarray(scalar_from_h(a.h, a.magnetic_flags)),
        rtol=2e-5, atol=1e-6, err_msg="h (collapse moment)",
    )
    for name in ("f", "g", "vel", "density", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            rtol=2e-5, atol=1e-6, err_msg=name,
        )


@pytest.mark.parametrize("halo_depth,psi_halo", [(2, False), (5, False),
                                                 (2, True), (5, True)])
def test_ferrofluid_step_sharded_mac_carry_matches(halo_depth, psi_halo):
    """Full flagship step on the sharded mac-carry path (premac primed,
    every scanned step skips its prologue) == single-device jnp steps.

    halo_depth=5 is the DEFAULT params value: at these Zl=4 slabs it
    exercises the h2 depth clamp (k -> Zl-1) through the whole step.
    psi_halo=True additionally declares mag_flags_shell (the test mflags
    ARE the shell pattern), engaging the tau=1 psi ghost refresh in the
    Poisson loop end-to-end — the production flagship config.  At depth 2
    the psi refresh actually runs (G=3 < Zl=4); at depth 5 its G<Zl gate
    falls back to the full-h refresh (G=4=Zl would put the global z-edge
    obstacle plane at an outer ghost position psi cannot reconstruct) —
    both paths must match the single-device run."""
    from lbm_ferrofluid_tpu.models import prime_premac

    res = (16, 8, 16)
    params, a = _flagship(res)
    for _ in range(3):
        a = ferrofluid_step(params.replace(use_pallas=False), a)

    mesh = make_mesh(("batch", "z"), (2, 4))
    params_b, b = _flagship(res, batch=2, mag_flags_shell=psi_halo)
    params_b = params_b.replace(poisson_halo_depth=halo_depth)
    b = shard_state(b, mesh)
    b = prime_premac(params_b, b, mesh=mesh)
    assert b.premac is not None, "sharded mac-carry priming did not engage"
    # sharded capillogue steady state: rhs carried as the 6th premac leaf,
    # write-only diagnostics (phi/force) elided — matching the
    # single-device steady state structurally
    assert len(b.premac) == 6 and b.phi is None and b.force is None
    for _ in range(3):
        b = ferrofluid_step(params_b, b, mesh=mesh)
    assert b.premac is not None and len(b.premac) == 6
    assert b.phi is None and b.force is None

    for name in ("f", "g", "h", "vel", "density", "pressure"):
        got = np.asarray(getattr(b, name))
        want = np.asarray(getattr(a, name))
        for bi in range(2):
            np.testing.assert_allclose(
                got[bi : bi + 1], want, rtol=2e-5, atol=1e-6,
                err_msg=f"{name}[batch={bi}]",
            )


def test_ferrofluid_step_sharded_scalar_carry_matches():
    """Full flagship step with the SHARDED scalar Poisson carry (round 4):
    shell geometry at batch 1 primes h to the fused (s, s_prev) pair, the
    multi-chip solve runs scalar_poisson_sharded (2-channel ghost bands,
    in-kernel h2), and the steady state matches single-device jnp channel
    steps through the collapse contract."""
    from lbm_ferrofluid_tpu.models import prime_premac
    from lbm_ferrofluid_tpu.ops.scalar_poisson import compare_views

    res = (16, 8, 16)
    params, a = _flagship(res)
    params_j = params.replace(use_pallas=False, mag_flags_shell=True)
    for _ in range(3):
        a = ferrofluid_step(params_j, a)

    mesh = _mesh_z()
    params_b, b = _flagship(res, mag_flags_shell=True)
    b = shard_state(b, mesh)
    b = prime_premac(params_b, b, mesh=mesh)
    assert b.h.shape[1] == 2 and b.cmask is not None
    assert b.premac is not None and len(b.premac) == 6
    for _ in range(3):
        b = ferrofluid_step(params_b, b, mesh=mesh)
    assert b.h.shape[1] == 2

    for name in ("f", "g", "vel", "density", "pressure"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)),
            rtol=2e-5, atol=1e-6, err_msg=name,
        )
    # h through the collapse contract (shared masked-view helper)
    got, want = compare_views(b.h, a.h, a.magnetic_flags)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6,
        err_msg="h (collapse contract)",
    )


def test_sharded_checkpoint_resume_seamless(tmp_path):
    """The production multi-chip resume recipe round-trips exactly: a
    sharded, PRIMED steady state (6-leaf premac, phi/force None, psi-halo
    shell config) saves via np gather, loads into a structure-matching
    template (fresh init + prime on the same mesh), re-shards, and
    continues bit-identically to the uninterrupted run."""
    from lbm_ferrofluid_tpu.models import prime_premac
    from lbm_ferrofluid_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from lbm_ferrofluid_tpu.parallel.sharding import shard_state as _shard

    res = (16, 8, 16)
    mesh = _mesh_z()

    def fresh():
        params, s = _flagship(res, mag_flags_shell=True)
        s = _shard(s, mesh)
        return params, prime_premac(params, s, mesh=mesh)

    params, state = fresh()
    assert state.premac is not None and len(state.premac) == 6

    for _ in range(2):
        state = ferrofluid_step(params, state, mesh=mesh)
    save_checkpoint(tmp_path / "sharded.npz", state)

    # uninterrupted continuation
    cont = ferrofluid_step(params, state, mesh=mesh)

    # resume: template from the same init+prime recipe (structure source),
    # loaded leaves re-sharded onto the mesh
    _, template = fresh()
    restored = _shard(
        load_checkpoint(tmp_path / "sharded.npz", template), mesh
    )
    assert restored.premac is not None and len(restored.premac) == 6
    assert restored.phi is None and restored.force is None
    resumed = ferrofluid_step(params, restored, mesh=mesh)

    for name in ("f", "g", "h", "vel", "density", "pressure"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cont, name), np.float32),
            np.asarray(getattr(resumed, name), np.float32),
            err_msg=name,
        )


def test_ferrofluid_step_dp_dispatch_matches():
    """Pure data-parallel mesh (('batch','z') = (2, 1)): every wrapper
    dispatches the single-device kernel stack inside shard_map
    (step3d._dp_dispatch — the z domain is whole per device, so the
    periodic wrap is local and no ghost exchange/round machinery runs),
    and the full mac-carried steady state matches single-device jnp
    steps."""
    from lbm_ferrofluid_tpu.models import prime_premac

    res = (16, 8, 16)
    params, a = _flagship(res)
    for _ in range(3):
        a = ferrofluid_step(params.replace(use_pallas=False), a)

    mesh = make_mesh(("batch", "z"), (2, 1), devices=jax.devices()[:2])
    assert step3d._dp_dispatch(mesh)
    params_b, b = _flagship(res, batch=2, mag_flags_shell=True)
    b = shard_state(b, mesh)
    b = prime_premac(params_b, b, mesh=mesh)
    assert b.premac is not None, "DP mac-carry priming did not engage"
    assert len(b.premac) == 6 and b.phi is None and b.force is None
    for _ in range(3):
        b = ferrofluid_step(params_b, b, mesh=mesh)
    assert b.premac is not None and len(b.premac) == 6

    for name in ("f", "g", "h", "vel", "density", "pressure"):
        got = np.asarray(getattr(b, name))
        want = np.asarray(getattr(a, name))
        for bi in range(2):
            np.testing.assert_allclose(
                got[bi : bi + 1], want, rtol=2e-5, atol=1e-6,
                err_msg=f"{name}[batch={bi}]",
            )
