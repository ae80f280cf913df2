"""Magnetic scalar-potential solver: an LBM relaxation of the Poisson equation.

Solves  div((1+chi) grad(psi)) = -div(chi H_ext)  for the induced potential
psi via the Chai et al. (2007) Poisson-LBM scheme, exactly as the reference
(src/LBM/LBM_magnetic/LBM_magnetic_2d.py:88-164, _3d.py:108-188):

* psi  = Σ_{q>0} h_q / (1 - w_0)
* heq  = psi * w, with the rest population getting (w_0 - 1) psi
* rhs  = div(chi H_ext)|_staggered * dx / (1 + chi), zeroed off-fluid
* h'   = (1 - 1/tau) h + heq/tau + dt * w * rhs * cs2 (0.5 - tau) dt
* H_int = -grad(psi)

The reference's 30-iteration inner loop (demo_3d_LBM_Rosensweig_instability.py:
163-173) becomes a ``lax.fori_loop`` inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..utils.types import CellType
from .collide import CHI_K, smooth_phi
from .equilibrium import heq
from .stencils import isotropic_grad, staggered_x, staggered_y, staggered_z
from .stream import bounce_back, stream

__all__ = [
    "magnetic_sweep", "solve_H_int", "solve_H_int_scalar",
    "solve_psi_scalar", "poisson_rhs_scaled",
]


def _stag_diff_times(x, axis, hm):
    """``d[j] = stag[j+1]*hm - stag[j]*hm`` of the replicate-staggered ``x``
    along ``axis`` — bit-identical to differencing ``_stagger(x)*hm`` but
    without materializing the (N+1)-padded staggered volume (whose odd
    minor-2 extent defeats XLA loop fusion; the padded form cost
    ~0.5 ms/step at 128x256^2).  The replicate padding makes both edge
    cells' differences exactly +0.0, which the mask reproduces.
    """
    N = x.shape[axis]
    sl = [slice(None)] * x.ndim

    def shift(lo, hi, edge):
        s = list(sl)
        s[axis] = slice(lo, hi)
        e = list(sl)
        e[axis] = edge
        return jnp.concatenate(
            [x[tuple(s)], x[tuple(e)]][:: 1 if edge == slice(-1, None) else -1],
            axis=axis,
        )

    x_p = shift(1, None, slice(-1, None))   # x[j+1], clamped at the top
    x_m = shift(None, -1, slice(None, 1))   # x[j-1], clamped at the bottom
    d = (0.5 * (x + x_p)) * hm - (0.5 * (x_m + x)) * hm
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim + axis if axis < 0 else axis)
    return jnp.where((idx == 0) | (idx == N - 1), jnp.zeros((), x.dtype), d)


def poisson_rhs_scaled(phi, magnetic_flags, H_ext_mac, h2_ext, *, tau, dx,
                       dt, dim):
    """The loop-invariant, pre-scaled Poisson source term.

    rhs = div(chi H_ext)|_staggered * dx / (1 + chi), zeroed off-fluid,
    times the dt * cs2 (0.5 - tau) dt collision prefactor
    (LBM_magnetic_2d.py:140-155).  With ``h2_ext`` (static axis-aligned
    field) the un-padded staggered-difference form is used — bit-identical
    to differencing the padded staggered arrays (the H_ext_mac arrays of
    a constant field equal those scalars everywhere) and fully fusable by
    XLA; the capillogue kernel's trailing emission reproduces this exact
    arithmetic in-register (ops/pallas/capillogue.py).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * dx))
    if h2_ext is not None:
        hms = [float(v) for v in h2_ext] + [0.0] * (3 - len(h2_ext))
        rhs = None
        for axis, hm in zip((-1, -2, -3)[:dim], hms):
            if hm == 0.0:
                continue
            term = _stag_diff_times(chi, axis, hm)
            rhs = term if rhs is None else rhs + term
        if rhs is None:
            rhs = jnp.zeros_like(chi)
    else:
        chx = staggered_x(chi) * H_ext_mac[0]
        chy = staggered_y(chi) * H_ext_mac[1]
        rhs = (chx[..., 1:] - chx[..., :-1]) + (chy[..., 1:, :] - chy[..., :-1, :])
        if dim == 3:
            chz = staggered_z(chi) * H_ext_mac[2]
            rhs = rhs + (chz[..., 1:, :, :] - chz[..., :-1, :, :])
    rhs = rhs * dx / (1.0 + chi)
    rhs = jnp.where(
        magnetic_flags == int(CellType.FLUID), rhs, jnp.zeros_like(rhs)
    )
    return dt * rhs * (cs2 * (0.5 - tau) * dt)


def _maybe_h2(H_int, h2_ext):
    """H2 = |h2_ext + H_int|^2 when the static field is given, else H_int.

    Channel-ascending summation, matching jnp.sum(H_tot*H_tot, axis=1) of
    the open-coded composition bit-for-bit (the broadcast constant adds
    the same f32 values the stored constant H_ext array holds)."""
    if h2_ext is None:
        return H_int
    acc = None
    for d, c in enumerate(h2_ext):
        tot = H_int[:, d:d + 1]
        if c:
            tot = tot + jnp.asarray(c, H_int.dtype)
        sq = tot * tot
        acc = sq if acc is None else acc + sq
    return acc


def magnetic_sweep(
    lat: Lattice,
    h: jnp.ndarray,
    phi: jnp.ndarray,
    flags: jnp.ndarray,
    H_ext_mac: list[jnp.ndarray],
    *,
    tau: float,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """One Poisson-LBM collision sweep; returns (H_int, h_new).

    ``flags`` here is the *magnetic* flag field, which in the ferrofluid demos
    differs from the hydrodynamic one (open in the field direction; reference
    demo_3d_LBM_Rosensweig_instability.py:120-121).
    """
    dim = lat.dim
    c = dx / dt
    cs2 = c * c / 3.0

    w = jnp.asarray(lat.w_bcast(np.float64), dtype=h.dtype)
    w0 = float(lat.weights[0])

    psi = jnp.sum(h[:, 1:], axis=1, keepdims=True) / (1.0 - w0)
    heq_val = heq(lat, psi)

    chi = CHI_K * (1.0 - smooth_phi(phi, 0.1 * dx))
    chx = staggered_x(chi) * H_ext_mac[0]
    chy = staggered_y(chi) * H_ext_mac[1]
    rhs = (chx[..., 1:] - chx[..., :-1]) + (chy[..., 1:, :] - chy[..., :-1, :])
    if dim == 3:
        chz = staggered_z(chi) * H_ext_mac[2]
        rhs = rhs + (chz[..., 1:, :, :] - chz[..., :-1, :, :])
    rhs = rhs * dx / (1.0 + chi)
    rhs = jnp.where(flags == int(CellType.FLUID), rhs, jnp.zeros_like(rhs))

    add_h = dt * w * rhs * (cs2 * (0.5 - tau) * dt)
    collision_h = (1.0 - 1.0 / tau) * h + heq_val / tau + add_h
    h_new = jnp.where(flags == int(CellType.OBSTACLE), h, collision_h)

    H_int = -isotropic_grad(psi, dx, flags, dim)
    return H_int, h_new


def solve_H_int_scalar(
    s2: jnp.ndarray,
    cmask: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    n_iters: int = 30,
    dx: float = 1.0,
    h2_ext: tuple | None = None,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Scalar-collapse twin of :func:`solve_H_int` at tau == 1.

    The 19-channel solve is rank-one at tau == 1 (ops/scalar_poisson.py,
    verified bitwise vs the channel dynamics): the carry is the fused
    [B, 2, Z, Y, X] f32 pair ``s2`` = (s, s_prev) and the static
    ``cmask`` (-1 at obstacles, wall-weight c(x) at fluid — see
    ops/scalar_poisson.py:make_cmask).  Returns (H2, s2') when ``h2_ext``
    is a 3-tuple and the fused kernel can emit it, else
    (_maybe_h2(H_int), s2') — the same contract as solve_H_int with the
    scalar carry in place of h.  The Pallas sweep order is reassociated
    vs the channel form (grouped tap weights): ulp-level shift per sweep,
    NOT bit-exact — the same class of shift as the fast-order jnp sweeps
    (tests/test_scalar_poisson.py::test_fast_order_close_to_exact).

    Shapes the Pallas wavefront cannot take (lane-unaligned grids — every
    reference demo's native resolution, e.g. 130x66x130 — and 2D D2Q9
    fields [B, 2, H, W]) run :func:`scalar_poisson.scalar_sweeps_jnp`
    with order="exact" instead: the SAME per-tap arithmetic as the
    sequential channel sweep (FMA-contraction-level shift only), so
    engaging the collapse on those grids does not perturb trajectories
    vs the channel form beyond compiler contraction — still a ~Q-fold
    traffic/compute cut over streaming Q channels.
    """
    import os

    from .pallas.scalar_poisson import (
        scalar_wavefront,
        scalar_wavefront_hint_ok,
        scalar_wavefront_supported,
    )

    dim = s2.ndim - 2
    pallas_on = (
        use_pallas
        and dim == 3
        and not os.environ.get("LBM_DISABLE_PALLAS")
        and scalar_wavefront_supported(s2.shape, s2.dtype, n_iters)
        and (jax.default_backend() == "tpu" or interpret)
    )
    if (
        pallas_on
        and h2_ext is not None
        and len(h2_ext) == 3
        and scalar_wavefront_hint_ok(s2.shape, s2.dtype, n_iters)
    ):
        s2, H2 = scalar_wavefront(
            s2, cmask, rhs_scaled, n_iters=n_iters, emit="h2", dx=dx,
            h_ext=tuple(float(v) for v in h2_ext), interpret=interpret,
        )
        return H2, s2
    if pallas_on:
        s2, psi = scalar_wavefront(
            s2, cmask, rhs_scaled, n_iters=n_iters, emit="psi", dx=dx,
            interpret=interpret,
        )
        from .pallas.stencil3d import grad_fields

        idx = (Ellipsis,) + (slice(1, -1),) * 3
        pad = [(0, 0)] * 2 + [(1, 1)] * 3
        psi_obs = jnp.pad(psi[idx], pad, mode="edge")
        psi_sub = jnp.where(
            magnetic_flags == int(CellType.OBSTACLE), psi_obs, psi
        )
        H_int = -grad_fields(psi_sub, dx=dx)
        return _maybe_h2(H_int, h2_ext), s2
    # jnp fallback for ANY grid (lane-unaligned 3D, 2D): exact-order
    # sweeps — per-tap channel-form arithmetic, ascending q — so the
    # collapse engages at the reference demos' native resolutions
    # without perturbing trajectories beyond FMA contraction (the
    # fast-order reassociation would shift the chaotic spike
    # trajectories behind the f32 spike-parity evidence)
    from .scalar_poisson import scalar_sweeps_jnp

    psi, s, sp = scalar_sweeps_jnp(
        s2[:, :1], s2[:, 1:2], rhs_scaled, None, magnetic_flags, n_iters,
        order="exact",
    )
    s2 = jnp.concatenate([s, sp], axis=1)
    H_int = -isotropic_grad(psi, dx, magnetic_flags, dim)
    return _maybe_h2(H_int, h2_ext), s2


def solve_psi_scalar(
    s2: jnp.ndarray,
    cmask: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    n_iters: int = 30,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Scalar tau==1 sweeps WITHOUT the gradient composition.

    Returns ``(psi_last, s2')`` — the last pre-collision psi and the
    advanced carry.  For callers that compose H_int/H2 themselves with
    non-array-face boundary semantics: the padded transposed layouts
    (params.phys_extent) substitute obstacle psi and replicate the
    gradient at the PHYSICAL box faces (models/ferrofluid.py:_h2_box),
    so the in-kernel h2/hint emission (array-face fixes) must not run.
    Dispatch mirrors :func:`solve_H_int_scalar`: the Pallas wavefront
    (emit="psi") on supported 3D shapes, exact-order jnp sweeps
    otherwise.
    """
    import os

    from .pallas.scalar_poisson import (
        scalar_wavefront,
        scalar_wavefront_supported,
    )

    dim = s2.ndim - 2
    pallas_on = (
        use_pallas
        and dim == 3
        and not os.environ.get("LBM_DISABLE_PALLAS")
        and scalar_wavefront_supported(s2.shape, s2.dtype, n_iters)
        and (jax.default_backend() == "tpu" or interpret)
    )
    if pallas_on:
        s2, psi = scalar_wavefront(
            s2, cmask, rhs_scaled, n_iters=n_iters, emit="psi",
            interpret=interpret,
        )
        return psi, s2
    from .scalar_poisson import scalar_sweeps_jnp

    psi, s, sp = scalar_sweeps_jnp(
        s2[:, :1], s2[:, 1:2], rhs_scaled, None, magnetic_flags, n_iters,
        order="exact",
    )
    return psi, jnp.concatenate([s, sp], axis=1)


def solve_H_int(
    lat: Lattice,
    h: jnp.ndarray,
    phi: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    H_ext_mac: list[jnp.ndarray],
    *,
    tau: float,
    n_iters: int = 30,
    dx: float = 1.0,
    dt: float = 1.0,
    use_pallas: bool = True,
    mesh=None,
    halo_depth: int = 5,
    rhs_scaled=None,
    h2_ext: tuple | None = None,
    psi_halo: bool = False,
):
    """Run ``n_iters`` sweeps of [stream -> bounce-back -> magnetic_sweep].

    Mirrors the demos' inner loop (demo_2d_LBM_two_droplets.py:167-177);
    returns (H_int from the last sweep, final h).

    With ``h2_ext`` (a static tuple of the constant external field's
    components, channel order x,y[,z] — valid because make_H_ext builds
    H_ext as mag_strength * e_axis) the return is (H2, h) with
    H2 = |h2_ext + H_int|^2 instead: the fused wavefront kernel then
    emits the 1-channel H2 directly from its trailing grad stage
    (emit="h2") and neither psi nor the 3-channel H_int ever reach HBM;
    every other path computes the same H2 from its H_int against the
    broadcast constant (bit-identical to summing against the stored
    constant H_ext array).

    With ``mesh`` the fused sweep kernel runs multi-chip under shard_map slab
    decomposition with depth-``halo_depth`` ghost zones: one ring exchange of
    k planes per k sweeps instead of one per sweep (parallel/step3d.py).

    Optimized relative to a literal transcription, with identical results:
    * the source term rhs = div(chi H_ext) dx/(1+chi) depends only on phi and
      is hoisted out of the loop (the reference recomputes it every sweep,
      LBM_magnetic_2d.py:140-155),
    * H_int = -grad(psi) is only consumed after the final sweep, so it is
      computed once from the last pre-collision psi (exactly the psi the
      reference's final get_H_int call differentiates).
    """
    dim = lat.dim
    c = dx / dt
    cs2 = c * c / 3.0
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=h.dtype)
    w0 = float(lat.weights[0])

    if rhs_scaled is None:
        # loop-invariant source term (callers that already hold the scaled
        # rhs — e.g. the sharded slab path or the capillogue emission —
        # may pass it in directly)
        rhs_scaled = poisson_rhs_scaled(
            phi, magnetic_flags, H_ext_mac, h2_ext, tau=tau, dx=dx, dt=dt,
            dim=dim,
        )

    # Fused Pallas sweep kernel on TPU when shapes allow; jnp fallback is
    # semantically identical (tests assert agreement in interpret mode).
    import os

    from .pallas.poisson import poisson_sweeps, poisson_supported

    pallas_on = (
        use_pallas and dim == 3 and lat.q == 19
        and not os.environ.get("LBM_DISABLE_PALLAS")
    )
    sharded = False
    if pallas_on and mesh is not None:
        from ..parallel.step3d import default_interpret, sharded3d_ok

        interp = default_interpret()
        sharded = sharded3d_ok(mesh, h.shape, interp)
    if sharded or (
        pallas_on
        and mesh is None
        and poisson_supported(lat, h.shape)
        and jax.default_backend() == "tpu"
    ):
        if sharded:
            from ..parallel.step3d import (
                grad_fields_sharded, poisson_sweeps_sharded,
            )

            if h2_ext is not None and len(h2_ext) == 3:
                # try the h2-emitting wavefront final round (per-device
                # SMEM edge clamps + one spare ghost plane); emitted=False
                # falls through to the psi + sharded-grad composition
                h, aux, emitted = poisson_sweeps_sharded(
                    h, magnetic_flags, rhs_scaled, mesh, tau=tau,
                    n_iters=n_iters, halo_depth=halo_depth,
                    emit_h2=h2_ext, dx=dx, interpret=interp,
                    psi_halo=psi_halo,
                )
                if emitted:
                    return aux, h
                psi = aux
            else:
                h, psi = poisson_sweeps_sharded(
                    h, magnetic_flags, rhs_scaled, mesh, tau=tau,
                    n_iters=n_iters, halo_depth=halo_depth, interpret=interp,
                    psi_halo=psi_halo,
                )
        else:
            from .pallas.poisson import (
                poisson_multisweep2,
                poisson_multisweep_supported,
                poisson_wavefront,
                poisson_wavefront_hint_ok,
                poisson_wavefront_supported,
            )
            from .pallas.stencil3d import grad_fields

            if poisson_wavefront_supported(lat, h.shape, h.dtype, n_iters):
                # time-skewed wavefront: k sweeps pipelined over ascending z
                # with per-stage VMEM ring buffers — one HBM read+write of h
                # per k sweeps at ~1.02x compute amplification (bit-identical
                # to the one-sweep kernel; tests/test_pallas_poisson.py)
                if poisson_wavefront_hint_ok(h.shape, h.dtype, n_iters):
                    if h2_ext is not None and len(h2_ext) == 3:
                        # trailing stage emits the 1-channel Kelvin H2
                        # with the constant H_ext folded in-register
                        h, H2 = poisson_wavefront(
                            h, magnetic_flags, rhs_scaled, tau=tau,
                            n_iters=n_iters, emit="h2", dx=dx,
                            h_ext=tuple(float(v) for v in h2_ext),
                        )
                        return H2, h
                    # the final pass's trailing stage emits H_int directly
                    # (psi substitution + gradient in register — the psi
                    # volume and its grad pass never touch HBM)
                    h, H_int = poisson_wavefront(
                        h, magnetic_flags, rhs_scaled, tau=tau,
                        n_iters=n_iters, emit="hint", dx=dx,
                    )
                    return _maybe_h2(H_int, h2_ext), h
                h, psi = poisson_wavefront(
                    h, magnetic_flags, rhs_scaled, tau=tau, n_iters=n_iters
                )
            elif poisson_multisweep_supported(lat, h.shape, h.dtype, n_iters):
                # temporally-blocked + pipelined: k in-place sweeps per HBM
                # pass with the z-window VMEM-resident and the next block
                # prefetched under compute (bit-identical to the one-sweep
                # kernel; tests/test_pallas_poisson.py)
                h, psi = poisson_multisweep2(
                    h, magnetic_flags, rhs_scaled, tau=tau, n_iters=n_iters
                )
            else:
                h, psi = poisson_sweeps(
                    h, magnetic_flags, rhs_scaled, tau=tau, n_iters=n_iters
                )
        # grad with the OBSTACLE substitution applied outside the kernel
        idx = (Ellipsis,) + (slice(1, -1),) * dim
        pad = [(0, 0)] * 2 + [(1, 1)] * dim
        psi_obs = jnp.pad(psi[idx], pad, mode="edge")
        psi_sub = jnp.where(
            magnetic_flags == int(CellType.OBSTACLE), psi_obs, psi
        )
        if sharded:
            H_int = -grad_fields_sharded(psi_sub, mesh, dx=dx, interpret=interp)
        else:
            H_int = -grad_fields(psi_sub, dx=dx)
        return _maybe_h2(H_int, h2_ext), h

    add_h = w * rhs_scaled
    is_obs = magnetic_flags == int(CellType.OBSTACLE)

    h_dtype = h.dtype

    def body(_, carry):
        h, _psi = carry
        h = stream(lat, h)
        h = bounce_back(lat, h, magnetic_flags)
        hf = h.astype(jnp.promote_types(h.dtype, jnp.float32))
        psi = jnp.sum(hf[:, 1:], axis=1, keepdims=True) / (1.0 - w0)
        heq_val = heq(lat, psi)
        collision_h = (1.0 - 1.0 / tau) * hf + heq_val / tau + add_h
        h = jnp.where(is_obs, hf, collision_h).astype(h_dtype)
        return h, psi

    # shape from h, not phi: callers holding a pre-scaled rhs pass phi=None
    psi0 = jnp.zeros_like(
        h[:, :1], dtype=jnp.promote_types(h.dtype, jnp.float32)
    )
    h, psi = jax.lax.fori_loop(0, n_iters, body, (h, psi0))
    H_int = -isotropic_grad(psi, dx, magnetic_flags, dim)
    return _maybe_h2(H_int, h2_ext), h
