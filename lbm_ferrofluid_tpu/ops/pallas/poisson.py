"""Fused Pallas TPU kernel for the magnetic Poisson-LBM sweep (D3Q19).

One sweep = stream + bounce-back + psi moment + Chai-et-al relaxation
(ops/magnetic.py:solve_H_int body).  The jnp composition is dominated by
``jnp.roll`` copies (~115 GB/s effective on v5e); this kernel does the whole
sweep in a single pass over h.

Design:
* channels are grouped by e_z into mid(9)/up(5)/down(5) arrays so that a
  grid program over z-planes reads its z-halos as exactly the neighbor
  planes of the up/down groups — BlockSpec index maps (i-1)%Z and (i+1)%Z
  give periodic wrap for free,
* in-plane (y, x) shifts are ``pltpu.roll`` on full-Y×X tiles, which is
  exact periodic streaming,
* bounce-back and the OBSTACLE freeze are flag selects in-register,
* psi of the *pre-collision* state is emitted per plane so the caller can
  form H_int = -grad(psi) after the last sweep with reference-exact
  semantics (LBM_magnetic_3d.py:155-184).

The sweep loop itself (n_iters) runs as a lax.fori_loop over the kernel with
the grouped layout kept in the carry, so group split/merge costs are paid
once per outer step, not per sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...lattice import D3Q19, Lattice
from ...utils.types import CellType
from .stencil3d import _GRAD_TAPS, _ring_replicate_plane, _shift_replicate

__all__ = [
    "poisson_sweeps",
    "poisson_supported",
    "make_sweep_call",
    "poisson_multisweep_supported",
    "poisson_wavefront",
    "poisson_wavefront_supported",
]

_OBS = int(CellType.OBSTACLE)

# channel groups by e_z.  The D3Q19 lattice ordering is ALREADY grouped
# (reference ordering: q0-8 have e_z=0, q9-13 e_z=+1, q14-18 e_z=-1), so the
# groups are contiguous slices and no permutation is needed.
_MID = [q for q in range(19) if D3Q19.e[q][2] == 0]
_UP = [q for q in range(19) if D3Q19.e[q][2] == 1]
_DN = [q for q in range(19) if D3Q19.e[q][2] == -1]
_ORDER = _MID + _UP + _DN
assert _ORDER == list(range(19)), "D3Q19 ordering must be e_z-grouped"
_INV = np.argsort(_ORDER)  # identity; kept for clarity


def poisson_supported(lat: Lattice, h_shape: tuple[int, ...]) -> bool:
    """The kernel covers D3Q19, batch 1, lane-aligned X and sublane-aligned Y."""
    if lat.q != 19:
        return False
    B, Q, Z, Y, X = h_shape
    return B == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 2


def _sweep_math(streamed, is_obs, rhs, tau):
    """Bounce-back + psi moment + relaxation of one sweep, given the 19
    pull-streamed f32 planes.  Returns (psi, out[19]).

    Reduced-op form of the reference arithmetic
    (LBM_magnetic_3d.py:108-188), shared by every Poisson kernel so the
    temporally-blocked variants stay bit-identical to the one-sweep kernel:

    * full-way bounce back permutes channels 1..18 at a cell, so the psi
      moment Σ_{q>0} h_q is invariant under it — psi is summed from the
      PRE-bounce-back values, dropping 19 selects/plane.  At OBSTACLE cells
      this changes the summation order only; the emitted psi there is
      discarded anyway (the gradient's obstacle substitution in
      solve_H_int / isotropic_grad replaces it).
    * the relaxation is refactored to  a·h_q + w_q·u  with
      u = psi/tau + rhs hoisted per plane (for q=0 minus an extra psi/tau,
      from heq_0 = (w_0 - 1)·psi): ~2 fewer VPU ops per channel.
    * at tau == 1 (the flagship's magnetic relaxation) a = 0 and
      inv_tau = 1, so the  a·h_q  FMA and the  psi·inv_tau  multiply are
      dead — but neither XLA nor Mosaic folds 0.0*x / x*1.0 for floats
      (NaN semantics), so the specialization is explicit: ~1 fewer VPU op
      per channel per sweep in the step's dominant VPU-bound stage.
      Results differ from the generic form only in the sign of exact
      zeros and FMA-contraction choice (the generic  0*s + w*u  could
      contract to a single rounding of the same product) — all kernel
      variants share this function, so cross-kernel bit-identity holds
      either way.
    """
    lat = D3Q19
    inv_tau = 1.0 / tau
    a = 1.0 - inv_tau
    inv_1mw0 = 1.0 / (1.0 - float(lat.weights[0]))

    psi_sum = streamed[1]
    for q in range(2, 19):
        psi_sum = psi_sum + streamed[q]
    psi = psi_sum * inv_1mw0

    t = psi if inv_tau == 1.0 else psi * inv_tau
    u = t + rhs
    out = [None] * 19
    for q in range(19):
        wq = float(lat.weights[q])
        coll = wq * u if a == 0.0 else a * streamed[q] + wq * u
        if q == 0:
            coll = coll - t
        # OBSTACLE cells keep the bounce-backed populations un-collided
        out[q] = jnp.where(is_obs, streamed[int(lat.opposite[q])], coll)
    return psi, out


def _sweep_kernel(tau, mid_ref, up_ref, dn_ref, flags_ref, rhs_ref,
                  omid_ref, oup_ref, odn_ref, psi_ref):
    lat = D3Q19
    Y = mid_ref.shape[2]
    X = mid_ref.shape[3]
    is_obs = flags_ref[0, 0] == _OBS  # [Y, X] (int32 flags)
    rhs = rhs_ref[0, 0]

    # streamed (pulled) value for each lattice direction
    streamed = [None] * 19

    def load(row):
        q = _ORDER[row]
        if row < 9:
            v = mid_ref[row, 0]
        elif row < 14:
            v = up_ref[row - 9, 0]  # block @ z-1
        else:
            v = dn_ref[row - 14, 0]  # block @ z+1
        # cast before the shifts: mosaic's dynamic_rotate rejects bf16 vectors
        v = v.astype(jnp.float32)
        ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
        if ey:
            v = pltpu.roll(v, ey % Y, 0)
        if ex:
            v = pltpu.roll(v, ex % X, 1)
        return v

    for row in range(19):
        streamed[_ORDER[row]] = load(row)

    psi, out = _sweep_math(streamed, is_obs, rhs, tau)
    psi_ref[0, 0] = psi.astype(psi_ref.dtype)

    outs = (omid_ref, oup_ref, odn_ref)
    for row in range(19):
        q = _ORDER[row]
        ref = outs[0] if row < 9 else (outs[1] if row < 14 else outs[2])
        ref[row if row < 9 else (row - 9 if row < 14 else row - 14), 0] = (
            out[q].astype(ref.dtype)
        )


def make_sweep_call(Z, Y, X, h_dtype, tau, interpret=False):
    """Build the one-sweep pallas_call over ``Z`` planes.

    Callable as ``mid, up, dn, psi = call(mid, up, dn, flags_i32, rhs)`` with
    the channel groups ``[9|5|5, Z, Y, X]``.  Exposed so the shard_map slab
    decomposition (parallel/step3d.py) can run sweeps over ghost-extended
    local arrays: the kernel's periodic z-wrap then only pollutes ghost
    planes, which are refreshed from ring neighbors every halo-depth sweeps.
    """
    bs = lambda c: pl.BlockSpec(  # noqa: E731
        (c, 1, Y, X), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    bs_up = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i - 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    bs_dn = pl.BlockSpec(
        (5, 1, Y, X), lambda i: (0, (i + 1) % Z, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_sweep_kernel, tau),
        grid=(Z,),
        in_specs=[bs(9), bs_up, bs_dn, bs(1), bs(1)],
        out_specs=[bs(9), bs(5), bs(5), bs(1)],
        out_shape=[
            jax.ShapeDtypeStruct((9, Z, Y, X), h_dtype),
            jax.ShapeDtypeStruct((5, Z, Y, X), h_dtype),
            jax.ShapeDtypeStruct((5, Z, Y, X), h_dtype),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),  # psi stays f32
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("tau", "n_iters", "interpret"))
def poisson_sweeps(
    h: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    tau: float,
    n_iters: int,
    interpret: bool = False,
):
    """Run ``n_iters`` fused Poisson sweeps.

    Args:
        h: ``[1, 19, Z, Y, X]`` distribution (lattice channel order).
        magnetic_flags: ``[1, 1, Z, Y, X]`` uint8.
        rhs_scaled: ``[1, 1, Z, Y, X]`` f32 — dt * rhs * cs2 (0.5 - tau) dt,
            i.e. add_h without the per-channel weight (applied in-kernel).
            h may be bfloat16 (storage); compute runs in f32 in-register and
            psi is emitted in f32.

    Returns:
        (h_new ``[1,19,Z,Y,X]``, psi ``[1,1,Z,Y,X]`` of the last
        pre-collision state).
    """
    _, _, Z, Y, X = h.shape
    flags_i32 = magnetic_flags[0].astype(jnp.int32)  # mosaic can't compare i8
    rhs_k = rhs_scaled[0]

    call = make_sweep_call(Z, Y, X, h.dtype, tau, interpret)

    # contiguous slices (no gather: the lattice order is e_z-grouped)
    mid = h[0, :9]
    up = h[0, 9:14]
    dn = h[0, 14:19]

    def body(_, carry):
        mid, up, dn, _psi = carry
        mid, up, dn, psi = call(mid, up, dn, flags_i32, rhs_k)
        return mid, up, dn, psi

    psi0 = jnp.zeros((1, Z, Y, X), jnp.float32)
    mid, up, dn, psi = jax.lax.fori_loop(0, n_iters, body, (mid, up, dn, psi0))

    h_new = jnp.concatenate([mid, up, dn], axis=0)[None]
    return h_new, psi[None]


# ----------------------------------------------------------------------
# Temporally-blocked multi-sweep kernel
# ----------------------------------------------------------------------
#
# The 30-sweep inner loop dominates the whole ferrofluid step (~84% of the
# 256^3 step time measured in round 2), and one sweep at a time is HBM-bound:
# read 19 channels + write 19 channels per sweep.  This kernel instead keeps
# a z-window of (Zt + 2k) full planes of h resident in VMEM (v5e has ~128 MB,
# probed) and runs k sweeps before writing the Zt interior planes back -
# h traffic per sweep drops by ~k/(window amplification).  Ghost planes
# absorb the invalid-neighbor frontier exactly like the multi-chip depth-k
# halos (parallel/step3d.py): after s sweeps planes [s, P-1-s] of the window
# are exact, so the interior [k, k+Zt) is exact after k sweeps.  Per-sweep
# arithmetic is identical to _sweep_kernel, so results match the one-sweep
# kernel (bitwise in f32 / at bf16 storage rounding).


def poisson_multisweep_supported(lat, h_shape, h_dtype, n_iters):
    if lat.q != 19:
        return False
    B, Q, Z, Y, X = h_shape
    if not (B == 1 and X % 128 == 0 and Y % 8 == 0):
        return False
    k, Zt, _P = _multisweep2_plan(h_shape, h_dtype)
    return k > 0 and Z % Zt == 0 and Z >= Zt and n_iters >= k


def _multisweep_plan(h_shape, dtype, vmem_budget=100 * 1024 * 1024):
    """Choose (k sweeps/pass, Zt interior planes, P window planes) to fit
    two 19-channel windows + flags/rhs/psi in VMEM."""
    _, _, Z, Y, X = h_shape
    bpe = 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4
    plane = Y * X
    best = None
    for k in (6, 5, 4, 3, 2):
        for Zt in (16, 12, 10, 8, 6, 4):
            if Z % Zt or Zt < k:
                continue
            P = Zt + 2 * k
            need = (
                2 * 19 * P * plane * bpe  # double-buffered h window
                + P * plane * 4  # flags (i32)
                + P * plane * 4  # rhs (f32)
                + Zt * plane * 4  # psi staging
            )
            if need <= vmem_budget:
                # cost model: ghost-zone compute amplification (P/Zt, VPU)
                # plus h traffic per sweep (read amp + writeback, HBM)
                amp = P / Zt
                key = amp + 0.02 * (19 * bpe * (amp + 1.0) / k)
                if best is None or key < best[0]:
                    best = (key, k, Zt, P)
    if best is None:
        return 0, 0, 0
    return best[1], best[2], best[3]


def _multisweep_kernel(tau, k, Zt, P, Z, h_dtype,
                       h_ref, flags_ref, rhs_ref, out_ref, psi_ref):
    lat = D3Q19
    Y, X = h_ref.shape[2], h_ref.shape[3]
    i = pl.program_id(0)
    z0 = i * Zt

    def body(win_a, win_b, fwin, rwin, psi_scr, sems):
        # ---- load the wrapped z-window [z0-k, z0+Zt+k) -----------------
        # Three contiguous pieces (front ghost k | interior Zt | back ghost
        # k) instead of per-plane copies: with Zt >= k (enforced by the
        # plan) each piece never crosses the wrap internally, so the DMA
        # chunks are large (19ch x span planes) and few.
        i32 = jnp.int32
        front = jax.lax.rem((z0 - k + Z).astype(i32), i32(Z))
        back = jax.lax.rem((z0 + Zt).astype(i32), i32(Z))

        def window_copies():
            pieces = (
                (front, 0, k),
                (z0.astype(i32), k, Zt),
                (back, k + Zt, k),
            )
            cps = []
            for src, dst, span in pieces:
                cps.append(pltpu.make_async_copy(
                    h_ref.at[:, pl.ds(src, span)],
                    win_a.at[:, pl.ds(dst, span)], sems.at[0],
                ))
                cps.append(pltpu.make_async_copy(
                    flags_ref.at[:, pl.ds(src, span)],
                    fwin.at[:, pl.ds(dst, span)], sems.at[1],
                ))
                cps.append(pltpu.make_async_copy(
                    rhs_ref.at[:, pl.ds(src, span)],
                    rwin.at[:, pl.ds(dst, span)], sems.at[2],
                ))
            return cps

        for cp in window_copies():
            cp.start()
        for cp in window_copies():
            cp.wait()

        # ---- k sweeps in VMEM -----------------------------------------
        bufs = (win_a, win_b)
        for s in range(k):
            src_buf = bufs[s % 2]
            dst_buf = bufs[(s + 1) % 2]

            def sweep_plane(j, _, *, s=s, src_buf=src_buf, dst_buf=dst_buf):
                jm = jnp.maximum(j - 1, 0)
                jp = jnp.minimum(j + 1, P - 1)
                is_obs = fwin[0, j] == _OBS
                rhs = rwin[0, j]

                streamed = [None] * 19
                for q in range(19):
                    if q < 9:
                        v = src_buf[q, j]
                    elif q < 14:
                        v = src_buf[q, jm]
                    else:
                        v = src_buf[q, jp]
                    v = v.astype(jnp.float32)
                    ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
                    if ey:
                        v = pltpu.roll(v, ey % Y, 0)
                    if ex:
                        v = pltpu.roll(v, ex % X, 1)
                    streamed[q] = v

                psi, out = _sweep_math(streamed, is_obs, rhs, tau)

                if s == k - 1:
                    # stage the last pre-collision psi of interior planes
                    @pl.when((j >= k) & (j < k + Zt))
                    def _():
                        psi_scr[0, pl.ds(jnp.maximum(j - k, 0), 1)] = psi[None]

                for q in range(19):
                    dst_buf[q, j] = out[q].astype(h_dtype)
                return 0

            jax.lax.fori_loop(0, P, sweep_plane, 0)

        final = bufs[k % 2]
        cp = pltpu.make_async_copy(
            final.at[:, pl.ds(k, Zt)], out_ref.at[:, pl.ds(z0, Zt)], sems.at[0]
        )
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(
            psi_scr, psi_ref.at[:, pl.ds(z0, Zt)], sems.at[1]
        )
        cp.start()
        cp.wait()

    pl.run_scoped(
        body,
        pltpu.VMEM((19, P, Y, X), h_dtype),
        pltpu.VMEM((19, P, Y, X), h_dtype),
        pltpu.VMEM((1, P, Y, X), jnp.int32),
        pltpu.VMEM((1, P, Y, X), jnp.float32),
        pltpu.VMEM((1, Zt, Y, X), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    )


@functools.partial(jax.jit, static_argnames=("tau", "n_iters", "interpret"))
def poisson_multisweep(
    h: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    tau: float,
    n_iters: int,
    interpret: bool = False,
):
    """Temporally-blocked variant of :func:`poisson_sweeps` (same contract).

    Runs floor(n_iters / k) fused k-sweep passes with the z-window resident
    in VMEM, then the remainder with the one-sweep kernel.
    """
    _, _, Z, Y, X = h.shape
    k, Zt, P = _multisweep_plan(h.shape, h.dtype)
    flags_i32 = magnetic_flags[0].astype(jnp.int32)
    rhs_k = rhs_scaled[0].astype(jnp.float32)

    passes, rem = divmod(n_iters, k)

    call = pl.pallas_call(
        functools.partial(_multisweep_kernel, tau, k, Zt, P, Z, h.dtype),
        grid=(Z // Zt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((19, Z, Y, X), h.dtype),
            jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def one_pass(_, carry):
        hc, _psi = carry
        return tuple(call(hc, flags_i32, rhs_k))

    psi0 = jnp.zeros((1, Z, Y, X), jnp.float32)
    hc, psi = jax.lax.fori_loop(0, passes, one_pass, (h[0], psi0))

    if rem:
        sweep = make_sweep_call(Z, Y, X, h.dtype, tau, interpret)

        def one_sweep(_, carry):
            mid, up, dn, psi = carry
            return tuple(sweep(mid, up, dn, flags_i32, rhs_k))

        mid, up, dn, psi = jax.lax.fori_loop(
            0, rem, one_sweep, (hc[:9], hc[9:14], hc[14:19], psi)
        )
        hc = jnp.concatenate([mid, up, dn], axis=0)

    return hc[None], psi[None]


# ----------------------------------------------------------------------
# v2: in-place sweeps + cross-block prefetch (DMA hidden under compute)
# ----------------------------------------------------------------------
#
# v1 above loads a window, runs k sweeps (ping-pong between two VMEM
# windows), stores — DMA and compute serialize, and the second window
# buffer caps the window size.  v2 sweeps IN PLACE in a single window
# (ascending-z with a one-plane write delay: res_j is held back until
# j+1's inputs are consumed, and a stash plane keeps the pre-sweep value
# of plane j for j+1's up-neighbor), which frees a whole window buffer to
# prefetch the NEXT grid block while this one computes.  Scratch persists
# across grid steps (scratch_shapes, not run_scoped), so the window
# buffers alternate and the store of block i-1 drains while block i is
# swept.


def _ms2_window_copies(h_ref, fl_ref, rh_ref, wbuf, fbuf, rbuf, sems,
                       z0, k, Zt, Z):
    """The three contiguous piece-copies of a block's wrapped z-window."""
    i32 = jnp.int32
    front = jax.lax.rem((z0 - k + Z).astype(i32), i32(Z))
    back = jax.lax.rem((z0 + Zt).astype(i32), i32(Z))
    pieces = ((front, 0, k), (z0.astype(i32), k, Zt), (back, k + Zt, k))
    cps = []
    for src, dst, span in pieces:
        cps.append(pltpu.make_async_copy(
            h_ref.at[:, pl.ds(src, span)], wbuf.at[:, pl.ds(dst, span)],
            sems.at[0],
        ))
        cps.append(pltpu.make_async_copy(
            fl_ref.at[:, pl.ds(src, span)], fbuf.at[:, pl.ds(dst, span)],
            sems.at[1],
        ))
        cps.append(pltpu.make_async_copy(
            rh_ref.at[:, pl.ds(src, span)], rbuf.at[:, pl.ds(dst, span)],
            sems.at[2],
        ))
    return cps


def _ms2_store_copies(wbuf, psi_scr, out_ref, psi_ref, sems, z0, k, Zt):
    cps = (
        pltpu.make_async_copy(
            wbuf.at[:, pl.ds(k, Zt)], out_ref.at[:, pl.ds(z0, Zt)], sems.at[3]
        ),
    )
    if psi_ref is not None:
        cps += (
            pltpu.make_async_copy(
                psi_scr, psi_ref.at[:, pl.ds(z0, Zt)], sems.at[4]
            ),
        )
    return cps


def _multisweep2_kernel(tau, k, Zt, P, Z, h_dtype, emit_psi, *refs):
    if emit_psi:
        (h_ref, flags_ref, rhs_ref, out_ref, psi_ref,
         w0buf, w1buf, f0buf, f1buf, r0buf, r1buf,
         stash, pending, psi0_scr, psi1_scr, sems) = refs
    else:
        (h_ref, flags_ref, rhs_ref, out_ref,
         w0buf, w1buf, f0buf, f1buf, r0buf, r1buf,
         stash, pending, sems) = refs
        psi_ref = psi0_scr = psi1_scr = None
    lat = D3Q19
    Y, X = h_ref.shape[2], h_ref.shape[3]
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    z0 = i * Zt
    z0_next = (i + 1) * Zt
    z0_prev = (i - 1) * Zt

    wbufs = (w0buf, w1buf)
    fbufs = (f0buf, f1buf)
    rbufs = (r0buf, r1buf)
    psbufs = (psi0_scr, psi1_scr)

    def bufs(slot):
        return wbufs[slot], fbufs[slot], rbufs[slot], psbufs[slot]

    # slot for this block alternates; prefetch goes to the other slot
    for slot in (0, 1):

        @pl.when(jax.lax.rem(i, jnp.int32(2)) == slot)
        def _(slot=slot):
            cur_w, cur_f, cur_r, cur_p = bufs(slot)
            nxt_w, nxt_f, nxt_r, nxt_p = bufs(1 - slot)

            # first block: synchronous load of its own window
            @pl.when(i == 0)
            def _():
                for cp in _ms2_window_copies(
                    h_ref, flags_ref, rhs_ref, cur_w, cur_f, cur_r, sems,
                    z0, k, Zt, Z,
                ):
                    cp.start()
                for cp in _ms2_window_copies(
                    h_ref, flags_ref, rhs_ref, cur_w, cur_f, cur_r, sems,
                    z0, k, Zt, Z,
                ):
                    cp.wait()

            # otherwise: wait for the prefetch issued by block i-1
            @pl.when(i > 0)
            def _():
                for cp in _ms2_window_copies(
                    h_ref, flags_ref, rhs_ref, cur_w, cur_f, cur_r, sems,
                    z0, k, Zt, Z,
                ):
                    cp.wait()
                # block i-1's result store (from the other slot) must drain
                # before that slot is prefetched into
                for cp in _ms2_store_copies(
                    nxt_w, nxt_p, out_ref, psi_ref, sems, z0_prev, k, Zt
                ):
                    cp.wait()

            # prefetch block i+1 into the other slot, overlapping compute
            @pl.when(i + 1 < nblocks)
            def _():
                for cp in _ms2_window_copies(
                    h_ref, flags_ref, rhs_ref, nxt_w, nxt_f, nxt_r, sems,
                    z0_next, k, Zt, Z,
                ):
                    cp.start()

            # ---- k in-place sweeps ------------------------------------
            for s in range(k):

                def sweep_plane(j, _, *, s=s):
                    jp = jnp.minimum(j + 1, P - 1)
                    is_obs = cur_f[0, j] == _OBS
                    rhs = cur_r[0, j]

                    streamed = [None] * 19
                    for q in range(19):
                        if q < 9:
                            v = cur_w[q, j]
                        elif q < 14:
                            # old plane j-1 lives in the stash (garbage for
                            # j == 0: that plane's result is discarded)
                            v = stash[q, 0]
                        else:
                            v = cur_w[q, jp]
                        v = v.astype(jnp.float32)
                        ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
                        if ey:
                            v = pltpu.roll(v, ey % Y, 0)
                        if ex:
                            v = pltpu.roll(v, ex % X, 1)
                        streamed[q] = v

                    psi, out = _sweep_math(streamed, is_obs, rhs, tau)

                    if emit_psi and s == k - 1:
                        @pl.when((j >= k) & (j < k + Zt))
                        def _():
                            cur_p[0, pl.ds(jnp.maximum(j - k, 0), 1)] = (
                                psi[None]
                            )

                    # delayed writeback: flush res_{j-1}, then stash the
                    # old plane j before it can be overwritten
                    @pl.when(j > 0)
                    def _():
                        cur_w[:, pl.ds(j - 1, 1)] = pending[:, :]
                    for q in range(19):
                        stash[q, 0] = cur_w[q, j]

                    for q in range(19):
                        pending[q, 0] = out[q].astype(h_dtype)
                    return 0

                jax.lax.fori_loop(0, P, sweep_plane, 0)
                # flush the last plane
                cur_w[:, pl.ds(P - 1, 1)] = pending[:, :]

            # ---- store this block's interior (async; drained by the next
            # block, or right here for the last one) ----------------------
            for cp in _ms2_store_copies(
                cur_w, cur_p, out_ref, psi_ref, sems, z0, k, Zt
            ):
                cp.start()

            @pl.when(i == nblocks - 1)
            def _():
                for cp in _ms2_store_copies(
                    cur_w, cur_p, out_ref, psi_ref, sems, z0, k, Zt
                ):
                    cp.wait()


def _multisweep2_plan(h_shape, dtype, vmem_budget=104 * 1024 * 1024):
    """(k, Zt, P) for the in-place pipelined kernel: two single windows
    (current + prefetch) + stash/pending planes + double flags/rhs/psi."""
    _, _, Z, Y, X = h_shape
    bpe = 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4
    plane = Y * X
    best = None
    for k in (6, 5, 4, 3, 2):
        for Zt in (16, 12, 10, 8, 6, 4):
            if Z % Zt or Zt < k:
                continue
            P = Zt + 2 * k
            need = (
                2 * 19 * P * plane * bpe  # current + prefetch windows
                + 2 * 19 * plane * bpe  # stash + pending planes
                + 2 * P * plane * 8  # flags(i32)+rhs(f32), double-buffered
                + 2 * Zt * plane * 4  # psi staging, double-buffered
            )
            if need <= vmem_budget:
                amp = P / Zt
                key = amp + 0.02 * (19 * bpe * (amp + 1.0) / k)
                if best is None or key < best[0]:
                    best = (key, k, Zt, P)
    if best is None:
        return 0, 0, 0
    return best[1], best[2], best[3]


@functools.partial(jax.jit, static_argnames=("tau", "n_iters", "interpret"))
def poisson_multisweep2(
    h: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    tau: float,
    n_iters: int,
    interpret: bool = False,
):
    """Pipelined in-place variant of :func:`poisson_multisweep` (same
    contract, same per-sweep arithmetic).

    Only the LAST sweep's pre-collision psi is consumed by the caller, so
    all passes except the final psi-producing one skip the psi staging and
    writeback entirely (psi is 1/19 of the h traffic plus a VMEM plane).
    """
    _, _, Z, Y, X = h.shape
    k, Zt, P = _multisweep2_plan(h.shape, h.dtype)
    flags_i32 = magnetic_flags[0].astype(jnp.int32)
    rhs_k = rhs_scaled[0].astype(jnp.float32)

    passes, rem = divmod(n_iters, k)

    def make_call(emit_psi):
        scratch = [
            pltpu.VMEM((19, P, Y, X), h.dtype),
            pltpu.VMEM((19, P, Y, X), h.dtype),
            pltpu.VMEM((1, P, Y, X), jnp.int32),
            pltpu.VMEM((1, P, Y, X), jnp.int32),
            pltpu.VMEM((1, P, Y, X), jnp.float32),
            pltpu.VMEM((1, P, Y, X), jnp.float32),
            pltpu.VMEM((19, 1, Y, X), h.dtype),
            pltpu.VMEM((19, 1, Y, X), h.dtype),
        ]
        out_shape = [jax.ShapeDtypeStruct((19, Z, Y, X), h.dtype)]
        if emit_psi:
            scratch += [
                pltpu.VMEM((1, Zt, Y, X), jnp.float32),
                pltpu.VMEM((1, Zt, Y, X), jnp.float32),
            ]
            out_shape.append(jax.ShapeDtypeStruct((1, Z, Y, X), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((5,)))
        return pl.pallas_call(
            functools.partial(
                _multisweep2_kernel, tau, k, Zt, P, Z, h.dtype, emit_psi
            ),
            grid=(Z // Zt,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shape),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    call_nopsi = make_call(False)
    n_nopsi = passes - (1 if rem == 0 else 0)

    def one_pass(_, hc):
        return call_nopsi(hc, flags_i32, rhs_k)[0]

    hc = jax.lax.fori_loop(0, n_nopsi, one_pass, h[0])
    psi = jnp.zeros((1, Z, Y, X), jnp.float32)
    if rem == 0:
        hc, psi = make_call(True)(hc, flags_i32, rhs_k)

    if rem:
        sweep = make_sweep_call(Z, Y, X, h.dtype, tau, interpret)

        def one_sweep(_, carry):
            mid, up, dn, psi = carry
            return tuple(sweep(mid, up, dn, flags_i32, rhs_k))

        mid, up, dn, psi = jax.lax.fori_loop(
            0, rem, one_sweep, (hc[:9], hc[9:14], hc[14:19], psi)
        )
        hc = jnp.concatenate([mid, up, dn], axis=0)

    return hc[None], psi[None]


# ----------------------------------------------------------------------
# v3: time-skewed wavefront over the whole z extent
# ----------------------------------------------------------------------
#
# v1/v2 hold a full (Zt + 2k)-plane window of h resident in VMEM, which caps
# Zt at 4-8 planes and costs a ghost-zone amplification P/Zt of 1.75-2x in
# both VPU work and HBM reads.  The wavefront kernel instead runs the k
# sweeps as a SOFTWARE PIPELINE over ascending z: sweep s lags sweep s-1 by
# one plane, and each sweep stage only needs the previous stage's last 3
# planes - a ring buffer - so the "window" can be the whole domain.  One
# pass then reads (Z + 2k) planes and writes Z planes for k sweeps:
#
#   HBM traffic/sweep  = (1 + 2k/Z + 1) / k   volumes  (~0.41 at k=5, Z=256)
#   compute amplification = 1 + (k+1)/Z        (~1.02, vs 1.75-2.0 for v1/v2)
#
# The periodic z-wrap is handled exactly like v1/v2's block ghosts: the
# window is [-k, Z+k) with the 2k wrap planes re-read and their sweeps
# recomputed (the only redundancy left).  Per-plane arithmetic is
# _sweep_math and intermediate sweeps round to the storage dtype when
# writing their ring (exactly like v1/v2 writing their windows), so the
# interior result is bit-identical to the one-sweep kernel.
#
# Pipeline schedule, iteration t in [0, P), P = Z + 2k, window coord
# w_s = t - s for stage s (stage s = sweep s+1):
#   * stage s-1 produces plane t-s+1 at iteration t, which together with the
#     ring's t-s, t-s-1 is exactly what stage s needs for plane t-s,
#   * stage s runs for t >= 2s; all stages finish at t = P-1,
#   * stage k-1's interior planes [k, k+Z) stream back to HBM from a 2-slot
#     store ring; input h/flags/rhs planes stream in 2 iterations ahead.


def _wf_plan(h_shape, dtype, n_iters, vmem_budget=100 * 1024 * 1024):
    """Pick the pipeline depth k: ring VMEM = (4 + 2) 19-channel planes at
    the storage dtype + 3(k-1) stage planes at the stage dtype + (k+2)
    flags/rhs planes.  Prefer k dividing n_iters (no slow remainder
    sweeps), then deeper."""
    k, _ = _wf_plan_full(h_shape, dtype, n_iters, None, vmem_budget)
    return k


def _wf_plan_full(h_shape, dtype, n_iters, stage_dtype=None,
                  vmem_budget=100 * 1024 * 1024):
    """Return (k, stage_dtype).  ``stage_dtype=None`` = auto = the storage
    dtype.  f32 stage rings for bf16 storage were benched and are ~10%
    SLOWER end-to-end (bf16 VMEM load/store widening is effectively free
    in Mosaic, while doubling the stage rings' VMEM traffic is not) — the
    explicit knob remains for experiments and accuracy studies
    (tests/test_pallas_poisson.py::test_wavefront_f32_stages_track_f32)."""
    _, _, Z, Y, X = h_shape
    bpe = 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4

    def plan(stage_bpe):
        plane19 = 19 * Y * X
        for k in sorted(
            (2, 3, 4, 5, 6), key=lambda k: (n_iters % k != 0, -k)
        ):
            if k > n_iters:
                continue
            need = (
                (4 + 2) * plane19 * bpe  # input + store rings
                + 3 * (k - 1) * plane19 * stage_bpe  # stage rings
                + (k + 2) * Y * X * 8  # flags (i32) + rhs (f32) rings
                + 2 * Y * X * 4  # psi store ring
            )
            if need <= vmem_budget:
                return k
        return 0

    if stage_dtype is not None:
        sd = jnp.dtype(stage_dtype)
        return plan(2 if sd == jnp.bfloat16 else 4), sd
    return plan(bpe), jnp.dtype(dtype)


def poisson_wavefront_supported(lat, h_shape, h_dtype, n_iters):
    if lat.q != 19:
        return False
    B, Q, Z, Y, X = h_shape
    if not (B == 1 and X % 128 == 0 and Y % 8 == 0 and Z >= 8):
        return False
    return _wf_plan(h_shape, h_dtype, n_iters) >= 2


def _wavefront_kernel(tau, k, Z, h_dtype, stage_dtype, emit, inv12dx,
                      h_ext, slab, FR, ghost, bands, *refs):
    """``emit``: None (h only), "psi" (+psi volume), "hint" (+H_int =
    -grad(psi_sub), computed by a trailing pipeline stage — the psi volume
    never touches HBM), or "h2" (the same trailing stage combines the
    gradient with the static constant external field ``h_ext`` and emits
    the 1-channel Kelvin magnitude H2 = |h_ext - grad(psi_sub)|^2 —
    neither psi nor the 3-channel H_int ever touch HBM).

    ``slab``: a leading SMEM (2,) int32 ref carries the trailing stage's
    z-clamp bounds so the same SPMD program clamps the grad only at true
    domain edges (multi-chip ghost-zone slabs, parallel/step3d.py); the
    bounds are always within [1, Z-2] so the stage never indexes outside
    its rings.

    ``ghost``: ``(G, Zl)`` selects ghost-ref mode for multi-chip slabs
    (parallel/step3d.py): ``h_ref`` holds only the Zl REAL planes (aliased
    in-place with the output), while the G ghost planes per side arrive
    in two separate read-only band refs — the jnp DUS ghost refresh on a
    big extended array (which forced a full-volume defensive copy per
    round at the aliasing boundary) disappears.  The sweep schedule is
    unchanged (``Z`` = Zl+2G extended planes, same window math), so real-
    plane results are bit-identical to the extended-array form; ghost-
    plane outputs are dead (re-exchanged every round) and never stored.
    The wrap re-reads of extended planes [0, k) land in the lo band ref
    (k <= G), which is never written — no seam stash needed."""
    clamp_ref = None
    if slab:
        clamp_ref = refs[0]
        refs = refs[1:]
    hint_ref = hint_store = psi4 = psirep4 = sem_hint = None
    psi_ref = psi_ring = sem_p = seam_ref = None
    glo_ref = ghi_ref = None
    # inputs: h, flags, rhs [, ghost_lo, ghost_hi]
    h_ref, flags_ref, rhs_ref = refs[:3]
    refs = refs[3:]
    if ghost is not None:
        glo_ref, ghi_ref = refs[:2]
        refs = refs[2:]
    # outputs: h_out [, psi | hint] [, band_lo, band_hi] [, seam]
    out_ref = refs[0]
    refs = refs[1:]
    if emit == "psi":
        psi_ref = refs[0]
        refs = refs[1:]
    elif emit in ("hint", "h2"):
        hint_ref = refs[0]
        refs = refs[1:]
    blo_ref = bhi_ref = None
    if bands:
        blo_ref, bhi_ref = refs[:2]
        refs = refs[2:]
    if ghost is None:
        seam_ref = refs[0]
        refs = refs[1:]
    # scratch: rings, stage rings, semaphores
    in_ring, f_ring, r_ring, store_ring = refs[:4]
    refs = refs[4:]
    if emit == "psi":
        psi_ring = refs[0]
        refs = refs[1:]
    elif emit in ("hint", "h2"):
        psi4, psirep4, hint_store = refs[:3]
        refs = refs[3:]
    stage_rings = list(refs[:k - 1])
    refs = refs[k - 1:]
    sem_h, sem_f, sem_r, sem_o = refs[:4]
    refs = refs[4:]
    if emit == "psi":
        sem_p = refs[0]
        refs = refs[1:]
    elif emit in ("hint", "h2"):
        sem_hint = refs[0]
        refs = refs[1:]
    sem_bl = sem_bh = None
    if bands:
        sem_bl, sem_bh = refs[:2]
        refs = refs[2:]
    if ghost is None:
        (sem_s,) = refs
    emit_psi = emit == "psi"
    lat = D3Q19
    Y, X = h_ref.shape[2], h_ref.shape[3]
    P = Z + 2 * k
    if ghost is not None:
        G_g, Zl_g = ghost
        out_base = k + G_g          # first stored window plane
        out_end = k + G_g + Zl_g    # one past the last
    else:
        out_base, out_end = k, k + Z
    # FR (flags/rhs ring size) is chosen by the wrapper: k+2 for the
    # sweep stages alone; k+6 with the trailing H_int grad stage (lag 2
    # behind the final sweep, which itself lags the input by 2k-1 — flags
    # of global plane q are read as late as body q+2k+3, and the slot's
    # overwriting DMA starts at body q+k+FR-2)

    def rem_(a, n):
        # constants stay python ints so they weakly promote to the loop
        # index dtype (int64 when jax_enable_x64 is on in tests)
        a = jnp.asarray(a)
        return jax.lax.rem(a, jnp.asarray(n, a.dtype))

    def _h_copy(src_ref, idx, plane):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(idx, 1)],
            in_ring.at[:, pl.ds(rem_(plane, 4), 1)],
            sem_h.at[rem_(plane, 4)],
        )

    def in_copies(plane, h_from_seam=False):
        """Async copies of window plane ``plane`` of h/flags/rhs (wrapped).

        ``h_ref`` aliases ``out_ref`` (in-place pass), so the wrap-seam
        re-reads of planes [0, k) at window planes >= Z+k — which happen
        AFTER those planes were overwritten — must come from the pristine
        ``seam_ref`` stash instead (``h_from_seam``; the seam index equals
        the wrapped ``src``).  All other planes are read strictly before
        their in-place write (read of plane p lands at t=p+k-1, write
        starts at t=p+k).
        """
        src = rem_(plane + (Z - k), Z)
        h_src = seam_ref if h_from_seam else h_ref
        return (_h_copy(h_src, src, plane), *_fr_copies(plane))

    def _fr_copies(plane):
        src = rem_(plane + (Z - k), Z)
        return (
            pltpu.make_async_copy(
                flags_ref.at[:, pl.ds(src, 1)],
                f_ring.at[:, pl.ds(rem_(plane, FR), 1)],
                sem_f.at[rem_(plane, 2)],
            ),
            pltpu.make_async_copy(
                rhs_ref.at[:, pl.ds(src, 1)],
                r_ring.at[:, pl.ds(rem_(plane, FR), 1)],
                sem_r.at[rem_(plane, 2)],
            ),
        )

    def start_in(plane):
        """Start window plane ``plane``'s input copies — ghost-ref mode:
        extended plane e < G comes from the lo band, e >= G+Zl from the hi
        band, else the real h ref.  The wrap re-reads (window >= Z+k, e in
        [0, k) ⊂ [0, G)) hit the lo band, which is read-only — pristine by
        construction.  All variants move identical byte counts, so the
        shared wait descriptor in ``in_copies`` stays valid."""
        if ghost is None:
            for cp in in_copies(plane):
                cp.start()
            return
        e = rem_(plane + (Z - k), Z)

        @pl.when(e < G_g)
        def _():
            _h_copy(glo_ref, e, plane).start()

        @pl.when((e >= G_g) & (e < G_g + Zl_g))
        def _():
            _h_copy(h_ref, e - G_g, plane).start()

        @pl.when(e >= G_g + Zl_g)
        def _():
            _h_copy(ghi_ref, e - (G_g + Zl_g), plane).start()

        for cp in _fr_copies(plane):
            cp.start()

    def out_copy(w):
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 2), 1)],
            out_ref.at[:, pl.ds(w - out_base, 1)],
            sem_o.at[rem_(w, 2)],
        )

    def psi_copy(w):
        return pltpu.make_async_copy(
            psi_ring.at[:, pl.ds(rem_(w, 2), 1)],
            psi_ref.at[:, pl.ds(w - out_base, 1)],
            sem_p.at[rem_(w, 2)],
        )

    def hint_copy(p):
        return pltpu.make_async_copy(
            hint_store.at[:, pl.ds(rem_(p, 2), 1)],
            hint_ref.at[:, pl.ds(p - (out_base - k), 1)],
            sem_hint.at[rem_(p, 2)],
        )

    def band_lo_copy(w):
        # second destination of the just-stored plane: the final values of
        # real planes [0, G) — the next exchange round reads THESE small
        # outputs instead of slicing h (any jnp read of the in-place-
        # aliased h around the while carry makes XLA insert a full-volume
        # defensive copy per round; measured 8.2 ms/step at 256^3)
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 2), 1)],
            blo_ref.at[:, pl.ds(w - out_base, 1)],
            sem_bl.at[rem_(w, 2)],
        )

    def band_hi_copy(w):
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 2), 1)],
            bhi_ref.at[:, pl.ds(w - out_base - (Zl_g - G_g), 1)],
            sem_bh.at[rem_(w, 2)],
        )

    # ---- preamble: stash the seam planes, planes 0 and 1 in flight ------
    if ghost is None:
        seam_cp = pltpu.make_async_copy(
            h_ref.at[:, pl.ds(0, k)], seam_ref, sem_s
        )
        seam_cp.start()
    for plane in (0, 1):  # window planes 0,1 always read pristine refs
        start_in(plane)
    if ghost is None:
        # the stash must land before plane 0's in-place write at t=k
        seam_cp.wait()
    for cp in in_copies(0):
        cp.wait()

    def body(t, _):
        # ---- input pipeline: land plane t+1, launch plane t+2 ----------
        @pl.when(t + 1 <= P - 1)
        def _():
            # the wait only touches the semaphore + byte count, which are
            # identical for the seam/band and h_ref variants
            for cp in in_copies(t + 1):
                cp.wait()

        if ghost is not None:
            # band routing inside start_in covers the wrap re-reads too
            @pl.when(t + 2 <= P - 1)
            def _():
                start_in(t + 2)
        else:
            @pl.when((t + 2 <= P - 1) & (t + 2 < Z + k))
            def _():
                for cp in in_copies(t + 2):
                    cp.start()

            @pl.when((t + 2 >= Z + k) & (t + 2 <= P - 1))
            def _():
                for cp in in_copies(t + 2, h_from_seam=True):
                    cp.start()

        # ---- pipeline stages, in order --------------------------------
        for s in range(k):

            @pl.when(t >= 2 * s)
            def _(s=s):
                w = t - s
                if s == 0:
                    prev, R = in_ring, 4
                    wm = jnp.maximum(w - 1, 0)
                    wp = jnp.minimum(w + 1, P - 1)
                else:
                    prev, R = stage_rings[s - 1], 3
                    wm, wp = w - 1, w + 1
                sm = rem_(wm, R)
                s0 = rem_(w, R)
                sp = rem_(wp, R)
                fr_slot = rem_(w, FR)
                is_obs = f_ring[0, fr_slot] == _OBS
                rhs = r_ring[0, fr_slot]

                streamed = [None] * 19
                for q in range(19):
                    slot = s0 if q < 9 else (sm if q < 14 else sp)
                    v = prev[q, slot].astype(jnp.float32)
                    ex, ey = int(lat.e[q][0]), int(lat.e[q][1])
                    if ey:
                        v = pltpu.roll(v, ey % Y, 0)
                    if ex:
                        v = pltpu.roll(v, ex % X, 1)
                    streamed[q] = v

                psi, out = _sweep_math(streamed, is_obs, rhs, tau)

                if s < k - 1:
                    ws = rem_(w, 3)
                    for q in range(19):
                        stage_rings[s][q, ws] = out[q].astype(stage_dtype)
                else:
                    if emit in ("hint", "h2"):
                        # keep psi (+ its ring-replicated pad) in VMEM for
                        # the trailing grad stage; 5 slots cover its lag-2
                        # window.  Fills the EXTENDED plane range: in
                        # ghost-ref mode the grad of boundary real planes
                        # reads ghost-plane psi from these rings
                        @pl.when((w >= k) & (w < k + Z))
                        def _():
                            g5 = rem_(w - k, 5)
                            psi4[0, g5] = psi
                            psirep4[0, g5] = _ring_replicate_plane(
                                psi, Y, X
                            )

                    # final sweep: stream stored planes back to HBM (all
                    # extended planes, or only the real slab in ghost-ref
                    # mode — ghost outputs are re-exchanged anyway)
                    @pl.when((w >= out_base) & (w < out_end))
                    def _():
                        # slot w%2 was last used by plane w-2's store
                        @pl.when(w - 2 >= out_base)
                        def _():
                            out_copy(w - 2).wait()
                            if emit_psi:
                                psi_copy(w - 2).wait()
                            if bands:
                                e2 = w - 2 - out_base

                                @pl.when(e2 < G_g)
                                def _():
                                    band_lo_copy(w - 2).wait()

                                @pl.when(e2 >= Zl_g - G_g)
                                def _():
                                    band_hi_copy(w - 2).wait()
                        slot = rem_(w, 2)
                        for q in range(19):
                            store_ring[q, slot] = out[q].astype(h_dtype)
                        out_copy(w).start()
                        if bands:
                            e0 = w - out_base

                            @pl.when(e0 < G_g)
                            def _():
                                band_lo_copy(w).start()

                            @pl.when(e0 >= Zl_g - G_g)
                            def _():
                                band_hi_copy(w).start()
                        if emit_psi:
                            psi_ring[0, slot] = psi
                            psi_copy(w).start()

        if emit in ("hint", "h2"):
            # trailing stage: H_int plane p = -grad(psi_sub)(p), the
            # OBSTACLE substitution and boundary-ring semantics of
            # solve_H_int's grad_fields(ring_fix) done in register.
            # psi of global plane G lands at body G+2k-1 (the final sweep
            # lags the input window by 2k-1); the p=0 output needs psi
            # plane 2, so the grad stage lags by a further 2.  Ghost-ref
            # mode emits only the real planes [G, G+Zl) (their stencils
            # read ghost psi from the VMEM rings, filled extended-range)
            hbase = out_base - k
            hend = hbase + (out_end - out_base)

            @pl.when(
                (t >= 2 * k + 1 + hbase) & (t <= 2 * k + hend)
            )
            def _():
                p = t - 2 * k - 1
                if slab:
                    z_lo, z_hi = clamp_ref[0], clamp_ref[1]
                else:
                    z_lo, z_hi = 1, Z - 2
                pc = jnp.clip(p, z_lo, z_hi)
                qs = [pc - 1, pc, pc + 1]
                sub = []
                for q in qs:
                    cq = jnp.clip(q, z_lo, z_hi)
                    is_obs_q = f_ring[0, rem_(q + k, FR)] == _OBS
                    sub.append(jnp.where(
                        is_obs_q,
                        psirep4[0, rem_(cq, 5)],
                        psi4[0, rem_(q, 5)],
                    ))
                planes3 = {-1: sub[0], 0: sub[1], 1: sub[2]}

                @pl.when(p - 2 >= hbase)
                def _():
                    hint_copy(p - 2).wait()

                slot2 = rem_(p, 2)
                comps = []
                for d in range(3):
                    acc = None
                    for (oz, oy, ox), wgt in _GRAD_TAPS[d]:
                        tp = _shift_replicate(
                            planes3[oz], -oy, -ox, Y, X
                        ) * wgt
                        acc = tp if acc is None else acc + tp
                    comps.append(acc * (-inv12dx))
                if emit == "hint":
                    for d in range(3):
                        hint_store[d, slot2] = _ring_replicate_plane(
                            comps[d], Y, X
                        )
                else:
                    # H2 = sum_d (H_ext_d + H_int_d)^2, channel order as
                    # the jnp composition; the boundary-ring replicate
                    # commutes with the pointwise square-sum
                    h2 = None
                    for d in range(3):
                        tot = comps[d] + h_ext[d] if h_ext[d] else comps[d]
                        sq = tot * tot
                        h2 = sq if h2 is None else h2 + sq
                    hint_store[0, slot2] = _ring_replicate_plane(h2, Y, X)
                hint_copy(p).start()

        return 0

    # hint/h2 mode runs one extra body: the last output plane (p = Z-1)
    # is produced at t = Z+2k = P; other pl.when gates exclude t >= P
    jax.lax.fori_loop(0, P + (1 if emit in ("hint", "h2") else 0), body, 0)

    # drain the last two stores (ghost-ref mode: the last two REAL planes)
    for d in (2, 1):
        out_copy(out_end - d).wait()
        if emit_psi:
            psi_copy(out_end - d).wait()
        if emit in ("hint", "h2"):
            hint_copy(out_end - k - d).wait()
        if bands:
            # membership is compile-time: e = Zl - d
            if Zl_g - d < G_g:
                band_lo_copy(out_end - d).wait()
            if Zl_g - d >= Zl_g - G_g:
                band_hi_copy(out_end - d).wait()


def poisson_wavefront_hint_ok(h_shape, h_dtype, n_iters) -> bool:
    """True when the wavefront can emit H_int directly (the trailing grad
    stage requires a remainder-free pass schedule and its lag-2 window)."""
    _, _, Z, _, _ = h_shape
    k = _wf_plan(h_shape, h_dtype, n_iters)
    return k >= 2 and n_iters % k == 0 and Z >= 4


@functools.partial(jax.jit, static_argnames=(
    "tau", "n_iters", "interpret", "stage_dtype", "emit", "dx", "h_ext",
    "emit_bands",
))
def poisson_wavefront(
    h: jnp.ndarray,
    magnetic_flags: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    tau: float,
    n_iters: int,
    interpret: bool = False,
    stage_dtype=None,
    emit: str = "psi",
    dx: float = 1.0,
    h_ext: tuple | None = None,
    slab_clamp=None,
    ghosts=None,
    emit_bands: bool = False,
):
    """Time-skewed wavefront variant of :func:`poisson_sweeps` (same
    contract, same per-sweep arithmetic, interior bit-identical when
    ``stage_dtype`` matches the storage dtype).

    ``stage_dtype=None`` (auto) keeps stage rings at the storage dtype
    (f32 stages were benched slower — see ``_wf_plan_full``).

    ``emit="psi"`` returns (h, psi); ``emit="hint"`` (requires
    :func:`poisson_wavefront_hint_ok`) returns (h, H_int) with
    H_int = -grad(psi_sub) computed by a trailing in-kernel stage — the
    psi volume never touches HBM and the caller skips its
    substitution+grad_fields pass entirely (``dx`` scales the gradient).
    ``emit="h2"`` (same gate; requires the static 3-tuple ``h_ext``)
    additionally folds the constant external field in-register and
    returns (h, H2) with H2 = |h_ext + H_int|^2 as ONE channel — the
    3-channel H_int never touches HBM either.

    ``slab_clamp`` (int32 [2], traced) overrides the trailing grad
    stage's z-clamp bounds for multi-chip ghost-zone slabs
    (parallel/step3d.py) — both values must lie in [1, Z-2].

    ``ghosts`` = (lo, hi) — ghost-ref slab mode (parallel/step3d.py):
    ``h`` holds only the Zl real planes (aliased in-place with the
    output) and the two [19, G, Y, X] bands hold the G exchanged ghost
    planes per side; ``magnetic_flags``/``rhs_scaled`` must arrive
    EXTENDED ([1, 1, Zl+2G, Y, X]).  The sweep schedule runs over the
    same extended plane space, so real-plane results are bit-identical
    to padding h to [Zl+2G] and slicing — without the big-array ghost
    DUS that forced a full-volume defensive copy at the in-place
    aliasing boundary (measured: the bulk of the 38-48%% sharded-on-1
    overhead).  Requires a single pass (the plan's k == n_iters, G >= k,
    Zl >= 2): multi-pass validity would need the ghost-plane OUTPUTS the
    kernel deliberately drops.  Returns real-only (h, aux).

    ``emit_bands`` (ghost mode only): additionally return the final
    values of real planes [0, G) and [Zl-G, Zl) as two separate
    [19, G, Y, X] outputs — the next exchange round reads THESE instead
    of slicing h, so h has no jnp consumers at all around the in-place
    while carry (any such read makes XLA insert a full-volume defensive
    copy per round; measured 8.2 ms/step at 256^3).  Returns
    (h, aux, (band_lo, band_hi)).
    """
    if emit_bands and ghosts is None:
        raise ValueError("emit_bands requires ghost mode")
    if ghosts is not None:
        glo, ghi = ghosts
        G = glo.shape[1]
        _, _, Zl, Y, X = h.shape
        Z = Zl + 2 * G
        plan_shape = (1, 19, Z, Y, X)
        if magnetic_flags.shape[2] != Z or rhs_scaled.shape[2] != Z:
            raise ValueError("ghost mode needs EXTENDED flags/rhs")
    else:
        _, _, Z, Y, X = h.shape
        plan_shape = h.shape
    k, stage_dt = _wf_plan_full(plan_shape, h.dtype, n_iters, stage_dtype)
    if ghosts is not None and not (k == n_iters and G >= k and Zl >= 2):
        raise ValueError(
            f"ghost mode requires a single pass: plan k={k} vs "
            f"n_iters={n_iters}, G={G}, Zl={Zl}"
        )
    if emit in ("hint", "h2") and not (
        k >= 2 and n_iters % k == 0 and Z >= 4
    ):
        raise ValueError(f"emit={emit!r} requires poisson_wavefront_hint_ok")
    if emit == "h2" and (h_ext is None or len(h_ext) != 3):
        raise ValueError("emit='h2' requires a static 3-tuple h_ext")
    if k < 2:  # no pipeline depth fits (tiny n_iters): plain sweeps
        return poisson_sweeps(
            h, magnetic_flags, rhs_scaled, tau=tau, n_iters=n_iters,
            interpret=interpret,
        )
    flags_i32 = magnetic_flags[0].astype(jnp.int32)
    rhs_k = rhs_scaled[0].astype(jnp.float32)

    passes, rem = divmod(n_iters, k)

    def make_call(emit_mode):
        # hint/h2: the trailing grad stage reads flags of global plane q
        # as late as body q+2k+3; the slot's overwriting DMA starts at
        # body q+k+FR-2, so retention needs FR >= k+6
        FR = k + 6 if emit_mode in ("hint", "h2") else k + 2
        Zout = Zl if ghosts is not None else Z
        scratch = [
            pltpu.VMEM((19, 4, Y, X), h.dtype),     # input ring
            pltpu.VMEM((1, FR, Y, X), jnp.int32),   # flags ring
            pltpu.VMEM((1, FR, Y, X), jnp.float32),  # rhs ring
            pltpu.VMEM((19, 2, Y, X), h.dtype),     # store ring
        ]
        out_shape = [jax.ShapeDtypeStruct((19, Zout, Y, X), h.dtype)]
        if emit_mode == "psi":
            scratch.append(pltpu.VMEM((1, 2, Y, X), jnp.float32))
            out_shape.append(
                jax.ShapeDtypeStruct((1, Zout, Y, X), jnp.float32)
            )
        elif emit_mode in ("hint", "h2"):
            nc = 3 if emit_mode == "hint" else 1
            scratch += [
                pltpu.VMEM((1, 5, Y, X), jnp.float32),  # psi ring
                pltpu.VMEM((1, 5, Y, X), jnp.float32),  # psi pad ring
                pltpu.VMEM((nc, 2, Y, X), jnp.float32),  # H_int/H2 store
            ]
            out_shape.append(
                jax.ShapeDtypeStruct((nc, Zout, Y, X), jnp.float32)
            )
        if emit_bands:
            out_shape += [
                jax.ShapeDtypeStruct((19, G, Y, X), h.dtype),
                jax.ShapeDtypeStruct((19, G, Y, X), h.dtype),
            ]
        if ghosts is None:
            # HBM stash of the seam planes [0, k): h aliases the output
            # (the pass runs in place, saving a full 19-channel copy per
            # pass), so the wrap re-reads at window planes >= Z+k read
            # this instead.  Ghost-ref mode reads the wrap planes from
            # the read-only lo band — no stash.
            out_shape.append(jax.ShapeDtypeStruct((19, k, Y, X), h.dtype))
        scratch += [pltpu.VMEM((19, 3, Y, X), stage_dt) for _ in range(k - 1)]
        scratch += [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if emit_mode in ("psi", "hint", "h2"):
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
        if emit_bands:
            scratch += [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        if ghosts is None:
            scratch.append(pltpu.SemaphoreType.DMA(()))
        slab = slab_clamp is not None and emit_mode in ("hint", "h2")
        n_in = 5 if ghosts is not None else 3
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
        if slab:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        call = pl.pallas_call(
            functools.partial(
                _wavefront_kernel, tau, k, Z, h.dtype, stage_dt,
                emit_mode, 1.0 / (12.0 * dx),
                tuple(float(v) for v in h_ext) if h_ext else None,
                slab, FR, (G, Zl) if ghosts is not None else None,
                emit_bands,
            ),
            grid=(1,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shape),
            out_shape=out_shape,
            scratch_shapes=scratch,
            input_output_aliases={1 if slab else 0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
            interpret=interpret,
        )
        extra = (glo, ghi) if ghosts is not None else ()
        if slab:
            clamp = jnp.asarray(slab_clamp, jnp.int32)
            return lambda *a: call(clamp, *a, *extra)
        if extra:
            return lambda *a: call(*a, *extra)
        return call

    call_nopsi = make_call(None)
    n_nopsi = passes - (1 if rem == 0 else 0)

    def one_pass(_, hc):
        return call_nopsi(hc, flags_i32, rhs_k)[0]

    hc = jax.lax.fori_loop(0, n_nopsi, one_pass, h[0])
    if rem == 0:
        outs = make_call(emit)(hc, flags_i32, rhs_k)
        if emit_bands:
            return outs[0][None], outs[1][None], (outs[2], outs[3])
        return outs[0][None], outs[1][None]

    psi = jnp.zeros((1, Z, Y, X), jnp.float32)
    sweep = make_sweep_call(Z, Y, X, h.dtype, tau, interpret)

    def one_sweep(_, carry):
        mid, up, dn, psi = carry
        return tuple(sweep(mid, up, dn, flags_i32, rhs_k))

    mid, up, dn, psi = jax.lax.fori_loop(
        0, rem, one_sweep, (hc[:9], hc[9:14], hc[14:19], psi)
    )
    hc = jnp.concatenate([mid, up, dn], axis=0)

    return hc[None], psi[None]
