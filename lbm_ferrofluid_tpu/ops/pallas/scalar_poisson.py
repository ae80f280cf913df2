"""Pallas TPU wavefront kernel for the SCALAR tau==1 magnetic Poisson solve.

At tau == 1 the 19-channel Poisson-LBM system (ops/pallas/poisson.py;
reference src/LBM/LBM_magnetic/LBM_magnetic_3d.py:108-188) collapses exactly
to a 1-channel stencil with a one-sweep history (ops/scalar_poisson.py,
verified bitwise vs the channel dynamics):

    psi^{t+1}(x) = 1.5 * sum_{q>=1} w_q * s^t(x - e_q)   [s == 0 at obstacles]
                   + c(x) * s^{t-1}(x)
    s^{t+1}    = (psi^{t+1} + rhs_scaled) * fluid_mask

This kernel runs the same time-skewed wavefront schedule as the channel
kernel (window [-k, Z+k), P = Z+2k bodies, stage s lags stage s-1 by one
plane, wrap planes re-read from an HBM seam stash) but on ONE channel
instead of 19: HBM traffic per sweep drops ~19x and the per-cell VPU work
~6x.  Specifics:

* s and s_prev ride as ONE fused [2, Z, Y, X] f32 array (``s2``): one DMA
  stream in, one aliased in-place output (ch0 = sweep k's s, ch1 = sweep
  k-1's s = the next pass's s_prev), one seam stash.
* stage s's s_prev at plane w is stage s-2's RAW output at plane w — still
  live in its 3-slot ring (write head w+2, so slots hold w, w+1, w+2).
  ring[-1] = the input s stream, ring[-2] = the input s_prev stream.
* the 18-tap stencil is factored per plane into two cached partials
  (computed ONCE when a plane is produced, consumed three times as the
  z-window slides — the capmac.py lesson):
      cross(P) = P(x+-1) + P(y+-1)          (4 rolls)
      diag4(P) = cross-y of Sx               (2 rolls)
      W(P) = w1*P + w2*cross(P)              [side-plane contribution]
      U(P) = w1*cross(P) + w2*diag4(P)       [center-plane contribution]
      psi   = U(P_z) + W(P_{z-1}) + W(P_{z+1}) + c * s_prev
  with w1 = f32(1.5/18), w2 = f32(1.5/36) — the same tap values as
  scalar_sweeps_jnp(order="fast"), reassociated (ulp-level shift per
  sweep, contracted by the Jacobi iteration; tests are tolerance-based).
* obstacles ride in the cmask field: cmask = -1 at obstacle cells and
  c(x) >= 0 (the wall-weight of ops/scalar_poisson.py:wall_weight_field)
  at fluid cells — one static stream carries both the fluid mask and the
  wall taps, and the flags stream of the channel kernel disappears.
* emit="h2": the trailing in-kernel grad stage of the channel kernel
  (psi substitution at obstacles + isotropic grad + |H_ext + H_int|^2),
  verbatim on the scalar psi rings — psi never touches HBM.

Valid only under the scalar-collapse preconditions (tau == 1, canonical
start, fluid-masked s/s_prev — established at prime time by
models/ferrofluid.py; obstacle geometry shell-only for the grad
substitution, validated by validate_mag_shell).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil3d import _GRAD_TAPS, _ring_replicate_plane, _shift_replicate

__all__ = [
    "scalar_wavefront",
    "scalar_wavefront_supported",
    "scalar_wavefront_hint_ok",
    "scalar_sweeps_cmask",
]

_W1 = np.float32(1.5 / 18.0)
_W2 = np.float32(1.5 / 36.0)


def _sp_vmem_budget():
    return int(os.environ.get("LBM_SP_VMEM", 88 * 1024 * 1024))


def _sp_plan(s2_shape, n_iters):
    """Pipeline depth k: prefer k | n_iters (no remainder sweeps), then
    deeper.  VMEM = in rings (2x4 raw + 4 W + 4 U) + 9(k-1) stage planes
    (raw, W, U x 3 slots) + 6 store + 2(k+6) cmask/rhs + 12 psi/grad."""
    _, _, Z, Y, X = s2_shape
    plane = Y * X * 4
    kmax = min(n_iters, (Z - 2) // 2)
    budget = _sp_vmem_budget()
    for k in sorted(range(2, kmax + 1), key=lambda k: (n_iters % k != 0, -k)):
        need = plane * (16 + 9 * (k - 1) + 6 + 2 * (k + 6) + 12)
        if need <= budget:
            return k
    return 0


def scalar_wavefront_supported(s2_shape, s2_dtype, n_iters) -> bool:
    B, C, Z, Y, X = s2_shape
    if not (B == 1 and C == 2 and X % 128 == 0 and Y % 8 == 0):
        return False
    if jnp.dtype(s2_dtype) != jnp.float32:
        return False
    return _sp_plan(s2_shape, n_iters) >= 2


def scalar_wavefront_hint_ok(s2_shape, s2_dtype, n_iters) -> bool:
    """True when the trailing grad stage can emit H2 directly (needs a
    remainder-free pass schedule, like the channel kernel's hint gate)."""
    if not scalar_wavefront_supported(s2_shape, s2_dtype, n_iters):
        return False
    _, _, Z, _, _ = s2_shape
    k = _sp_plan(s2_shape, n_iters)
    return k >= 2 and n_iters % k == 0 and Z >= 4


def _scalar_wavefront_kernel(k, Z, emit, inv12dx, h_ext, FR, slab, ghost,
                             bands, *refs):
    """One pass of k pipelined scalar sweeps over ascending z.

    ``emit``: None (s2 only), "psi" (+psi volume of the last sweep), or
    "h2" (+|h_ext - grad(psi_sub)|^2 from the trailing grad stage).

    ``slab``: a leading SMEM (2,) int32 ref carries the trailing grad
    stage's z-clamp bounds so the same SPMD program clamps only at true
    domain edges (multi-chip ghost-zone slabs, parallel/step3d.py).

    ``ghost``: ``(G, Zl)`` selects ghost-ref slab mode (same contract as
    the channel kernel, ops/pallas/poisson.py:_wavefront_kernel): the s2
    ref holds only the Zl REAL planes (aliased in-place with the output)
    and the G ghost planes per side arrive in two read-only [2, G, Y, X]
    band refs; cmask/rhs arrive EXTENDED.  Real-plane results are
    bit-identical to the extended-array form; ghost outputs are dead.
    The wrap re-reads of extended planes [0, k) land in the lo band
    (k <= G), which is never written — no seam stash.

    ``bands`` (ghost mode only): additionally emit the final (s, s_prev)
    of real planes [0, G) and [Zl-G, Zl) as two [2, G, Y, X] outputs —
    the next exchange round reads these instead of slicing s2."""
    clamp_ref = None
    if slab:
        clamp_ref = refs[0]
        refs = refs[1:]
    s2_ref, c_ref, r_ref = refs[:3]
    refs = refs[3:]
    glo_ref = ghi_ref = None
    if ghost is not None:
        glo_ref, ghi_ref = refs[:2]
        refs = refs[2:]
    out_ref = refs[0]
    refs = refs[1:]
    psi_ref = hint_ref = None
    if emit == "psi":
        psi_ref = refs[0]
        refs = refs[1:]
    elif emit == "h2":
        hint_ref = refs[0]
        refs = refs[1:]
    blo_ref = bhi_ref = None
    if bands:
        blo_ref, bhi_ref = refs[:2]
        refs = refs[2:]
    seam_ref = None
    if ghost is None:
        seam_ref = refs[0]
        refs = refs[1:]
    in_ring, inW, inU, c_ring, r_ring, store_ring = refs[:6]
    refs = refs[6:]
    psi_ring = psi5 = psirep5 = hint_store = None
    if emit == "psi":
        psi_ring = refs[0]
        refs = refs[1:]
    elif emit == "h2":
        psi5, psirep5, hint_store = refs[:3]
        refs = refs[3:]
    stage_rings = list(refs[: k - 1])
    refs = refs[k - 1:]
    sem_in, sem_c, sem_r, sem_o = refs[:4]
    refs = refs[4:]
    sem_p = sem_hint = None
    if emit == "psi":
        sem_p = refs[0]
        refs = refs[1:]
    elif emit == "h2":
        sem_hint = refs[0]
        refs = refs[1:]
    sem_bl = sem_bh = None
    if bands:
        sem_bl, sem_bh = refs[:2]
        refs = refs[2:]
    if ghost is None:
        (sem_s,) = refs

    Y, X = s2_ref.shape[2], s2_ref.shape[3]
    P = Z + 2 * k
    if ghost is not None:
        G_g, Zl_g = ghost
        out_base = k + G_g
        out_end = k + G_g + Zl_g
    else:
        out_base, out_end = k, k + Z

    def rem_(a, n):
        a = jnp.asarray(a)
        return jax.lax.rem(a, jnp.asarray(n, a.dtype))

    def _s_copy(src_ref, idx, plane):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(idx, 1)],
            in_ring.at[:, pl.ds(rem_(plane, 4), 1)],
            sem_in.at[rem_(plane, 4)],
        )

    def _cr_copies(plane):
        src = rem_(plane + (Z - k), Z)
        return (
            pltpu.make_async_copy(
                c_ref.at[:, pl.ds(src, 1)],
                c_ring.at[:, pl.ds(rem_(plane, FR), 1)],
                sem_c.at[rem_(plane, 2)],
            ),
            pltpu.make_async_copy(
                r_ref.at[:, pl.ds(src, 1)],
                r_ring.at[:, pl.ds(rem_(plane, FR), 1)],
                sem_r.at[rem_(plane, 2)],
            ),
        )

    def in_copies(plane, s_from_seam=False):
        # window plane -> wrapped source plane; the wrap re-reads at
        # window >= Z+k come from the pristine seam stash (s2 aliases the
        # output and those planes were already overwritten in place)
        src = rem_(plane + (Z - k), Z)
        s_src = seam_ref if s_from_seam else s2_ref
        return (_s_copy(s_src, src, plane), *_cr_copies(plane))

    def start_in(plane):
        """Start window plane ``plane``'s input copies — ghost-ref mode
        routes extended plane e < G to the lo band, e >= G+Zl to the hi
        band, else the real s2 ref (wrap re-reads land in the read-only
        lo band since k <= G).  All variants move identical byte counts,
        so the shared wait descriptor in ``in_copies`` stays valid.

        NOTE (ghost mode): the wait path deliberately reuses that shared
        descriptor, which slices ``s2_ref`` at the EXTENDED plane index
        (up to Zl+2G-1 against a Zl-plane ref) even for planes whose
        start was routed to a band ref.  This is safe only because (a)
        ``pl.ds`` clamps an out-of-range dynamic start instead of
        faulting, and (b) a DMA semaphore wait consumes a BYTE COUNT,
        not an address — the wait never touches the (clamped,
        meaningless) source slice, it only needs the byte count to match
        the started copy, which it does since every routing variant
        moves one [2, 1, Y, X] plane."""
        if ghost is None:
            for cp in in_copies(plane):
                cp.start()
            return
        e = rem_(plane + (Z - k), Z)

        @pl.when(e < G_g)
        def _():
            _s_copy(glo_ref, e, plane).start()

        @pl.when((e >= G_g) & (e < G_g + Zl_g))
        def _():
            _s_copy(s2_ref, e - G_g, plane).start()

        @pl.when(e >= G_g + Zl_g)
        def _():
            _s_copy(ghi_ref, e - (G_g + Zl_g), plane).start()

        for cp in _cr_copies(plane):
            cp.start()

    def partials(v):
        """cross/diag4 stencil partials of one plane (6 rolls)."""
        Sx = pltpu.roll(v, 1, 1) + pltpu.roll(v, X - 1, 1)
        Sy = pltpu.roll(v, 1, 0) + pltpu.roll(v, Y - 1, 0)
        cross = Sx + Sy
        diag4 = pltpu.roll(Sx, 1, 0) + pltpu.roll(Sx, Y - 1, 0)
        return _W1 * v + _W2 * cross, _W1 * cross + _W2 * diag4

    def fill_in_cache(plane):
        slot = rem_(plane, 4)
        Wp, Up = partials(in_ring[0, slot])
        inW[0, slot] = Wp
        inU[0, slot] = Up

    def out_copy(w):
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 3), 1)],
            out_ref.at[:, pl.ds(w - out_base, 1)],
            sem_o.at[rem_(w, 3)],
        )

    def psi_copy(w):
        return pltpu.make_async_copy(
            psi_ring.at[:, pl.ds(rem_(w, 2), 1)],
            psi_ref.at[:, pl.ds(w - out_base, 1)],
            sem_p.at[rem_(w, 2)],
        )

    # h2 output plane indexing: ghost-ref mode emits only the real planes
    # [G, G+Zl) of the extended psi space (their stencils read ghost psi
    # from the VMEM rings, which fill the extended range)
    hbase = out_base - k
    hend = hbase + (out_end - out_base)

    def hint_copy(p):
        return pltpu.make_async_copy(
            hint_store.at[:, pl.ds(rem_(p, 2), 1)],
            hint_ref.at[:, pl.ds(p - hbase, 1)],
            sem_hint.at[rem_(p, 2)],
        )

    def band_lo_copy(w):
        # second destination of the just-stored plane: the final
        # (s, s_prev) of real planes [0, G) — the next exchange round
        # reads these small outputs instead of slicing the in-place-
        # aliased s2 (the channel kernel's defensive-copy lesson)
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 3), 1)],
            blo_ref.at[:, pl.ds(w - out_base, 1)],
            sem_bl.at[rem_(w, 3)],
        )

    def band_hi_copy(w):
        return pltpu.make_async_copy(
            store_ring.at[:, pl.ds(rem_(w, 3), 1)],
            bhi_ref.at[:, pl.ds(w - out_base - (Zl_g - G_g), 1)],
            sem_bh.at[rem_(w, 3)],
        )

    # ---- preamble: seam stash; planes 0,1 in flight; plane-0 cache -----
    if ghost is None:
        seam_cp = pltpu.make_async_copy(
            s2_ref.at[:, pl.ds(0, k)], seam_ref, sem_s
        )
        seam_cp.start()
    for plane in (0, 1):
        start_in(plane)
    if ghost is None:
        seam_cp.wait()  # must land before plane 0's in-place write at t=k
    for cp in in_copies(0):
        cp.wait()
    fill_in_cache(0)

    def body(t, _):
        # ---- input pipeline: land plane t+1 (+cache), launch t+2 ------
        @pl.when(t + 1 <= P - 1)
        def _():
            for cp in in_copies(t + 1):
                cp.wait()
            fill_in_cache(t + 1)

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
                for cp in in_copies(t + 2, s_from_seam=True):
                    cp.start()

        # ---- pipeline stages, ascending (stage s reads s-1's write) ---
        for s in range(k):

            @pl.when(t >= 2 * s)
            def _(s=s):
                w = t - s
                fr = rem_(w, FR)
                cm = c_ring[0, fr]
                rhs = r_ring[0, fr]
                if s == 0:
                    wm = jnp.maximum(w - 1, 0)
                    wp = jnp.minimum(w + 1, P - 1)
                    Uc = inU[0, rem_(w, 4)]
                    Wm = inW[0, rem_(wm, 4)]
                    Wp_ = inW[0, rem_(wp, 4)]
                    sprev = in_ring[1, rem_(w, 4)]
                else:
                    ring = stage_rings[s - 1]
                    Uc = ring[2, rem_(w, 3)]
                    Wm = ring[1, rem_(w - 1, 3)]
                    Wp_ = ring[1, rem_(w + 1, 3)]
                    if s == 1:
                        sprev = in_ring[0, rem_(w, 4)]
                    else:
                        sprev = stage_rings[s - 2][0, rem_(w, 3)]
                psi = Uc + Wm + Wp_ + jnp.maximum(cm, 0.0) * sprev
                s_new = jnp.where(cm >= 0.0, psi + rhs, 0.0)

                if s < k - 1:
                    ws = rem_(w, 3)
                    Wn, Un = partials(s_new)
                    stage_rings[s][0, ws] = s_new
                    stage_rings[s][1, ws] = Wn
                    stage_rings[s][2, ws] = Un
                    if s == k - 2:
                        # sweep k-1's s = the next pass's s_prev -> ch1 of
                        # the fused output.  One body ahead of ch0, so the
                        # slot-reuse wait lives here (3-slot ring).
                        @pl.when((w >= out_base) & (w < out_end))
                        def _():
                            @pl.when(w - 3 >= out_base)
                            def _():
                                out_copy(w - 3).wait()
                                if bands:
                                    e3 = w - 3 - out_base

                                    @pl.when(e3 < G_g)
                                    def _():
                                        band_lo_copy(w - 3).wait()

                                    @pl.when(e3 >= Zl_g - G_g)
                                    def _():
                                        band_hi_copy(w - 3).wait()

                            store_ring[1, rem_(w, 3)] = s_new
                else:
                    if emit == "h2":
                        # psi (+ its ring-replicated pad) for the trailing
                        # grad stage; 5 slots cover its lag-2 window
                        @pl.when((w >= k) & (w < k + Z))
                        def _():
                            g5 = rem_(w - k, 5)
                            psi5[0, g5] = psi
                            psirep5[0, g5] = _ring_replicate_plane(
                                psi, Y, X
                            )

                    @pl.when((w >= out_base) & (w < out_end))
                    def _():
                        store_ring[0, rem_(w, 3)] = s_new
                        out_copy(w).start()
                        if bands:
                            e0 = w - out_base

                            @pl.when(e0 < G_g)
                            def _():
                                band_lo_copy(w).start()

                            @pl.when(e0 >= Zl_g - G_g)
                            def _():
                                band_hi_copy(w).start()
                        if emit == "psi":
                            @pl.when(w - 2 >= out_base)
                            def _():
                                psi_copy(w - 2).wait()

                            psi_ring[0, rem_(w, 2)] = psi
                            psi_copy(w).start()

        if emit == "h2":
            # trailing stage: H2 plane p = |h_ext - grad(psi_sub)(p)|^2,
            # with the OBSTACLE substitution and boundary-ring semantics
            # of solve_H_int's grad composition done in register (same
            # math as poisson.py's channel trailing stage; is_obs comes
            # from the cmask sign).  psi of global plane p lands at body
            # p+2k-1; the grad stage lags a further 2.  Ghost-ref mode
            # emits only the real planes [G, G+Zl).
            @pl.when((t >= 2 * k + 1 + hbase) & (t <= 2 * k + hend))
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
                    is_obs_q = c_ring[0, rem_(q + k, FR)] < 0.0
                    sub.append(jnp.where(
                        is_obs_q,
                        psirep5[0, rem_(cq, 5)],
                        psi5[0, rem_(q, 5)],
                    ))
                planes3 = {-1: sub[0], 0: sub[1], 1: sub[2]}

                @pl.when(p - 2 >= hbase)
                def _():
                    hint_copy(p - 2).wait()

                slot2 = rem_(p, 2)
                h2 = None
                for d in range(3):
                    acc = None
                    for (oz, oy, ox), wgt in _GRAD_TAPS[d]:
                        tp = _shift_replicate(
                            planes3[oz], -oy, -ox, Y, X
                        ) * wgt
                        acc = tp if acc is None else acc + tp
                    tot = acc * (-inv12dx)
                    if h_ext[d]:
                        tot = tot + h_ext[d]
                    sq = tot * tot
                    h2 = sq if h2 is None else h2 + sq
                hint_store[0, slot2] = _ring_replicate_plane(h2, Y, X)
                hint_copy(p).start()

        return 0

    # h2 runs one extra body: the p = Z-1 output lands at t = Z+2k = P
    jax.lax.fori_loop(0, P + (1 if emit == "h2" else 0), body, 0)

    # drain: out uses a 3-slot ring (waited through out_end-4 in-body),
    # psi/hint 2-slot rings (waited through out_end-3)
    for d in (3, 2, 1):
        out_copy(out_end - d).wait()
        if bands:
            # membership is compile-time: e = Zl - d
            if Zl_g - d < G_g:
                band_lo_copy(out_end - d).wait()
            if Zl_g - d >= Zl_g - G_g:
                band_hi_copy(out_end - d).wait()
    if emit == "psi":
        for d in (2, 1):
            psi_copy(out_end - d).wait()
    if emit == "h2":
        for d in (2, 1):
            hint_copy(hend - d).wait()


def _cmask_sweeps_jnp(s, s_prev, c_k, r_k, n_iters):
    """jnp fallback / remainder sweeps on [Z,Y,X] planes-first arrays,
    fast tap order (grouped weights), cmask-encoded obstacles."""
    mask = (c_k >= 0.0).astype(jnp.float32)
    c_pos = jnp.maximum(c_k, 0.0)

    def roll3(x, sz, sy, sx):
        return jnp.roll(x, (sz, sy, sx), axis=(0, 1, 2))

    axis_sh = [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0),
               (1, 0, 0), (-1, 0, 0)]
    diag_sh = [(0, 1, 1), (0, 1, -1), (0, -1, 1), (0, -1, -1),
               (1, 0, 1), (1, 0, -1), (-1, 0, 1), (-1, 0, -1),
               (1, 1, 0), (1, -1, 0), (-1, 1, 0), (-1, -1, 0)]

    def sweep(carry):
        psi_, s, s_prev = carry
        A = None
        for sh in axis_sh:
            t = roll3(s, *sh)
            A = t if A is None else A + t
        D = None
        for sh in diag_sh:
            t = roll3(s, *sh)
            D = t if D is None else D + t
        psi = A * _W1 + D * _W2 + c_pos * s_prev
        return psi, (psi + r_k) * mask, s

    def body(_, carry):
        return sweep(carry)

    psi0 = jnp.zeros_like(s)
    return jax.lax.fori_loop(0, n_iters, body, (psi0, s, s_prev))


def scalar_wavefront(
    s2: jnp.ndarray,
    cmask: jnp.ndarray,
    rhs_scaled: jnp.ndarray,
    *,
    n_iters: int,
    emit: str = "psi",
    dx: float = 1.0,
    h_ext: tuple | None = None,
    interpret: bool = False,
    k: int | None = None,
    slab_clamp=None,
    ghosts=None,
    emit_bands: bool = False,
):
    """n_iters scalar Poisson sweeps on the fused (s, s_prev) pair.

    ``s2``: [1, 2, Z, Y, X] f32 — ch0 = s, ch1 = s_prev, both fluid-masked
    (exact zeros at obstacle cells).  ``cmask``: [1, 1, Z, Y, X] f32 with
    -1.0 at obstacles, the wall-weight c(x) >= 0 at fluid cells.
    ``rhs_scaled``: [1, 1, Z, Y, X] f32 (the pre-scaled Poisson source;
    obstacle values are ignored).

    Returns (s2', psi) for emit="psi" or (s2', H2) for emit="h2" (requires
    :func:`scalar_wavefront_hint_ok` and a static 3-tuple ``h_ext``); both
    aux outputs are [1, 1, Z, Y, X] f32.  s2' aliases s2 in place.

    The pipeline depth ``k`` defaults to _sp_plan's pick; it is resolved
    HERE (outside the jit boundary) and threaded as a static argument so
    a changed LBM_SP_VMEM cannot silently hit a stale compile cache.

    ``slab_clamp`` (int32 [2], traced): overrides the trailing grad
    stage's z-clamp bounds for multi-chip ghost-zone slabs.

    ``ghosts`` = (lo, hi) [2, G, Y, X] band pair: ghost-ref slab mode —
    ``s2`` holds only the Zl real planes (aliased in-place) and
    cmask/rhs arrive EXTENDED ([1, 1, Zl+2G, Y, X]); requires a
    single-pass plan (k == n_iters, G >= k).  ``emit_bands`` (ghost mode
    only) additionally returns the final (s, s_prev) of real planes
    [0, G) / [Zl-G, Zl) as two [2, G, Y, X] outputs, so the next
    exchange round never slices the aliased s2.
    """
    if k is None:
        if ghosts is not None:
            k = n_iters
        else:
            k = _sp_plan(s2.shape, n_iters)
    return _scalar_wavefront_impl(
        s2, cmask, rhs_scaled, slab_clamp, ghosts, n_iters=n_iters,
        emit=emit, dx=dx, h_ext=h_ext, interpret=interpret, k=k,
        emit_bands=emit_bands,
    )


@functools.partial(jax.jit, static_argnames=(
    "n_iters", "emit", "dx", "h_ext", "interpret", "k", "emit_bands",
))
def _scalar_wavefront_impl(
    s2, cmask, rhs_scaled, slab_clamp, ghosts, *, n_iters, emit, dx,
    h_ext, interpret, k, emit_bands=False,
):
    if emit_bands and ghosts is None:
        raise ValueError("emit_bands requires ghost mode")
    if ghosts is not None:
        glo, ghi = ghosts
        G = glo.shape[1]
        _, C, Zl, Y, X = s2.shape
        Z = Zl + 2 * G
        if cmask.shape[2] != Z or rhs_scaled.shape[2] != Z:
            raise ValueError("ghost mode needs EXTENDED cmask/rhs")
        g_min = k + 1 if emit == "h2" else k
        if not (k == n_iters and G >= g_min and Zl >= 3):
            # Zl >= 3: the exit drain waits out_copy for the last THREE
            # real planes (3-slot ring); at Zl == 2 the third wait would
            # target a never-started DMA — an unmatched semaphore wait
            # hangs real hardware while interpret mode passes (the
            # CLAUDE.md fused_step class).
            # emit='h2' needs G >= k+1, not just k: the trailing grad at a
            # slab-interior edge real plane reads extended psi plane G-1,
            # which is exact after k sweeps only when G-1 >= k — G == k
            # would silently corrupt H2 at slab-boundary planes (the same
            # silent-ghost-corruption class as the round-3 G>Zl bug).
            raise ValueError(
                f"ghost mode requires a single pass, G >= "
                f"{'k+1 (emit=h2 grad validity)' if emit == 'h2' else 'k'} "
                f"and Zl >= 3: k={k} vs n_iters={n_iters}, G={G}, Zl={Zl}"
            )
    else:
        _, C, Z, Y, X = s2.shape
    assert C == 2, "s2 carries (s, s_prev) as 2 channels"
    if emit == "h2" and (h_ext is None or len(h_ext) != 3):
        raise ValueError("emit='h2' requires a static 3-tuple h_ext")
    c_k = cmask[0].astype(jnp.float32)
    r_k = rhs_scaled[0].astype(jnp.float32)

    if k < 2:
        psi, s, sp = _cmask_sweeps_jnp(
            s2[0, 0], s2[0, 1], c_k[0], r_k[0], n_iters
        )
        s2o = jnp.stack([s, sp])[None]
        if emit == "h2":
            raise ValueError("emit='h2' requires a pipelined plan (k >= 2)")
        return s2o, psi[None, None]

    passes, rem = divmod(n_iters, k)
    if emit == "h2" and rem != 0:
        raise ValueError("emit='h2' requires a remainder-free schedule")

    ghost_cfg = (G, Zl) if ghosts is not None else None
    Zout = Zl if ghosts is not None else Z

    def make_call(emit_mode):
        FR = k + 6 if emit_mode == "h2" else k + 2
        scratch = [
            pltpu.VMEM((2, 4, Y, X), jnp.float32),   # raw s/s_prev in ring
            pltpu.VMEM((1, 4, Y, X), jnp.float32),   # W cache of in planes
            pltpu.VMEM((1, 4, Y, X), jnp.float32),   # U cache of in planes
            pltpu.VMEM((1, FR, Y, X), jnp.float32),  # cmask ring
            pltpu.VMEM((1, FR, Y, X), jnp.float32),  # rhs ring
            pltpu.VMEM((2, 3, Y, X), jnp.float32),   # fused store ring
        ]
        out_shape = [jax.ShapeDtypeStruct((2, Zout, Y, X), jnp.float32)]
        if emit_mode == "psi":
            scratch.append(pltpu.VMEM((1, 2, Y, X), jnp.float32))
            out_shape.append(
                jax.ShapeDtypeStruct((1, Zout, Y, X), jnp.float32)
            )
        elif emit_mode == "h2":
            scratch += [
                pltpu.VMEM((1, 5, Y, X), jnp.float32),  # psi ring
                pltpu.VMEM((1, 5, Y, X), jnp.float32),  # psi pad ring
                pltpu.VMEM((1, 2, Y, X), jnp.float32),  # H2 store ring
            ]
            out_shape.append(
                jax.ShapeDtypeStruct((1, Zout, Y, X), jnp.float32)
            )
        if emit_bands:
            out_shape += [
                jax.ShapeDtypeStruct((2, G, Y, X), jnp.float32),
                jax.ShapeDtypeStruct((2, G, Y, X), jnp.float32),
            ]
        if ghosts is None:
            # HBM seam stash of planes [0, k) (in-place wrap re-reads);
            # ghost-ref mode reads the wrap planes from the read-only lo
            # band instead
            out_shape.append(
                jax.ShapeDtypeStruct((2, k, Y, X), jnp.float32)
            )
        scratch += [
            pltpu.VMEM((3, 3, Y, X), jnp.float32) for _ in range(k - 1)
        ]
        scratch += [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
        ]
        if emit_mode in ("psi", "h2"):
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
        if emit_bands:
            scratch += [
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((3,)),
            ]
        if ghosts is None:
            scratch.append(pltpu.SemaphoreType.DMA(()))
        slab = slab_clamp is not None and emit_mode == "h2"
        n_in = 5 if ghosts is not None else 3
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
        if slab:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        call = pl.pallas_call(
            functools.partial(
                _scalar_wavefront_kernel, k, Z, emit_mode,
                1.0 / (12.0 * dx),
                tuple(float(v) for v in h_ext) if h_ext else None,
                FR, slab, ghost_cfg, emit_bands,
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

    if ghosts is not None:
        # single pass by construction (k == n_iters)
        outs = make_call(emit)(s2[0], c_k, r_k)
        if emit_bands:
            if emit is None:
                return outs[0][None], (outs[1], outs[2])
            return outs[0][None], outs[1][None], (outs[2], outs[3])
        if emit is None:
            return (outs[0][None],)
        return outs[0][None], outs[1][None]

    call_plain = make_call(None)
    n_plain = passes - (1 if rem == 0 else 0)

    def one_pass(_, sc):
        return call_plain(sc, c_k, r_k)[0]

    sc = jax.lax.fori_loop(0, n_plain, one_pass, s2[0])
    if rem == 0:
        outs = make_call(emit)(sc, c_k, r_k)
        return outs[0][None], outs[1][None]

    # remainder sweeps in jnp (rare configs; emit="psi" only)
    psi, s, sp = _cmask_sweeps_jnp(sc[0], sc[1], c_k[0], r_k[0], rem)
    return jnp.stack([s, sp])[None], psi[None, None]


def scalar_sweeps_cmask(s2, cmask, rhs_scaled, n_iters):
    """Pure-jnp scalar sweeps on the fused layout (testing / fallback)."""
    psi, s, sp = _cmask_sweeps_jnp(
        s2[0, 0], s2[0, 1], cmask[0, 0].astype(jnp.float32),
        rhs_scaled[0, 0].astype(jnp.float32), n_iters,
    )
    return jnp.stack([s, sp])[None], psi[None, None]
