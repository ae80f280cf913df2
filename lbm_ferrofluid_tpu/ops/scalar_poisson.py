"""Scalar collapse of the magnetic Poisson-LBM solve at tau == 1.

The reference solve (src/LBM/LBM_magnetic/LBM_magnetic_3d.py:108-188) carries
a 19-channel distribution h through [stream -> full-way bounce-back ->
collision].  At tau == 1 the fluid-cell collision is exactly

    h'_q = heq_q + w_q * rhs_scaled = w_q * (psi + rhs_scaled)   (q >= 1)

so post-collision fluid h is a rank-one ("canonical") function of the single
scalar  s = psi + rhs_scaled.  The next sweep's moment then reads

    psi'(x) = 1/(1-w0) * sum_{q>=1} h_q(x - e_q)

i.e. interior taps are  w_q * s(x - e_q).  What about taps whose source
x - e_q is an OBSTACLE cell?  Full-way bounce-back with pull streaming is a
LAG-2 SELF-REFLECTION, for ANY obstacle geometry:

    an obstacle cell x0 updates channel q to the bounce of its own pull,
        h^t_q(x0) = streamed_opp(q)(x0) = h^{t-1}_opp(q)(x0 - e_opp(q))
                  = h^{t-1}_opp(q)(x0 + e_q),
    and x0 + e_q is exactly the fluid cell x1 that will read channel q
    from x0 on the NEXT sweep (pull: streamed_q(x1) = h_q(x1 - e_q),
    x1 - e_q = x0  <=>  x0 + e_q = x1).  So the value a fluid cell reads
    through a wall is its OWN post-collision opposite channel from the
    previous sweep:  w_q * s(x1, t-1)  (weights are parity-symmetric).

No chain through deeper obstacle layers ever reaches a fluid reader, and
psi at obstacle cells is discarded (the gradient substitutes it), so the
whole 19-channel system collapses EXACTLY to one scalar field with a
one-sweep history:

    psi^{t+1}(x) = 1.5 * sum_{q>=1} w_q * s^t(x - e_q)   [s == 0 at obstacles]
                   + c(x) * s^{t-1}(x)
    s^{t+1}    = (psi^{t+1} + rhs_scaled) * fluid_mask

with the static wall-weight field  c(x) = 1.5 * sum_{q: x-e_q obstacle} w_q
(zero in the interior).  Verified BITWISE against the sequential channel
dynamics for shell and interior-obstacle geometries in
tests/test_scalar_poisson.py (the identity above holds in exact f32: the
channel solver stores h_q = f32(w_q * s) and the scalar form recomputes the
identical product).

Preconditions (checked/established at prime time, not per step):
* tau == 1 (otherwise collision mixes the incoming h and no rank-one
  collapse exists),
* a canonical start: h == 0 (models/ferrofluid.py:init_ferrofluid_state)
  gives s = s_prev = 0; resuming from a channel-form checkpoint recovers
  s via ``scalar_from_h`` (ulp-level) and s_prev from the wall channels
  via ``s_prev_from_h``.

Carrying (s, s_prev) across OUTER steps reproduces the reference's h carry
(warm start) exactly: the channel solver's first sweep of a new solve reads
post-collision fluid h (= w_q * s_last) and wall channels
(= w_q * s_prev_last at the reader), which is precisely the scalar carry.

The rest population (q=0) is inert: psi sums q >= 1, q=0 never streams, and
at tau == 1 its collision output is independent of its input —
``h_from_scalar`` reconstructs it for checkpoint/compat consumers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import D3Q19, get_lattice
from ..utils.types import CellType

__all__ = [
    "INV_1MW0",
    "fluid_mask",
    "wall_weight_field",
    "make_cmask",
    "scalar_from_h",
    "s_prev_from_h",
    "h_from_scalar",
    "scalar_sweeps_jnp",
    "compare_views",
]

_OBS = int(CellType.OBSTACLE)

#: 1/(1-w0) = 1/(2/3) = 1.5 — exactly representable; matches the Pallas
#: kernels' inv_1mw0 multiply (ops/pallas/poisson.py).
INV_1MW0 = 1.5


def _lat_of(field):
    """Lattice from array rank: [B, C, Z, Y, X] -> D3Q19, [B, C, Y, X] ->
    D2Q9.  The same rank-one collapse algebra holds for D2Q9 (tau == 1
    collision is w_q * (psi + rhs) for q >= 1 and full-way bounce-back is
    the identical lag-2 self-reflection; reference
    src/LBM/LBM_magnetic/LBM_magnetic_2d.py:88-164)."""
    return get_lattice(field.ndim - 2)


def _psi_of(acc, lat):
    """psi = acc / (1 - w0).  D3Q19: multiply by the exact 1.5 (bitwise
    contract with the Pallas kernels' inv_1mw0, ops/pallas/poisson.py).
    D2Q9: 1/(1 - 4/9) = 1.8 is not exactly representable, so divide by
    f32(1 - w0) exactly as the channel-form solve does
    (ops/magnetic.py:solve_H_int jnp body)."""
    if lat.dim == 3:
        return acc * np.float32(INV_1MW0)
    return acc / np.float32(1.0 - float(lat.weights[0]))


def _roll(x, shift):
    return jnp.roll(x, shift, axis=tuple(range(-len(shift), 0)))


def fluid_mask(magnetic_flags, dtype=jnp.float32):
    """[B,1,Z,Y,X] 1.0 at non-obstacle cells, 0.0 at obstacles."""
    return (magnetic_flags != _OBS).astype(dtype)


def wall_weight_field(magnetic_flags, dtype=jnp.float32):
    """The static lag-tap coefficient  c(x) = 1/(1-w0) sum_{q: x-e_q obs} w_q.

    Nonzero only at fluid cells adjacent to an obstacle; multiplied by
    s_prev(x) it contributes exactly the wall-crossing taps of the sweep.
    Returned masked to fluid cells (psi at obstacles is discarded anyway).
    Lattice (D3Q19 / D2Q9) inferred from the flag array's rank.
    """
    lat = _lat_of(magnetic_flags)
    shifts = lat.shifts()
    obs = (magnetic_flags == _OBS).astype(jnp.float32)
    c = None
    for q in range(1, lat.q):
        t = np.float32(float(lat.weights[q])) * _roll(obs, shifts[q])
        c = t if c is None else c + t
    c = _psi_of(c, lat) * fluid_mask(magnetic_flags)
    return c.astype(dtype)


def make_cmask(magnetic_flags, dtype=jnp.float32):
    """Fused static field for the Pallas scalar kernel: -1.0 at obstacle
    cells, the wall-weight c(x) >= 0 at fluid cells (one stream carries
    both the fluid mask and the wall taps; ops/pallas/scalar_poisson.py)."""
    mask = fluid_mask(magnetic_flags)
    c = wall_weight_field(magnetic_flags)
    return (c * mask - (1.0 - mask)).astype(dtype)


def scalar_from_h(h, magnetic_flags):
    """Recover s from a canonical h:  s = psi(h) = 1.5 * sum_{q>=1} h_q.

    For fluid h_q = w_q * s the moment returns s up to one rounding of the
    weighted sum (few ulp).  Obstacle cells are masked to exact zeros.
    Callers must establish canonicality (tau == 1 post-collision h; the
    prime-time gate in models/ferrofluid.py).
    """
    hf = h.astype(jnp.float32)
    return _psi_of(
        jnp.sum(hf[:, 1:], axis=1, keepdims=True), _lat_of(h)
    ) * fluid_mask(magnetic_flags)


def s_prev_from_h(h, magnetic_flags):
    """Recover s_prev at wall-adjacent fluid cells from the wall channels.

    The obstacle cell x - e_q stores h_q = f32(w_q * s_prev(x)); dividing
    back by w_q recovers s_prev to a few ulp.  Cells with no obstacle
    neighbor return 0 — c(x) == 0 there, so the value is never read.
    Only needed when resuming from a CHANNEL-form h (scalar checkpoints
    save the pair directly); the first post-resume sweep is then exact to
    ulp, and every later sweep regenerates the lag values exactly.
    """
    lat = _lat_of(h)
    shifts = lat.shifts()
    hf = h.astype(jnp.float32)
    obs = magnetic_flags == _OBS
    num = jnp.zeros_like(hf[:, :1])
    den = jnp.zeros_like(hf[:, :1])
    for q in range(1, lat.q):
        src_obs = _roll(obs.astype(jnp.float32), shifts[q])
        tap = _roll(hf[:, q : q + 1], shifts[q])
        num = num + src_obs * tap
        den = den + src_obs * np.float32(float(lat.weights[q]))
    s_prev = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
    return s_prev * fluid_mask(magnetic_flags)


def h_from_scalar(s, s_prev, rhs_scaled, magnetic_flags, h_dtype):
    """Reconstruct the 19-channel h a channel-form solver would carry.

    * fluid q >= 1:  exactly w_q * s,
    * fluid q == 0:  (w0 - 1) * psi + w0 * rhs  with  psi = s - rhs
      (inert for the solve; reconstructed for checkpoint/compat),
    * obstacle channels read by fluid (x + e_q fluid): w_q * s_prev(x+e_q)
      — the lag-2 reflection value the channel dynamics would hold,
    * deeper obstacle channels: 0.  Such chain values NEVER reach a fluid
      reader (module docstring), so the reconstruction is exact at every
      channel any future dynamics consult.
    """
    lat = _lat_of(magnetic_flags)
    shifts = lat.shifts()
    mask = fluid_mask(magnetic_flags)
    obs = 1.0 - mask
    w = jnp.asarray(lat.w_bcast(np.float64), dtype=jnp.float32)
    sf = s.astype(jnp.float32)
    psi = sf - rhs_scaled
    w0 = float(lat.weights[0])
    h0 = ((w0 - 1.0) * psi + w0 * rhs_scaled) * mask
    chans = [h0]
    spf = s_prev.astype(jnp.float32) * mask
    for q in range(1, lat.q):
        wq = np.float32(float(lat.weights[q]))
        fluid_val = wq * sf
        # obstacle cell x holds w_q * s_prev(x + e_q): push s_prev back
        # along -e_q (pull-roll of the OPPOSITE shift)
        lag = wq * _roll(spf, tuple(-v for v in shifts[q]))
        chans.append(fluid_val * mask + lag * obs)
    h = jnp.concatenate(chans, axis=1)
    return h.astype(jnp.dtype(h_dtype))


def compare_views(h_scalar, h_channel, magnetic_flags):
    """Comparable views of a scalar-carry h and a channel-form h.

    Returns ``(a, b)``: the carry's (s, s_prev) with ch1 masked to
    wall-adjacent cells, and the same pair recovered from the channel h
    through the collapse contract.  s_prev is recoverable from channel h
    ONLY at wall-adjacent fluid cells (the obstacle channels that store
    it); elsewhere the carry's dense ch1 is never read by the solve
    (c(x) == 0), so both sides mask it — an unmasked compare reports
    rel_err ~1 on a CORRECT run.  Shared by tools/hw_validate.py and the
    step-level tests so the validator and tests cannot silently diverge.
    """
    wmask = wall_weight_field(magnetic_flags) > 0
    b = jnp.concatenate([
        scalar_from_h(h_channel, magnetic_flags),
        jnp.where(wmask, s_prev_from_h(h_channel, magnetic_flags), 0.0),
    ], axis=1)
    a = jnp.concatenate(
        [h_scalar[:, :1], jnp.where(wmask, h_scalar[:, 1:2], 0.0)], axis=1
    )
    return a, b


def scalar_sweeps_jnp(
    s, s_prev, rhs_scaled, c_wall, magnetic_flags, n_iters, *, order="fast"
):
    """n_iters scalar sweeps; returns (psi_last, s_last, s_prev_last).

    ``s``/``s_prev`` must be fluid-masked (zeros at obstacle cells); the
    periodic rolls then contribute exact zeros for obstacle sources and the
    c(x) * s_prev term supplies the true wall-tap values.

    order="exact" reproduces the sequential channel-form sweep bit-for-bit
    in f32 (modulo XLA FMA-contraction, barriered in the tests): per-tap
    products f32(w_q * tap) summed in ascending q order, with the wall
    sources substituted per tap.  order="fast" groups taps by weight value
    (D3Q19: axis 1/18, diagonal 1/36; D2Q9: axis 1/9, diagonal 1/36) and
    applies the wall taps through the pre-summed c(x) — ~2x fewer VPU
    ops, reassociated (ulp-level shift per sweep, contracted by the
    Jacobi iteration).  Lattice inferred from the array rank (D2Q9 for
    [B, 1, Y, X] fields — the identical collapse algebra, module
    docstring)."""
    lat = _lat_of(s)
    Q = lat.q
    shifts = lat.shifts()
    w = [float(v) for v in lat.weights]
    # group the non-rest taps by weight value (two classes on both
    # lattices: axis-aligned and diagonal)
    w_ax = max(w[1:])
    axis_q = [q for q in range(1, Q) if abs(w[q] - w_ax) < 1e-12]
    diag_q = [q for q in range(1, Q) if abs(w[q] - w_ax) >= 1e-12]
    w_dg = w[diag_q[0]]
    mask = fluid_mask(magnetic_flags)
    obs_f = 1.0 - mask

    if order == "exact":
        # static per-tap wall masks (the roll of the obstacle indicator)
        wall_m = [None] + [_roll(obs_f, shifts[q]) for q in range(1, Q)]

    if lat.dim == 3:
        inv_ax = np.float32(INV_1MW0 * w_ax)
        inv_dg = np.float32(INV_1MW0 * w_dg)
    else:
        # D2Q9: fold the division into the group weights the same way
        # the f64->f32 rounding of the channel form would (ulp-level;
        # fast order is reassociated regardless)
        one_m_w0 = 1.0 - w[0]
        inv_ax = np.float32(w_ax / one_m_w0)
        inv_dg = np.float32(w_dg / one_m_w0)

    def sweep(s, s_prev):
        if order == "exact":
            acc = None
            for q in range(1, Q):
                tap = _roll(s, shifts[q]) + wall_m[q] * s_prev
                t = np.float32(w[q]) * tap
                acc = t if acc is None else acc + t
            psi = _psi_of(acc, lat)
        else:
            A = None
            for q in axis_q:
                t = _roll(s, shifts[q])
                A = t if A is None else A + t
            D = None
            for q in diag_q:
                t = _roll(s, shifts[q])
                D = t if D is None else D + t
            psi = A * inv_ax + D * inv_dg + c_wall * s_prev
        return psi, (psi + rhs_scaled) * mask, s

    def body(_, carry):
        _, s, s_prev = carry
        return sweep(s, s_prev)

    psi0 = jnp.zeros_like(s)
    return jax.lax.fori_loop(0, n_iters, body, (psi0, s, s_prev))
