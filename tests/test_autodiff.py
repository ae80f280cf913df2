"""Differentiable simulation: reverse-mode AD through full solver steps.

The reference runs its solver under torch without gradients (autograd is
exercised only in the rendering stack); here the pure-function step design
makes the whole simulation differentiable on the jnp path for free —
gradients of a loss on the final fields w.r.t. the initial condition flow
through streaming, bounce-back, collision, the capillary stencils, and the
Poisson ``fori_loop`` (static trip count => scan => reverse-differentiable).
This enables gradient-based initial-condition / inverse-design studies the
reference cannot do, composing with the differentiable renderer
(tests/test_render.py) for pixel-loss-to-physics pipelines.

The Pallas fast path has no custom VJPs — AD users stay on the jnp path
(``use_pallas=False``), which is semantically identical (golden-tested).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu.models import (
    ferrofluid_step_impl,
    hcz_step_impl,
    scenes,
)

pytestmark = pytest.mark.slow  # grad tracing of multi-step programs


def _fd_check(loss, x0, g, eps=1e-3, rtol=2e-2, mask=None):
    """Central finite difference at the max-|grad| entry (optionally
    restricted to ``mask`` — wall cells sit exactly on clamp boundaries
    where AD's subgradient choice and central FD legitimately disagree)."""
    gm = np.where(mask, g, 0.0) if mask is not None else g
    idx = tuple(int(v) for v in np.unravel_index(np.abs(gm).argmax(), g.shape))
    xp = x0.copy()
    xp[idx] += eps
    xm = x0.copy()
    xm[idx] -= eps
    fd = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (2 * eps)
    ad = float(g[idx])
    assert abs(ad - fd) <= rtol * max(abs(fd), 1e-8), (
        f"AD {ad} vs FD {fd} at {idx}"
    )


def _snap(state):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy() if x is not None else None, state
    )


def test_grad_through_hcz_steps():
    """d(interface-variance after 3 HCZ steps)/d(initial rho) is finite,
    nonzero, and matches central finite differences."""
    params, state0 = scenes.multiphase_drop_hcz((16, 16))
    params = params.replace(use_pallas=False)
    snap = _snap(state0)

    def fresh():
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, snap
        )

    @jax.jit
    def loss(rho0):
        s = dataclasses.replace(fresh(), rho=rho0)
        for _ in range(3):
            s = hcz_step_impl(params, s)
        return jnp.mean((s.rho - jnp.mean(s.rho)) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(snap.rho)))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    from lbm_ferrofluid_tpu import CellType

    _fd_check(loss, snap.rho, g, mask=snap.flags == int(CellType.FLUID))


def test_grad_through_ferrofluid_steps():
    """Gradients flow through the FULL ferrofluid step — streaming, HCZ
    capillary + collision, the 3-iteration magnetic Poisson fori_loop and
    the Kelvin force — w.r.t. the initial order parameter."""
    params, state0 = scenes.rosensweig_2d((16, 16), mag_strength=20.0)
    params = params.replace(use_pallas=False, poisson_iters=3)
    snap = _snap(state0)

    def fresh():
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, snap
        )

    @jax.jit
    def loss(rho0):
        s = dataclasses.replace(fresh(), rho=rho0)
        for _ in range(2):
            s = ferrofluid_step_impl(params, s)
        return jnp.mean(s.vel * s.vel) + jnp.mean(s.rho * s.rho)

    g = np.asarray(jax.grad(loss)(jnp.asarray(snap.rho)))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    from lbm_ferrofluid_tpu import CellType

    _fd_check(loss, snap.rho, g, mask=snap.flags == int(CellType.FLUID))
