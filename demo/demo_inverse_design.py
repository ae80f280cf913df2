"""Inverse design via differentiable simulation (beyond the reference).

Optimizes the INITIAL order-parameter field so that after N full HCZ
multiphase steps the interface matches a target (a translated droplet),
by gradient descent straight through the solver — streaming, bounce-back,
capillary stencils, collision.  The torch reference cannot do this: its
solver mutates tensors outside autograd; here the pure-function step
design makes d(final fields)/d(initial condition) exact reverse-mode AD
(correctness vs finite differences: tests/test_autodiff.py).

Runs on CPU in ~a minute at the default size.  Artifacts: initial /
optimized / target density PNGs + a loss curve printout.

Usage: python demo_inverse_design.py [--res 24 24] [--steps 4] [--iters 40]
"""

import argparse
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs=2, default=(24, 24))
    ap.add_argument("--steps", type=int, default=4, help="forward solver steps")
    ap.add_argument("--iters", type=int, default=40, help="Adam iterations")
    ap.add_argument("--lr", type=float, default=0.02)
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from lbm_ferrofluid_tpu.models import hcz_step_impl, scenes
    from lbm_ferrofluid_tpu.utils.io import mkdir, save_img

    params, state0 = scenes.multiphase_drop_hcz(tuple(opt.res))
    params = params.replace(use_pallas=False)  # AD runs on the jnp path
    snap = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state0)

    def fresh():
        return jax.tree_util.tree_map(jnp.asarray, snap)

    def forward(rho0):
        s = dataclasses.replace(fresh(), rho=rho0)
        for _ in range(opt.steps):
            s = hcz_step_impl(params, s)
        return s.rho

    # target: the same dynamics from a droplet shifted by ~1/8 domain
    H, W = opt.res
    target_rho0 = np.roll(snap.rho, (H // 8, W // 8), axis=(-2, -1))
    target = forward(jnp.asarray(target_rho0))

    @jax.jit
    def loss_fn(rho0):
        d = forward(rho0) - target
        return jnp.mean(d * d)

    tx = optax.adam(opt.lr)
    rho = jnp.asarray(snap.rho)
    opt_state = tx.init(rho)

    @jax.jit
    def step_opt(rho, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(rho)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(rho, updates), opt_state, loss

    out = pathlib.Path(__file__).parent / "artifacts" / "inverse_design"
    mkdir(str(out))
    save_img(np.asarray(forward(rho)), str(out / "initial_final.png"))
    save_img(np.asarray(target), str(out / "target_final.png"))

    loss0 = None
    for i in range(opt.iters):
        rho, opt_state, loss = step_opt(rho, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if i % 10 == 0 or i == opt.iters - 1:
            print(f"iter {i:3d}: loss {float(loss):.3e}", flush=True)

    final = float(loss_fn(rho))
    save_img(np.asarray(forward(rho)), str(out / "optimized_final.png"))
    print(f"loss {loss0:.3e} -> {final:.3e} "
          f"({loss0 / max(final, 1e-30):.1f}x reduction); artifacts in {out}")
    if not final < 0.5 * loss0:
        raise SystemExit("optimization failed to reduce the loss 2x")


if __name__ == "__main__":
    main()
