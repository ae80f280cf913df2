"""Fused capillary-stencil kernels vs the jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.ops.stencils import isotropic_grad, isotropic_laplacian
from lbm_ferrofluid_tpu.ops.pallas.stencil3d import grad_fields, laplacian_field


def test_grad_fields_matches_jnp():
    Z, Y, X = 6, 8, 128
    rng = np.random.default_rng(9)
    fields = jnp.asarray(rng.uniform(0, 1, (1, 3, Z, Y, X)), jnp.float32)
    # all-FLUID flags: the obstacle substitution happens outside the kernel
    flags = jnp.full((1, 1, Z, Y, X), int(CellType.FLUID), jnp.uint8)

    ref = jnp.concatenate(
        [isotropic_grad(fields[:, i : i + 1], 1.0, flags, 3) for i in range(3)],
        axis=1,
    )
    out = grad_fields(fields, dx=1.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_laplacian_matches_jnp():
    Z, Y, X = 6, 8, 128
    rng = np.random.default_rng(10)
    f = jnp.asarray(rng.uniform(0, 1, (1, 1, Z, Y, X)), jnp.float32)
    ref = isotropic_laplacian(f, 1.0, 3)
    out = laplacian_field(f, dx=1.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
