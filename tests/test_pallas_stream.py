"""Fused stream+bounce+moments kernel vs jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from lbm_ferrofluid_tpu import CellType, D3Q19
from lbm_ferrofluid_tpu.ops import bounce_back, stream
from lbm_ferrofluid_tpu.ops.pallas.stream3d import (
    stream3d_supported,
    stream_bounce_moments,
)


def test_supported_gate():
    assert stream3d_supported(D3Q19, (1, 19, 8, 8, 128))
    assert not stream3d_supported(D3Q19, (1, 19, 8, 8, 130))
    assert not stream3d_supported(D3Q19, (2, 19, 8, 8, 128))


def test_kernel_matches_jnp():
    Z, Y, X = 6, 8, 128
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.uniform(0.2, 1.0, (1, 19, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    flags = jnp.asarray(flags)

    ref = bounce_back(D3Q19, stream(D3Q19, f), flags)
    m0_ref = jnp.sum(ref, axis=1, keepdims=True)
    e = np.asarray(D3Q19.e, np.float32)
    m1_ref = jnp.stack(
        [jnp.sum(ref * jnp.asarray(e[:, d]).reshape(1, 19, 1, 1, 1), axis=1)
         for d in range(3)],
        axis=1,
    )

    out, m0, m1 = stream_bounce_moments(f, flags, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m0_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1), np.asarray(m1_ref), rtol=1e-4, atol=1e-5
    )
