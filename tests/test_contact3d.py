"""Ring-pipelined contact-angle kernel vs the jnp scatter chain
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lbm_ferrofluid_tpu import CellType
from lbm_ferrofluid_tpu.ops.collide import contact_angle_boundary
from lbm_ferrofluid_tpu.ops.pallas.contact3d import (
    contact_angle_3d,
    contact_angle_3d_supported,
)


@pytest.mark.slow
@pytest.mark.parametrize("Z", [4, 5, 9])
@pytest.mark.parametrize("angle", [0.5 * np.pi, 0.3 * np.pi])
def test_contact3d_matches_jnp(Z, angle):
    Y, X = 8, 128
    rng = np.random.default_rng(17)
    rho = jnp.asarray(rng.uniform(0.02, 0.26, (1, 1, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    # a few FLUID holes in the boundary shell exercise the where=False
    # branch of the face updates
    for _ in range(10):
        z, y = rng.integers(1, Z - 1), rng.integers(1, Y - 1)
        flags[0, 0, z, y, 0] = int(CellType.FLUID)
        z, x = rng.integers(1, Z - 1), rng.integers(1, X - 1)
        flags[0, 0, z, 0, x] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    assert contact_angle_3d_supported(rho.shape)

    want = contact_angle_boundary(rho, flags, float(angle), 3, spmd=False)
    got = contact_angle_3d(rho, flags, float(angle), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )


@pytest.mark.slow
@pytest.mark.parametrize("nz", [2, 4])
def test_contact3d_sharded_matches(nz):
    """Slab-mode kernel (1 rho ghost plane/side + edge-only surgery via
    the SMEM (is_bottom, is_top) pair) == the jnp scatter chain on the
    full domain."""
    import jax

    from lbm_ferrofluid_tpu.parallel import step3d
    from lbm_ferrofluid_tpu.parallel.mesh import make_mesh

    Z, Y, X = 16, 8, 128
    rng = np.random.default_rng(23)
    rho = jnp.asarray(rng.uniform(0.02, 0.26, (1, 1, Z, Y, X)), jnp.float32)
    flags = np.full((1, 1, Z, Y, X), int(CellType.OBSTACLE), np.uint8)
    flags[..., 1:-1, 1:-1, 1:-1] = int(CellType.FLUID)
    for _ in range(12):
        z, y = rng.integers(1, Z - 1), rng.integers(1, Y - 1)
        flags[0, 0, z, y, 0] = int(CellType.FLUID)
        z, x = rng.integers(1, Z - 1), rng.integers(1, X - 1)
        flags[0, 0, z, 0, x] = int(CellType.FLUID)
    flags = jnp.asarray(flags)
    angle = 0.3 * np.pi

    mesh = make_mesh(("z",), (nz,), devices=jax.devices()[:nz])
    assert step3d.contact3d_sharded_ok(mesh, rho.shape, rho.dtype, True)

    want = contact_angle_boundary(rho, flags, float(angle), 3, spmd=False)
    got = step3d.contact3d_sharded(
        rho, flags, float(angle), mesh, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )
