"""Closed-form lattice invariants (SURVEY.md §4)."""

import numpy as np
import pytest

from lbm_ferrofluid_tpu.lattice import D2Q9, D3Q19


@pytest.mark.parametrize("lat", [D2Q9, D3Q19], ids=lambda l: l.name)
class TestLatticeInvariants:
    def test_weights_normalized(self, lat):
        assert abs(lat.weights.sum() - 1.0) < 1e-14

    def test_first_moment_zero(self, lat):
        m1 = (lat.weights[:, None] * lat.e).sum(axis=0)
        np.testing.assert_allclose(m1, 0.0, atol=1e-14)

    def test_second_moment_isotropic(self, lat):
        # Σ w_q e_qa e_qb = cs2 δ_ab with cs2 = 1/3
        m2 = np.einsum("q,qa,qb->ab", lat.weights, lat.e, lat.e)
        np.testing.assert_allclose(m2, np.eye(lat.dim) / 3.0, atol=1e-14)

    def test_opposite_involution(self, lat):
        np.testing.assert_array_equal(lat.opposite[lat.opposite], np.arange(lat.q))
        np.testing.assert_array_equal(lat.e[lat.opposite], -lat.e)

    def test_speeds(self, lat):
        assert set(np.abs(lat.e).max(axis=1)) <= {0, 1}
