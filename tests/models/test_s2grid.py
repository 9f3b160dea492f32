"""Gauss-Legendre S2 grid: exactness of the analysis/synthesis pair.

The eSCN / EquiformerV2 grid nonlinearity projects spherical-harmonic
coefficient stacks to a sphere grid and back (reference SO3_Grid,
equiformer_v2/so3.py:462 built on e3nn ToS2Grid/FromS2Grid). With
Gauss-Legendre latitudes the round trip must be the identity for
band-limited signals — this pins the property the round-1 Fibonacci-pinv
grid only approximated (~1e-3 equivariance error; now ~1e-7).
"""

import numpy as np

from nabladft_tpu.models.escn import _grid_mats


def test_round_trip_identity():
    for l_max, n_points in [(2, 20), (4, 50), (6, 98), (6, 196)]:
        to_g, from_g = _grid_mats(l_max, n_points)
        s = (l_max + 1) ** 2
        eye = from_g.astype(np.float64) @ to_g.astype(np.float64)
        assert np.abs(eye - np.eye(s)).max() < 5e-6, (l_max, n_points)


def test_quadrature_integrates_band_limited_products():
    """The from_grid weights realize true sphere integrals for products of
    band-limited functions: <f, g> computed on the grid equals the
    coefficient-space inner product (Parseval)."""
    l_max = 5
    to_g, from_g = _grid_mats(l_max, 2 * (l_max + 1) ** 2)
    s = (l_max + 1) ** 2
    rng = np.random.default_rng(0)
    f = rng.normal(size=(s,))
    g = rng.normal(size=(s,))
    f_grid = to_g.astype(np.float64) @ f
    g_grid = to_g.astype(np.float64) @ g
    # quadrature weights are recoverable from from_grid via Y^+ (row 0 is
    # Y_00 = 1/sqrt(4pi), so w_p = from_grid[0, p] * sqrt(4pi))
    w = from_g.astype(np.float64)[0] * np.sqrt(4 * np.pi)
    assert abs(w.sum() - 4 * np.pi) < 1e-6  # sphere area
    np.testing.assert_allclose((w * f_grid * g_grid).sum(), f @ g, rtol=1e-6)
