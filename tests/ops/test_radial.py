"""Radial bases: shapes, cutoffs, limits, normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.ops import radial

pytestmark = pytest.mark.model


def test_gaussian_rbf_peaks_at_centers():
    d = jnp.linspace(0.0, 5.0, 100)
    out = radial.gaussian_rbf(d, num_basis=100, cutoff=5.0)
    assert out.shape == (100, 100)
    np.testing.assert_allclose(np.diag(np.asarray(out)), 1.0, atol=1e-5)


def test_bessel_rbf_finite_at_zero():
    out = radial.bessel_rbf(jnp.asarray([0.0, 1e-12, 0.5]), 8, 5.0)
    assert np.isfinite(np.asarray(out)).all()
    # d->0 limit equals n*pi/c * sqrt(2/c)
    expected = np.sqrt(2 / 5.0) * np.arange(1, 9) * np.pi / 5.0
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-4)


def test_polynomial_envelope_properties():
    x = jnp.linspace(0, 1.2, 50)
    u = radial.polynomial_envelope(x, p=5)
    assert float(u[0]) == pytest.approx(1.0)
    assert (np.asarray(u[x >= 1.0]) == 0).all()
    # decreasing on [0, 1]
    inside = np.asarray(u[x < 1.0])
    assert (np.diff(inside) <= 1e-6).all()


def test_cosine_cutoff():
    d = jnp.asarray([0.0, 2.5, 5.0, 6.0])
    out = radial.cosine_cutoff(d, 5.0)
    np.testing.assert_allclose(np.asarray(out), [1.0, 0.5, 0.0, 0.0], atol=1e-6)


def test_exp_bernstein_partition_of_unity():
    """Bernstein polynomials sum to 1 before the envelope."""
    m = radial.ExpBernsteinRBF(num_basis=8, cutoff=5.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray([1.0]))
    d = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    out = m.apply(params, d)
    env = radial.smooth_transition_cutoff(d, 5.0)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), np.asarray(env), rtol=1e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_smooth_cutoff_is_zero_beyond():
    d = jnp.asarray([4.999, 5.0, 7.0])
    out = radial.smooth_transition_cutoff(d, 5.0)
    assert float(out[1]) == 0.0 and float(out[2]) == 0.0
