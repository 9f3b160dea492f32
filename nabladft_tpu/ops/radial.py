"""Radial basis expansions and cutoff envelopes.

One shared library replacing the per-model duplicates in the reference
(GaussianRBF in schnetpack configs, Bessel RBF in painn_pyg/layers.py,
spherical-Bessel radial basis in gemnet_oc/layers/radial_basis.py,
exponential Bernstein polynomials in qhnet/layers.py & phisnet's
exponential_bernstein_polynomials, Gaussian smearing in escn/smearing.py and
graphormer_3d.py:246-270).

All functions are pure, operate on arbitrarily-shaped distance arrays and
broadcast a trailing basis axis; everything is mask-safe: padded distances may
be 0 or huge, callers multiply by their own edge masks. Trainable variants are
thin flax modules around the pure functions.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Envelopes
# ---------------------------------------------------------------------------


def cosine_cutoff(d: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """SchNet-style smooth cosine cutoff: 0.5*(cos(pi d/rc)+1), 0 beyond rc."""
    x = 0.5 * (jnp.cos(jnp.pi * d / cutoff) + 1.0)
    return jnp.where(d < cutoff, x, 0.0)


def polynomial_envelope(d_scaled: jnp.ndarray, p: int = 5) -> jnp.ndarray:
    """DimeNet/GemNet polynomial envelope u(x) on x = d/cutoff in [0,1].

    u(x) = 1 - (p+1)(p+2)/2 x^p + p(p+2) x^(p+1) - p(p+1)/2 x^(p+2),
    zero outside [0, 1). Smooth to order p-1 at the cutoff.
    """
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2.0)
    c = -p * (p + 1) / 2.0
    u = 1.0 + a * d_scaled**p + b * d_scaled ** (p + 1) + c * d_scaled ** (p + 2)
    return jnp.where(d_scaled < 1.0, u, 0.0)


def smooth_transition_cutoff(d: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """PhiSNet-style infinitely differentiable bump cutoff.

    f(x) = exp(-x^2 / ((rc-x)(rc+x))) for x < rc else 0 — C-infinity at rc.
    """
    x = jnp.clip(d, 0.0, cutoff * (1.0 - 1e-6))
    z = x**2 / ((cutoff - x) * (cutoff + x))
    return jnp.where(d < cutoff, jnp.exp(-z), 0.0)


# ---------------------------------------------------------------------------
# Fixed (non-trainable) bases
# ---------------------------------------------------------------------------


def gaussian_rbf(
    d: jnp.ndarray, num_basis: int, cutoff: float, start: float = 0.0
) -> jnp.ndarray:
    """Gaussian RBF with evenly spaced centers on [start, cutoff] (SchNet).

    Matches schnetpack's GaussianRBF semantics used by the reference's
    config/model/schnet.yaml: width = center spacing.
    Returns [..., num_basis].
    """
    centers = jnp.linspace(start, cutoff, num_basis)
    width = (centers[1] - centers[0]) if num_basis > 1 else jnp.asarray(cutoff)
    coeff = -0.5 / width**2
    diff = d[..., None] - centers
    return jnp.exp(coeff * diff**2)


def dimenet_bessel_rbf(
    d: jnp.ndarray, num_basis: int, cutoff: float, envelope_exponent: int = 5,
    freqs: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torch_geometric BesselBasisLayer EXACT semantics: with x = d/cutoff,
    env(x) = u(x)/x (the tg Envelope keeps the 1/x factor) and
    rbf_n = env(x) · sin(freq_n · x), freq_n trainable (init n·π).

    Matches the reference DimeNet++ checkpoints verbatim (the module the
    reference wraps, dimenetplusplus.py:65-81, stores `net.rbf.freq`)."""
    if freqs is None:
        freqs = jnp.arange(1, num_basis + 1, dtype=d.dtype) * jnp.pi
    x = d / cutoff
    x_safe = jnp.where(x > 1e-8, x, 1.0)
    env = polynomial_envelope(x, envelope_exponent) / x_safe
    return env[..., None] * jnp.sin(freqs * x_safe[..., None])


def bessel_rbf(d: jnp.ndarray, num_basis: int, cutoff: float) -> jnp.ndarray:
    """Zeroth-order spherical Bessel basis sqrt(2/rc) sin(n pi d/rc)/d.

    (DimeNet 'radial bessel'; used by painn_pyg/layers.py RadialBasis and
    gemnet_oc radial_basis.py.) Safe at d=0. Returns [..., num_basis].
    """
    n = jnp.arange(1, num_basis + 1, dtype=d.dtype)
    d_safe = jnp.where(d > 1e-8, d, 1.0)
    norm = math.sqrt(2.0 / cutoff)
    out = norm * jnp.sin(n * jnp.pi * d_safe[..., None] / cutoff) / d_safe[..., None]
    # sin(x)/d -> n*pi/cutoff as d->0
    limit = norm * n * jnp.pi / cutoff
    return jnp.where((d > 1e-8)[..., None], out, limit)


def gaussian_smearing(
    d: jnp.ndarray, num_basis: int, start: float, stop: float, basis_width_scalar: float = 1.0
) -> jnp.ndarray:
    """Gaussian smearing on [start, stop] (eSCN/EquiformerV2 smearing.py)."""
    centers = jnp.linspace(start, stop, num_basis)
    width = basis_width_scalar * (centers[1] - centers[0])
    coeff = -0.5 / width**2
    diff = d[..., None] - centers
    return jnp.exp(coeff * diff**2)


# ---------------------------------------------------------------------------
# Trainable bases (flax modules)
# ---------------------------------------------------------------------------


class ExpBernsteinRBF(nn.Module):
    """Exponential Bernstein polynomial basis (QHNet / PhiSNet family).

    b_k(d) = B_{k,K}(exp(-gamma d)) * envelope(d), with trainable gamma
    (softplus-parameterized) — reference semantics: qhnet/layers.py
    ExponentialBernsteinRadialBasisFunctions and phisnet's
    exponential_bernstein_polynomials.py. Log-space evaluation for stability.
    """

    num_basis: int
    cutoff: float
    gamma_init: float = 0.5
    no_basis_at_infinity: bool = False

    @nn.compact
    def __call__(self, d: jnp.ndarray) -> jnp.ndarray:
        K = self.num_basis
        # inverse softplus so softplus(param) == gamma_init at init
        init = math.log(math.expm1(self.gamma_init))
        gamma_p = self.param("gamma", lambda k: jnp.asarray(init, jnp.float32))
        gamma = jax.nn.softplus(gamma_p)

        k = jnp.arange(K, dtype=jnp.float32)
        n = K - 1
        # log binomial(n, k)
        log_binom = (
            jax.scipy.special.gammaln(n + 1.0)
            - jax.scipy.special.gammaln(k + 1.0)
            - jax.scipy.special.gammaln(n - k + 1.0)
        )
        x = -gamma * d[..., None]  # log(exp(-gamma d))
        # B_k = C(n,k) e^{k x'} (1-e^{x'})^{n-k}, computed in log space
        log1m = jnp.log(-jnp.expm1(jnp.minimum(x, -1e-8)))
        logb = log_binom + k * x + (n - k) * log1m
        basis = jnp.exp(logb)
        env = smooth_transition_cutoff(d, self.cutoff)
        return basis * env[..., None]


class PolynomialEnvelopedBessel(nn.Module):
    """Bessel RBF × polynomial envelope (the PaiNN-PyG / DimeNet++ pairing)."""

    num_basis: int
    cutoff: float
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, d: jnp.ndarray) -> jnp.ndarray:
        rbf = bessel_rbf(d, self.num_basis, self.cutoff)
        env = polynomial_envelope(d / self.cutoff, self.envelope_exponent)
        return rbf * env[..., None]


RADIAL_BASES: dict[str, Callable] = {
    "gaussian": gaussian_rbf,
    "bessel": bessel_rbf,
    "gaussian_smearing": gaussian_smearing,
}
