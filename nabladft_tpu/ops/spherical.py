"""Spherical/angular bases: Legendre, spherical Bessel, real spherical
harmonics.

Sympy-free reimplementation of the angular machinery the reference gets
from torch_geometric's DimeNet codegen and e3nn: everything is a stable
recurrence evaluated in-graph, with host-side numpy precompute for Bessel
zeros. Used by DimeNet++ (spherical basis), GemNet-OC (circular/spherical
bases) and, through `ops.so3`, by the equivariant models.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Legendre polynomials P_l(x)  (angular part of Y_l0)
# ---------------------------------------------------------------------------


def legendre_polynomials(x: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """P_0..P_{l_max} via the stable three-term recurrence. [..., L+1]."""
    outs = [jnp.ones_like(x)]
    if l_max >= 1:
        outs.append(x)
    for l in range(2, l_max + 1):
        outs.append(((2 * l - 1) * x * outs[l - 1] - (l - 1) * outs[l - 2]) / l)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Spherical Bessel functions j_l(x) and their zeros
# ---------------------------------------------------------------------------


def _jl_series(x: jnp.ndarray, l: int, n_terms: int = 24) -> jnp.ndarray:
    """Power series j_l(x) = x^l/(2l+1)!! · Σ_k t_k, with the term ratio
    t_{k+1}/t_k = (-x²/2)/((k+1)(2l+2k+3)). Accurate for x ≲ l+2 in f32."""
    dfact = 1.0
    for i in range(1, 2 * l + 2, 2):
        dfact *= i
    t = jnp.ones_like(x)
    s = t
    x2 = x * x
    for k in range(n_terms):
        t = t * (-x2 / 2.0) / ((k + 1) * (2 * l + 2 * k + 3))
        s = s + t
    return (x**l / dfact) * s


def spherical_bessel_jl(x: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """j_0..j_{l_max}(x), stable in float32 over the full basis range.

    The classic upward recurrence amplifies rounding error catastrophically
    for x < l (relative error reaches O(1) at l≳4 — enough to visibly break
    rotation invariance of DimeNet++). We evaluate both the recurrence
    (stable for x > l) and the power series (accurate for x ≲ l+2) and
    select per element.
    """
    x_safe = jnp.maximum(x, 1e-6)
    j0 = jnp.sin(x_safe) / x_safe
    outs = [j0]
    if l_max >= 1:
        outs.append(jnp.sin(x_safe) / x_safe**2 - jnp.cos(x_safe) / x_safe)
    for l in range(2, l_max + 1):
        up = (2 * l - 1) / x_safe * outs[l - 1] - outs[l - 2]
        outs.append(up)
    stacked = []
    for l, up in enumerate(outs):
        if l < 2:
            stacked.append(up)
        else:
            stacked.append(jnp.where(x_safe > l + 1.0, up, _jl_series(x_safe, l)))
    return jnp.stack(stacked, axis=-1)


@lru_cache(maxsize=None)
def spherical_bessel_zeros(l_max: int, n_zeros: int) -> Tuple[Tuple[float, ...], ...]:
    """First n zeros of j_l for l=0..l_max (host-side bisection, cached)."""

    def jl(x: np.ndarray, l: int) -> np.ndarray:
        # Upward recurrence is catastrophically unstable for x < l (rounding
        # noise oscillates around the true, exponentially small j_l and
        # crosses zero — the bisection then reports spurious "zeros" near the
        # trivial root at x=0, which silently killed every l>=3 basis channel
        # of DimeNet++). Use the power series below l+1, recurrence above.
        x = np.maximum(np.asarray(x, np.float64), 1e-12)
        j = [np.sin(x) / x, np.sin(x) / x**2 - np.cos(x) / x]
        for ll in range(2, l + 1):
            j.append((2 * ll - 1) / x * j[ll - 1] - j[ll - 2])
        if l < 2:
            return j[l]
        dfact = 1.0
        for i in range(1, 2 * l + 2, 2):
            dfact *= i
        t = np.ones_like(x)
        s = t.copy()
        for k in range(30):
            t = t * (-x * x / 2.0) / ((k + 1) * (2 * l + 2 * k + 3))
            s = s + t
        series = (x**l / dfact) * s
        return np.where(x > l + 1.0, j[l], series)

    out = []
    for l in range(l_max + 1):
        # start above the trivial l>=1 root at x=0; the first true zero of
        # j_l exceeds the first zero of J_{l+1/2}, which is > l + 1/2
        lo0 = max(1e-3, l * 0.5)
        xs = np.linspace(lo0, (n_zeros + l + 2) * np.pi, 200000)
        vals = jl(xs, l)
        sign = np.signbit(vals)
        crossings = np.nonzero(sign[1:] != sign[:-1])[0]
        zeros = []
        for c in crossings[:n_zeros]:
            lo, hi = xs[c], xs[c + 1]
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                if np.signbit(jl(np.asarray([mid]), l))[0] == np.signbit(
                    jl(np.asarray([lo]), l)
                )[0]:
                    lo = mid
                else:
                    hi = mid
            zeros.append(0.5 * (lo + hi))
        out.append(tuple(zeros))
    return tuple(out)


def dimenet_spherical_basis(
    d: jnp.ndarray,
    cos_angle: jnp.ndarray,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    envelope_exponent: int = 5,
) -> jnp.ndarray:
    """DimeNet a_SBF(d, α): torch_geometric SphericalBasisLayer EXACT
    semantics — radial_ln(x) = √2/|j_{l+1}(z_ln)| · j_l(z_ln·x) with
    x = d/c, times env(x) = u(x)/x (the tg Envelope keeps the 1/x factor),
    times the real Y_l0(α). Matching tg verbatim (constants included) makes
    the pretrained converter a plain weight copy.

    d is the distance of the k→j edge, cos_angle the k→j→i angle. Returns
    [..., num_spherical * num_radial], fastest index = radial.
    """
    from nabladft_tpu.ops.radial import polynomial_envelope

    l_max = num_spherical - 1
    zeros = np.asarray(spherical_bessel_zeros(l_max, num_radial))  # [L+1, R]
    # tg normalization sqrt(2) / |j_{l+1}(z_ln)| (dimenet_utils.bessel_basis)
    jlp1 = np.stack([_np_jl(zeros[l], l + 1) for l in range(l_max + 1)])
    norm = np.sqrt(2.0) / np.abs(jlp1)  # [L+1, R]

    # FLAT layout: every intermediate is 1-D [N]. Lattice-shaped temps with
    # tiny trailing dims ([.., L+1, R]) pad 2.7-16x on (8,128) TPU tiles and
    # reverse-over-reverse stores a copy per AD lane — at B=16 that alone
    # OOM'd the 16 GB chip. Only the final [N, S*R] stack pays lane padding.
    lead = d.shape
    df = d.reshape(-1) / cutoff
    cf = cos_angle.reshape(-1)
    x_safe = jnp.where(df > 1e-8, df, 1.0)
    # tg Envelope: u(x)/x — the 1/x factor is kept (tg SphericalBasisLayer
    # applies self.envelope(dist) with dist already scaled by 1/cutoff)
    env = polynomial_envelope(df, envelope_exponent) / x_safe

    # legendre P_l(cos) by recursion (flat)
    pls = [jnp.ones_like(cf), cf]
    for ll in range(2, l_max + 1):
        pls.append(((2 * ll - 1) * cf * pls[ll - 1] - (ll - 1) * pls[ll - 2]) / ll)

    def jl_flat(x, l):
        xs = jnp.maximum(x, 1e-6)
        j = [jnp.sin(xs) / xs]
        if l >= 1:
            j.append(jnp.sin(xs) / xs**2 - jnp.cos(xs) / xs)
        for ll in range(2, l + 1):
            j.append((2 * ll - 1) / xs * j[ll - 1] - j[ll - 2])
        if l < 2:
            return j[l]
        return jnp.where(xs > l + 1.0, j[l], _jl_series(xs, l))

    outs = []
    for l in range(l_max + 1):
        ang = float(np.sqrt((2 * l + 1) / (4 * np.pi)))
        prefac = env * (ang * pls[l])
        for n in range(num_radial):
            outs.append(prefac * (float(norm[l, n]) * jl_flat(float(zeros[l, n]) * df, l)))
    out = jnp.stack(outs, axis=-1)  # [N, (L+1)*R]
    return out.reshape(*lead, (l_max + 1) * num_radial)


def dimenet_radial_part(
    d: jnp.ndarray,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    envelope_exponent: int = 5,
) -> jnp.ndarray:
    """The radial factor of `dimenet_spherical_basis` WITHOUT the angular
    Legendre term: R̃_ln(x) = √2/|j_{l+1}(z_ln)| · j_l(z_ln·x) · u(x)/x.

    Used by the Legendre-addition-theorem factorization of the DimeNet++
    triplet step (models/dimenetpp.py): with orthonormal real harmonics,
    P_l(û·v̂) = (4π/(2l+1)) Σ_m Y_lm(û) Y_lm(v̂), so
    sbf_ln(d_jk, θ_ijk) = √(4π/(2l+1)) Σ_m Y_lm(û_ji) · R̃_ln(d_jk) Y_lm(û_jk)
    and the [B,A,A,A,S·R] triplet lattice never needs to exist.
    Returns [..., (L+1)·R], index l·R + n. Flat-layout internals (see
    dimenet_spherical_basis)."""
    from nabladft_tpu.ops.radial import polynomial_envelope

    l_max = num_spherical - 1
    zeros = np.asarray(spherical_bessel_zeros(l_max, num_radial))
    jlp1 = np.stack([_np_jl(zeros[l], l + 1) for l in range(l_max + 1)])
    norm = np.sqrt(2.0) / np.abs(jlp1)
    lead = d.shape
    df = d.reshape(-1) / cutoff
    x_safe = jnp.where(df > 1e-8, df, 1.0)
    env = polynomial_envelope(df, envelope_exponent) / x_safe

    def jl_flat(x, l):
        xs = jnp.maximum(x, 1e-6)
        j = [jnp.sin(xs) / xs]
        if l >= 1:
            j.append(jnp.sin(xs) / xs**2 - jnp.cos(xs) / xs)
        for ll in range(2, l + 1):
            j.append((2 * ll - 1) / xs * j[ll - 1] - j[ll - 2])
        if l < 2:
            return j[l]
        return jnp.where(xs > l + 1.0, j[l], _jl_series(xs, l))

    outs = []
    for l in range(l_max + 1):
        for n in range(num_radial):
            outs.append(env * (float(norm[l, n]) * jl_flat(float(zeros[l, n]) * df, l)))
    out = jnp.stack(outs, axis=-1)
    return out.reshape(*lead, (l_max + 1) * num_radial)


def _np_jl(x: np.ndarray, l: int) -> np.ndarray:
    x = np.maximum(np.asarray(x, np.float64), 1e-12)
    j = [np.sin(x) / x, np.sin(x) / x**2 - np.cos(x) / x]
    for ll in range(2, l + 1):
        j.append((2 * ll - 1) / x * j[ll - 1] - j[ll - 2])
    return j[l]


def bessel_radial_basis_with_envelope(
    d: jnp.ndarray, num_radial: int, cutoff: float, envelope_exponent: int = 5
) -> jnp.ndarray:
    """DimeNet e_RBF: enveloped zeroth-order Bessel basis [..., R]."""
    from nabladft_tpu.ops.radial import bessel_rbf, polynomial_envelope

    rbf = bessel_rbf(d, num_radial, cutoff)
    env = polynomial_envelope(d / cutoff, envelope_exponent)
    return rbf * env[..., None]
