"""SO(3) algebra correctness: orthonormality, equivariance, consistency.

These identities pin down the whole equivariant stack — if spherical
harmonics, Wigner-D and CG tables are mutually consistent, every
equivariant model built on them transforms correctly.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.ops import so3

pytestmark = pytest.mark.model

L_MAX = 4


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )


def test_cg_known_values():
    # 1/2-free sanity: l=1 ⊗ l=1 → l=0 is the dot product up to scale
    c = so3.complex_cg(1, 1, 0)
    # <1 m 1 -m | 0 0> = (-1)^(1-m)/sqrt(3)
    for m in (-1, 0, 1):
        expected = (-1.0) ** (1 - m) / math.sqrt(3)
        assert c[m + 1, -m + 1, 0] == pytest.approx(expected, rel=1e-12)


def test_real_cg_paths_real():
    for l1 in range(3):
        for l2 in range(3):
            for l3 in range(abs(l1 - l2), min(l1 + l2, L_MAX) + 1):
                c = so3.real_cg(l1, l2, l3)
                assert np.isfinite(c).all()
                # orthonormal columns: sum over (m1,m2) of C², per m3 = 1
                if l3 <= l1 + l2:
                    norms = np.einsum("abm,abm->m", c, c)
                    np.testing.assert_allclose(norms, 1.0, atol=1e-10)


def test_sph_harm_l1_and_orthonormality():
    pts = fibonacci_sphere(4000)
    y = np.asarray(so3.real_sph_harm(jnp.asarray(pts), L_MAX))
    # l=1 must be sqrt(3/4π)(y,z,x)
    c1 = math.sqrt(3 / (4 * math.pi))
    np.testing.assert_allclose(y[:, 1], c1 * pts[:, 1], atol=1e-5)
    np.testing.assert_allclose(y[:, 2], c1 * pts[:, 2], atol=1e-5)
    np.testing.assert_allclose(y[:, 3], c1 * pts[:, 0], atol=1e-5)
    # Monte-Carlo orthonormality: (4π/N) Σ Y_i Y_j ≈ δ_ij
    gram = 4 * math.pi / len(pts) * (y.T @ y)
    np.testing.assert_allclose(gram, np.eye((L_MAX + 1) ** 2), atol=5e-2)


def test_sph_harm_equivariance():
    """Y(R u) = D(R) Y(u) — ties SH and Wigner-D to the same convention."""
    rng = np.random.default_rng(0)
    u = rng.normal(size=(20, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    rot = random_rotation(rng)
    y_u = np.asarray(so3.real_sph_harm(jnp.asarray(u), L_MAX))
    y_ru = np.asarray(so3.real_sph_harm(jnp.asarray(u @ rot.T), L_MAX))
    d = np.asarray(so3.wigner_d_block(jnp.asarray(rot[None]), L_MAX))[0]
    np.testing.assert_allclose(y_ru, y_u @ d.T, atol=1e-4)


def test_wigner_d_orthogonal_and_homomorphism():
    rng = np.random.default_rng(1)
    r1, r2 = random_rotation(rng), random_rotation(rng)
    for l, d in enumerate(so3.wigner_d(jnp.asarray(np.stack([r1, r2, r1 @ r2])), L_MAX)):
        d = np.asarray(d)
        eye = np.eye(2 * l + 1)
        np.testing.assert_allclose(d[0] @ d[0].T, eye, atol=1e-5)
        # D(r1 r2) = D(r1) D(r2)
        np.testing.assert_allclose(d[2], d[0] @ d[1], atol=1e-4)


def test_cg_equivariance_identity():
    """C must intertwine: C(m1,m2,m3) D3 = (D1 ⊗ D2) C."""
    rng = np.random.default_rng(2)
    rot = jnp.asarray(random_rotation(rng)[None])
    for l1, l2, l3 in [(1, 1, 2), (1, 1, 1), (2, 1, 1), (2, 2, 3), (3, 2, 1)]:
        c = so3.real_cg(l1, l2, l3)
        d1 = np.asarray(so3.wigner_d(rot, l1)[l1])[0]
        d2 = np.asarray(so3.wigner_d(rot, l2)[l2])[0]
        d3 = np.asarray(so3.wigner_d(rot, l3)[l3])[0]
        lhs = np.einsum("abm,mn->abn", c, d3)
        rhs = np.einsum("ax,by,xyn->abn", d1, d2, c)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5, err_msg=f"{(l1,l2,l3)}")


def test_rot_to_z():
    rng = np.random.default_rng(3)
    u = rng.normal(size=(50, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    u = np.vstack([u, [[0, 0, 1]], [[1e-9, 0, -1]]]).astype(np.float64)
    r = np.asarray(so3.rot_to_z(jnp.asarray(u)))
    out = np.einsum("nij,nj->ni", r, u)
    np.testing.assert_allclose(out[:, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[:, :2], 0.0, atol=1e-5)
    # proper rotations
    dets = np.linalg.det(r)
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def test_irreps_layout():
    ir = so3.Irreps([(8, 0), (4, 1), (2, 2)])
    assert ir.dim == 8 + 12 + 10
    x = jnp.arange(ir.dim, dtype=jnp.float32)[None]
    b1 = ir.block(x, 1)
    assert b1.shape == (1, 4, 3)
    assert float(b1[0, 0, 0]) == 8.0
