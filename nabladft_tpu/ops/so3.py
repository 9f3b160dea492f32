"""SO(3) algebra: real Clebsch-Gordan tables, spherical harmonics, Wigner-D.

e3nn-free replacement for the machinery the reference pulls from e3nn
(qhnet/layers.py wigner-3j Expansion, escn/so3.py SO3_Rotation with a
precomputed Jd.pt table, equiformer_v2/wigner.py, phisnet's bundled
clebsch_gordan_coefficients_L10.npz). Everything here derives from ONE
source of truth — the complex CG coefficients via the explicit Racah
formula — so spherical harmonics, rotations, and tensor products are
mutually consistent *by construction*:

  * real CG tables: unitary real↔complex change of basis applied to the
    Racah coefficients, de-phased to real (host-side float64, cached);
  * real spherical harmonics Y^l(u): built by the CG recursion
    Y^l ∝ P^T (Y^{l-1} ⊗ Y^1), normalized to the orthonormal convention
    (Y^l_0(ẑ) = sqrt((2l+1)/4π)); Y^1 ∝ (y, z, x);
  * Wigner D^l(R): the same recursion applied to D^1 = perm(R) — no Jd
    tables, valid for arbitrary batched rotation matrices in-graph.

Basis ordering: m = -l..l flat-packed per l at offset l² (total (L+1)²).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Complex Clebsch-Gordan (Racah formula, exact integer factorials)
# ---------------------------------------------------------------------------


def _f(n: int) -> int:
    return math.factorial(n)


def _cg_coeff(l1: int, m1: int, l2: int, m2: int, l3: int, m3: int) -> float:
    """⟨l1 m1 l2 m2 | l3 m3⟩ (Condon-Shortley), standard Racah sum."""
    if m3 != m1 + m2:
        return 0.0
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return 0.0
    pref = (
        (2 * l3 + 1)
        * _f(l3 + l1 - l2)
        * _f(l3 - l1 + l2)
        * _f(l1 + l2 - l3)
        / _f(l1 + l2 + l3 + 1)
    )
    pref *= (
        _f(l3 + m3)
        * _f(l3 - m3)
        * _f(l1 - m1)
        * _f(l1 + m1)
        * _f(l2 - m2)
        * _f(l2 + m2)
    )
    s = 0.0
    for k in range(0, l1 + l2 - l3 + 1):
        denoms = (
            k,
            l1 + l2 - l3 - k,
            l1 - m1 - k,
            l2 + m2 - k,
            l3 - l2 + m1 + k,
            l3 - l1 - m2 + k,
        )
        if any(d < 0 for d in denoms):
            continue
        term = 1.0
        for d in denoms:
            term *= _f(d)
        s += (-1.0) ** k / term
    return math.sqrt(pref) * s


@lru_cache(maxsize=None)
def complex_cg(l1: int, l2: int, l3: int) -> np.ndarray:
    """[2l1+1, 2l2+1, 2l3+1] complex-basis CG (float64)."""
    out = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            m3 = m1 + m2
            if -l3 <= m3 <= l3:
                out[m1 + l1, m2 + l2, m3 + l3] = _cg_coeff(l1, m1, l2, m2, l3, m3)
    return out


@lru_cache(maxsize=None)
def real_to_complex_matrix(l: int) -> np.ndarray:
    """U[m_complex, m_real] with Y_complex = U @ Y_real (standard convention):
      Y_l^m      = ((-1)^m Y_{l,|m|} + i (-1)^m Y_{l,-|m|})/√2   (m>0)
      Y_l^0      = Y_{l,0}
      Y_l^{-|m|} = (Y_{l,|m|} - i Y_{l,-|m|})/√2
    """
    n = 2 * l + 1
    u = np.zeros((n, n), complex)
    s2 = 1.0 / math.sqrt(2.0)
    u[l, l] = 1.0
    for m in range(1, l + 1):
        u[l + m, l + m] = (-1) ** m * s2  # complex +m <- real +m
        u[l + m, l - m] = 1j * (-1) ** m * s2  # complex +m <- real -m
        u[l - m, l + m] = s2  # complex -m <- real +m
        u[l - m, l - m] = -1j * s2  # complex -m <- real -m
    return u


@lru_cache(maxsize=None)
def real_cg(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis CG, de-phased to a real array.

    C_real = U1^T C U3* U2^T-style change of basis; parity-odd paths come
    out purely imaginary and are rotated onto the real axis (a per-path
    constant — harmless, learned weights absorb it; equivariance identity
    is preserved).
    """
    c = complex_cg(l1, l2, l3)
    u1 = real_to_complex_matrix(l1)
    u2 = real_to_complex_matrix(l2)
    u3 = real_to_complex_matrix(l3)
    # Y^c_{m1} Y^c_{m2} -> sum C |l3 m3>: transform all three indices to real
    cr = np.einsum("abc,ax,by,cz->xyz", c, u1, u2, np.conj(u3))
    re, im = np.real(cr), np.imag(cr)
    if np.abs(im).max() > 1e-9 and np.abs(re).max() > 1e-9:
        raise AssertionError(
            f"real CG ({l1},{l2},{l3}) is neither real nor imaginary"
        )
    out = re if np.abs(re).max() >= np.abs(im).max() else im
    return np.ascontiguousarray(out)


# ---------------------------------------------------------------------------
# Real spherical harmonics via the CG recursion
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sh_scale(l_max: int) -> Tuple[float, ...]:
    """Per-l scale making the recursion orthonormal: computed by running the
    recursion at u = ẑ in float64 and matching Y_l0(ẑ) = sqrt((2l+1)/4π)."""
    y1 = np.array([0.0, 1.0, 0.0])  # (y,z,x) of ẑ, unnormalized
    ys = {0: np.array([1.0]), 1: y1}
    scales = [math.sqrt(1.0 / (4 * math.pi))]
    if l_max >= 1:
        scales.append(math.sqrt(3.0 / (4 * math.pi)))
    for l in range(2, l_max + 1):
        c = real_cg(l - 1, 1, l)
        raw = np.einsum("a,b,abm->m", ys[l - 1], y1, c)
        ys[l] = raw / np.abs(raw[l])  # normalized so midpoint (m=0) is 1 at ẑ
        scales.append(math.sqrt((2 * l + 1) / (4 * math.pi)) * np.sign(raw[l]))
    return tuple(float(s) for s in scales)


@lru_cache(maxsize=None)
def _sh_recursion_consts(l_max: int) -> Tuple[float, ...]:
    """1/|raw_l(ẑ)| factors used to keep the recursion normalized."""
    y1 = np.array([0.0, 1.0, 0.0])
    ys = {0: np.array([1.0]), 1: y1}
    consts = [1.0, 1.0]
    for l in range(2, l_max + 1):
        c = real_cg(l - 1, 1, l)
        raw = np.einsum("a,b,abm->m", ys[l - 1], y1, c)
        consts.append(1.0 / abs(raw[l]))
        ys[l] = raw / abs(raw[l])
    return tuple(float(x) for x in consts)


def real_sph_harm_np(unit: np.ndarray, l_max: int, normalized: bool = True) -> np.ndarray:
    """Host-side (numpy, float64) twin of :func:`real_sph_harm` for
    precomputing constant tables — safe to call inside jit traces."""
    unit = np.asarray(unit, np.float64)
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    ys: List[np.ndarray] = [np.ones_like(x)[..., None]]
    if l_max >= 1:
        ys.append(np.stack([y, z, x], axis=-1))
    consts = _sh_recursion_consts(l_max)
    for l in range(2, l_max + 1):
        c = real_cg(l - 1, 1, l)
        raw = np.einsum("...a,...b,abm->...m", ys[l - 1], ys[1], c)
        ys.append(raw * consts[l])
    if normalized:
        scales = _sh_scale(l_max)
        ys = [y_l * s for y_l, s in zip(ys, scales)]
    return np.concatenate(ys, axis=-1)


def real_sph_harm(
    unit: jnp.ndarray, l_max: int, normalized: bool = True
) -> jnp.ndarray:
    """Real spherical harmonics of unit vectors. [..., (L+1)²].

    `normalized=True` gives the orthonormal convention (∫ Y² dΩ = 1);
    `False` gives the "component" normalization Y_l(ẑ)_0 = 1 common in
    message-passing models.
    """
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    ys: List[jnp.ndarray] = [jnp.ones_like(x)[..., None]]
    if l_max >= 1:
        ys.append(jnp.stack([y, z, x], axis=-1))
    consts = _sh_recursion_consts(l_max)
    for l in range(2, l_max + 1):
        c = jnp.asarray(real_cg(l - 1, 1, l), unit.dtype)
        raw = jnp.einsum("...a,...b,abm->...m", ys[l - 1], ys[1], c)
        ys.append(raw * consts[l])
    if normalized:
        scales = _sh_scale(l_max)
        ys = [y_l * s for y_l, s in zip(ys, scales)]
    return jnp.concatenate(ys, axis=-1)


# ---------------------------------------------------------------------------
# Wigner D matrices (real basis) for arbitrary rotations
# ---------------------------------------------------------------------------

_XYZ_TO_YZX = np.array(
    [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]
)  # rows: real-SH order (y,z,x)


def wigner_d(rot: jnp.ndarray, l_max: int) -> List[jnp.ndarray]:
    """D^0..D^L for batched rotation matrices rot [..., 3, 3].

    D^1 = P rot P^T in the (y,z,x) real-SH basis; higher l by exact CG
    projection D^l = C^T (D^{l-1} ⊗ D^1) C with C = real_cg(l-1, 1, l)
    (the l-irrep appears exactly once in (l-1)⊗1, so the projection is the
    representation matrix itself, up to the projector normalization).
    """
    p = jnp.asarray(_XYZ_TO_YZX, rot.dtype)
    d1 = jnp.einsum("ia,...ab,jb->...ij", p, rot, p)
    ds: List[jnp.ndarray] = [jnp.ones((*rot.shape[:-2], 1, 1), rot.dtype), d1]
    for l in range(2, l_max + 1):
        c = jnp.asarray(real_cg(l - 1, 1, l), rot.dtype)
        # norm: columns of C are orthonormal -> C^T (A⊗B) C is exactly D^l
        d = jnp.einsum(
            "abm,...ax,...by,xyn->...mn", c, ds[l - 1], d1, c
        )
        ds.append(d)
    return ds


def wigner_d_block(rot: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Block-diagonal D over the full (L+1)² flat SH vector."""
    ds = wigner_d(rot, l_max)
    n = (l_max + 1) ** 2
    out = jnp.zeros((*rot.shape[:-2], n, n), rot.dtype)
    off = 0
    for l, d in enumerate(ds):
        k = 2 * l + 1
        out = out.at[..., off : off + k, off : off + k].set(d)
        off += k
    return out


def rot_to_z(unit: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix R with R @ unit = ẑ, smooth away from the -ẑ pole.

    (Edge-alignment for the SO(2) reduction, replacing the reference's
    random-vector construction in escn/so3.py SO3_Rotation /
    equiformer_v2/edge_rot_mat.py with a deterministic one.)
    """
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    # Rodrigues: rotate about axis a = unit × ẑ (normalized) by angle θ,
    # cosθ = z. Near unit = ±ẑ the axis is ill-defined; pick x̂ there.
    ax = jnp.stack([y, -x, jnp.zeros_like(x)], axis=-1)
    s = jnp.linalg.norm(ax, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(ax).at[..., 0].set(1.0)
    a = jnp.where(s > eps, ax / jnp.maximum(s, eps), fallback)
    c = z[..., None, None]  # cos θ
    sin_t = jnp.clip(s, 0.0, 1.0)[..., None]
    k = jnp.zeros((*unit.shape[:-1], 3, 3), unit.dtype)
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    zeros = jnp.zeros_like(a0)
    k = jnp.stack(
        [
            jnp.stack([zeros, -a2, a1], axis=-1),
            jnp.stack([a2, zeros, -a0], axis=-1),
            jnp.stack([-a1, a0, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=unit.dtype), k.shape)
    return eye + sin_t * k + (1.0 - c) * (k @ k)


# ---------------------------------------------------------------------------
# Irreps bookkeeping
# ---------------------------------------------------------------------------


class Irreps:
    """A static layout of (mul, l) blocks over a flat feature axis.

    Minimal stand-in for e3nn.o3.Irreps: offsets are Python ints so all
    slicing stays static under jit.
    """

    def __init__(self, spec: Sequence[Tuple[int, int]]):
        self.spec = [(int(mul), int(l)) for mul, l in spec]
        self.offsets: List[int] = []
        off = 0
        for mul, l in self.spec:
            self.offsets.append(off)
            off += mul * (2 * l + 1)
        self.dim = off

    @property
    def lmax(self) -> int:
        return max(l for _, l in self.spec)

    def slices(self) -> List[slice]:
        return [
            slice(o, o + mul * (2 * l + 1))
            for o, (mul, l) in zip(self.offsets, self.spec)
        ]

    def block(self, x: jnp.ndarray, i: int) -> jnp.ndarray:
        """[..., mul, 2l+1] view of block i of a flat [..., dim] array."""
        mul, l = self.spec[i]
        sl = self.slices()[i]
        return x[..., sl].reshape(*x.shape[:-1], mul, 2 * l + 1)

    def __repr__(self) -> str:
        return "+".join(f"{mul}x{l}" for mul, l in self.spec)


def sh_offsets(l_max: int) -> List[Tuple[int, int]]:
    """[(offset, 2l+1)] per l in the flat (L+1)² layout."""
    return [(l * l, 2 * l + 1) for l in range(l_max + 1)]


# ---------------------------------------------------------------------------
# m-major truncated layouts (eSCN / EquiformerV2 SO(2) reduction)
# ---------------------------------------------------------------------------


def mmajor_rows(l_max: int, m_max: int) -> List[Tuple[int, int]]:
    """Row order (l, m) of the m-truncated coefficient stack, grouped by m:
    m=0 (l=0..L), then +m / -m pairs for m=1..M (l=m..L each).

    Grouping by m makes every SO(2)-conv operand a CONTIGUOUS row slice —
    the reference reaches the same layout dynamically via
    CoefficientMapping.reshape_m (escn/so3.py:24-110); here it is the
    static storage order, so no per-layer reshuffle copies exist at all.
    """
    rows = [(l, 0) for l in range(l_max + 1)]
    for m in range(1, m_max + 1):
        rows += [(l, m) for l in range(m, l_max + 1)]
        rows += [(l, -m) for l in range(m, l_max + 1)]
    return rows


def mmajor_cols(l_max: int, m_max: int) -> np.ndarray:
    """Flat (L+1)²-layout column index of each m-major row: l² + l + m."""
    return np.asarray(
        [l * l + l + m for l, m in mmajor_rows(l_max, m_max)], np.int32
    )


def wigner_trunc_mmajor(
    ds: List[jnp.ndarray], l_max: int, m_max: int
) -> jnp.ndarray:
    """Assemble per-l Wigner blocks into ONE [..., S_t, S] block-diagonal
    matrix whose rows are the m-major truncated layout (S_t = Σ 2min(l,M)+1)
    and whose columns are the flat (L+1)² layout.

    One batched matmul with this matrix replaces the per-l rotate+truncate
    einsum loop; its transpose-contraction is the inverse rotation
    (un-truncate). Per-l [..., 2l+1, 2l+1] tensors never reach the layer
    loop, avoiding their catastrophic (8,128)-tile padding (up to 25x) on
    TPU.
    """
    s_full = (l_max + 1) ** 2
    batch = ds[0].shape[:-2]
    # l-major truncated rows first (contiguous slices out of each d-block)
    parts = []
    for l in range(l_max + 1):
        mc = min(l, m_max)
        rows = ds[l][..., l - mc : l + mc + 1, :]  # [..., 2mc+1, 2l+1]
        lo = l * l
        hi = s_full - (l + 1) ** 2
        parts.append(
            jnp.pad(rows, [(0, 0)] * len(batch) + [(0, 0), (lo, hi)])
        )
    lmajor = jnp.concatenate(parts, axis=-2)  # [..., S_t, S]
    # static row permutation l-major -> m-major
    lmajor_order = [
        (l, m)
        for l in range(l_max + 1)
        for m in range(-min(l, m_max), min(l, m_max) + 1)
    ]
    perm = np.asarray(
        [lmajor_order.index(r) for r in mmajor_rows(l_max, m_max)], np.int32
    )
    return jnp.take(lmajor, jnp.asarray(perm), axis=-2)


def wigner_trunc_mmajor_from_rot(
    rot: jnp.ndarray, l_max: int, m_max: int
) -> jnp.ndarray:
    """wigner_d + wigner_trunc_mmajor fused, computed in a lanes-major
    layout: the (huge) edge batch lives in the MINOR axis through the CG
    recursion, so the tiny (2l+1)-sized axes never land on the (8,128)
    tile layout (where they pad up to 25x and dominate the build cost).
    One final transpose restores [..., S_t, S].
    """
    batch_shape = rot.shape[:-2]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    r = rot.reshape(n, 3, 3)
    r = jnp.moveaxis(r, 0, -1)  # [3,3,N]
    p = jnp.asarray(_XYZ_TO_YZX, rot.dtype)
    d1 = jnp.einsum("ia,abN,jb->ijN", p, r, p)
    ds = [jnp.ones((1, 1, n), rot.dtype), d1]
    for l in range(2, l_max + 1):
        c = jnp.asarray(real_cg(l - 1, 1, l), rot.dtype)
        ds.append(jnp.einsum("abm,axN,byN,xyn->mnN", c, ds[l - 1], d1, c))
    # truncated l-major rows, padded into the flat (L+1)^2 column layout
    s_full = (l_max + 1) ** 2
    parts = []
    for l in range(l_max + 1):
        mc = min(l, m_max)
        rows = ds[l][l - mc : l + mc + 1]  # [2mc+1, 2l+1, N]
        lo = l * l
        hi = s_full - (l + 1) ** 2
        parts.append(jnp.pad(rows, [(0, 0), (lo, hi), (0, 0)]))
    lmajor = jnp.concatenate(parts, axis=0)  # [S_t, S, N]
    lmajor_order = [
        (l, m)
        for l in range(l_max + 1)
        for m in range(-min(l, m_max), min(l, m_max) + 1)
    ]
    perm = np.asarray(
        [lmajor_order.index(rw) for rw in mmajor_rows(l_max, m_max)], np.int32
    )
    out = jnp.take(lmajor, jnp.asarray(perm), axis=0)
    out = jnp.moveaxis(out, -1, 0)  # [N, S_t, S]
    return out.reshape(*batch_shape, out.shape[-2], out.shape[-1])


def trunc_compact_layout(l_max: int, m_max: int) -> Tuple[List[int], int]:
    """Per-l offsets and total size of the compact truncated-Wigner value
    vector: block l stores its (2min(l,M)+1) x (2l+1) truncated rows
    row-major at offset off[l]. idx(l, mrow, col) = off[l] + mrow*(2l+1)+col.
    """
    offs, off = [], 0
    for l in range(l_max + 1):
        offs.append(off)
        off += (2 * min(l, m_max) + 1) * (2 * l + 1)
    return offs, off


def wigner_trunc_compact_from_rot(
    rot: jnp.ndarray, l_max: int, m_max: int, pad_to: int = 128
) -> jnp.ndarray:
    """Compact per-edge truncated Wigner values [..., K_pad] (lanes-major
    build like wigner_trunc_mmajor_from_rot, but without the zero block
    structure): the Pallas fused eSCN/EquiformerV2 layer kernels consume
    these as [A, K] lane slices for their rotation MACs.
    """
    batch_shape = rot.shape[:-2]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    r = jnp.moveaxis(rot.reshape(n, 3, 3), 0, -1)
    p = jnp.asarray(_XYZ_TO_YZX, rot.dtype)
    d1 = jnp.einsum("ia,abN,jb->ijN", p, r, p)
    ds = [jnp.ones((1, 1, n), rot.dtype), d1]
    for l in range(2, l_max + 1):
        c = jnp.asarray(real_cg(l - 1, 1, l), rot.dtype)
        ds.append(jnp.einsum("abm,axN,byN,xyn->mnN", c, ds[l - 1], d1, c))
    parts = []
    for l in range(l_max + 1):
        mc = min(l, m_max)
        rows = ds[l][l - mc : l + mc + 1]  # [2mc+1, 2l+1, N]
        parts.append(rows.reshape((2 * mc + 1) * (2 * l + 1), n))
    flat = jnp.concatenate(parts, axis=0)  # [K, N]
    k = flat.shape[0]
    k_pad = ((k + pad_to - 1) // pad_to) * pad_to
    flat = jnp.pad(flat, ((0, k_pad - k), (0, 0)))
    out = jnp.moveaxis(flat, -1, 0)  # [N, K_pad]
    return out.reshape(*batch_shape, k_pad)
