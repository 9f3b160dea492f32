"""Fused DimeNet++ triplet aggregation kernels.

The XLA formulation of the interaction block's triplet step materializes
three [B,A,K,K2,E] HBM tensors per block (the k→j edge-message gather, the
sbf→int_emb projection, and their masked product; ~100 MB each at B=8) and
is pure bandwidth — MFU 0.04, and reverse-over-reverse derivative forces
multiply the traffic (~47 GB at B=64, the r2 memory wall). Reference
semantics: torch_geometric DimeNetPlusPlus interaction block
(dimenetplusplus/dimenetplusplus.py:22-109 wraps it), which scatters over
host-built triplet index arrays.

The step is one trilinear contraction with a neighbor gather:

    agg[b,a,k,e] = sum_{k2,c} s8[b,a,k,k2,c] * w2[c,e] * xkj[b,j,k2,e],
    j = idx[b,a,k]

where s8 = Dense_{basis_emb}(sbf) (trip-masked: invalid triplets are zero
rows, so the kernels need no masks), xkj is the int_emb edge message, and
w2 the sbf second projection. These kernels run it per (molecule, receiver)
program entirely in VMEM — the [K,K2,·] lattice never exists in HBM.

Differentiation: the map T(s8, xkj, w2, g) = Σ s8·xkj(j)·w2·g is
QUADRILINEAR (g = the output cotangent), so each partial derivative is the
same contraction with one slot swapped. The four kernels

    F_g = ∂T/∂g  = agg        F_s = ∂T/∂s8 = d_s8
    F_x = ∂T/∂xkj = d_xkj     F_w = ∂T/∂w2 = d_w2

are therefore mutually-recursive custom VJPs closed under differentiation
to ALL orders — exactly what -∂E/∂pos training (reverse-over-reverse)
needs, with no dual-number kernels. Parity: tests/ops/test_dimenet_triplet.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _int_zeros(x):
    """float0 cotangent for the integer idx input."""
    return np.zeros(x.shape, jax.dtypes.float0)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())), preferred_element_type=F32
    )


# ---------------------------------------------------------------- kernels ----


def _agg_kernel(idx_s, s8_r, xkj_r, w2_r, out_r):
    K = s8_r.shape[2]
    w2 = w2_r[:]
    for k in range(K):
        j = idx_s[0, pl.program_id(1), k]
        xj = xkj_r[0, j]                      # [K2, E]
        t1 = _dot(s8_r[0, 0, k], xj, (((0,), (0,))))   # [C, E]
        out_r[0, 0, k] = jnp.sum(w2 * t1, axis=0)


def _ds8_kernel(idx_s, g_r, xkj_r, w2_r, out_r):
    K = g_r.shape[2]
    w2 = w2_r[:]
    for k in range(K):
        j = idx_s[0, pl.program_id(1), k]
        xj = xkj_r[0, j]                      # [K2, E]
        ge = w2 * g_r[0, 0, k][None, :]       # [C, E]
        out_r[0, 0, k] = _dot(xj, ge, (((1,), (1,))))  # [K2, C]


def _dxkj_kernel(idx_s, s8_r, g_r, w2_r, out_r):
    K = s8_r.shape[2]
    w2 = w2_r[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_r[:] = jnp.zeros_like(out_r)

    for k in range(K):
        j = idx_s[0, pl.program_id(1), k]
        ge = w2 * g_r[0, 0, k][None, :]       # [C, E]
        m = _dot(s8_r[0, 0, k], ge, (((1,), (0,))))    # [K2, E]
        out_r[0, j] = out_r[0, j] + m


def _dw2_kernel(idx_s, s8_r, xkj_r, g_r, out_r):
    K = s8_r.shape[2]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_r[:] = jnp.zeros_like(out_r)

    acc = jnp.zeros(out_r.shape, F32)
    for k in range(K):
        j = idx_s[0, pl.program_id(1), k]
        xj = xkj_r[0, j]
        t1 = _dot(s8_r[0, 0, k], xj, (((0,), (0,))))   # [C, E]
        acc = acc + t1 * g_r[0, 0, k][None, :]
    out_r[:] = out_r[:] + acc


# ------------------------------------------------------------- dispatcher ----


def _specs(B, A, K, K2, C, E):
    """BlockSpecs shared by the four kernels, keyed by logical role."""
    return {
        "idx": pl.BlockSpec((1, A, K), lambda b, a: (b, 0, 0),
                            memory_space=pltpu.SMEM),
        "bak_k2c": pl.BlockSpec((1, 1, K, K2, C), lambda b, a: (b, a, 0, 0, 0),
                                memory_space=pltpu.VMEM),
        "b_k2e": pl.BlockSpec((1, A, K2, E), lambda b, a: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM),
        "bak_e": pl.BlockSpec((1, 1, K, E), lambda b, a: (b, a, 0, 0),
                              memory_space=pltpu.VMEM),
        "ce": pl.BlockSpec((C, E), lambda b, a: (0, 0),
                           memory_space=pltpu.VMEM),
    }


def _cost(B, A, K, K2, C, E):
    return pl.CostEstimate(
        flops=2 * B * A * K * K2 * C * E + 2 * B * A * K * C * E,
        bytes_accessed=4 * B * A * K * (K2 * C + 2 * E) + 4 * B * A * K2 * E,
        transcendentals=0,
    )


def _run(kernel, idx, ins, in_roles, out_shape, out_role, interpret):
    B, A, K = idx.shape
    # derive dims from whichever operand carries them
    dims = {}
    for x, role in zip(ins, in_roles):
        if role == "bak_k2c":
            dims["K2"], dims["C"] = x.shape[-2], x.shape[-1]
        elif role == "b_k2e":
            dims["K2"], dims["E"] = x.shape[-2], x.shape[-1]
        elif role == "ce":
            dims["C"], dims["E"] = x.shape
    K2, C, E = dims["K2"], dims["C"], dims["E"]
    sp = _specs(B, A, K, K2, C, E)
    return pl.pallas_call(
        kernel,
        grid=(B, A),
        in_specs=[sp["idx"]] + [sp[r] for r in in_roles],
        out_specs=sp[out_role],
        out_shape=jax.ShapeDtypeStruct(out_shape, F32),
        cost_estimate=_cost(B, A, K, K2, C, E),
        interpret=interpret,
    )(idx, *[x.astype(F32) for x in ins])


# --------------------------------------------------- custom-vjp quadruple ----
# Each function's VJP w.r.t. argument z is the z-slot function with this
# function's slot filled by the cotangent (quadrilinearity of T).


@jax.custom_vjp
def triplet_agg(s8, xkj, w2, idx):
    """agg[b,a,k,e] = Σ_{k2,c} s8[b,a,k,k2,c]·w2[c,e]·xkj[b,idx[b,a,k],k2,e]."""
    B, A, K = idx.shape
    E = xkj.shape[-1]
    return _run(_agg_kernel, idx, (s8, xkj, w2),
                ("bak_k2c", "b_k2e", "ce"), (B, A, K, E), "bak_e",
                _interp())


@jax.custom_vjp
def _d_s8(g, xkj, w2, idx):
    B, A, K = idx.shape
    K2, C = xkj.shape[-2], w2.shape[0]
    return _run(_ds8_kernel, idx, (g, xkj, w2),
                ("bak_e", "b_k2e", "ce"), (B, A, K, K2, C), "bak_k2c",
                _interp())


@jax.custom_vjp
def _d_xkj(s8, g, w2, idx):
    B, A, K = idx.shape
    K2, E = s8.shape[-2], w2.shape[1]
    return _run(_dxkj_kernel, idx, (s8, g, w2),
                ("bak_k2c", "bak_e", "ce"), (B, A, K2, E), "b_k2e",
                _interp())


@jax.custom_vjp
def _d_w2(s8, xkj, g, idx):
    C, E = s8.shape[-1], xkj.shape[-1]
    return _run(_dw2_kernel, idx, (s8, xkj, g),
                ("bak_k2c", "b_k2e", "bak_e"), (C, E), "ce",
                _interp())


def _interp() -> bool:
    return jax.default_backend() == "cpu"


def _agg_fwd(s8, xkj, w2, idx):
    return triplet_agg(s8, xkj, w2, idx), (s8, xkj, w2, idx)


def _agg_bwd(res, g):
    s8, xkj, w2, idx = res
    g = g.astype(F32)
    return (_d_s8(g, xkj, w2, idx).astype(s8.dtype),
            _d_xkj(s8, g, w2, idx).astype(xkj.dtype),
            _d_w2(s8, xkj, g, idx).astype(w2.dtype), _int_zeros(idx))


triplet_agg.defvjp(_agg_fwd, _agg_bwd)


def _ds8_fwd(g, xkj, w2, idx):
    return _d_s8(g, xkj, w2, idx), (g, xkj, w2, idx)


def _ds8_bwd(res, v):
    g, xkj, w2, idx = res
    v = v.astype(F32)
    return (triplet_agg(v, xkj, w2, idx).astype(g.dtype),
            _d_xkj(v, g, w2, idx).astype(xkj.dtype),
            _d_w2(v, xkj, g, idx).astype(w2.dtype), _int_zeros(idx))


_d_s8.defvjp(_ds8_fwd, _ds8_bwd)


def _dxkj_fwd(s8, g, w2, idx):
    return _d_xkj(s8, g, w2, idx), (s8, g, w2, idx)


def _dxkj_bwd(res, u):
    s8, g, w2, idx = res
    u = u.astype(F32)
    return (_d_s8(g, u, w2, idx).astype(s8.dtype),
            triplet_agg(s8, u, w2, idx).astype(g.dtype),
            _d_w2(s8, u, g, idx).astype(w2.dtype), _int_zeros(idx))


_d_xkj.defvjp(_dxkj_fwd, _dxkj_bwd)


def _dw2_fwd(s8, xkj, g, idx):
    return _d_w2(s8, xkj, g, idx), (s8, xkj, g, idx)


def _dw2_bwd(res, w):
    s8, xkj, g, idx = res
    w = w.astype(F32)
    return (_d_s8(g, xkj, w, idx).astype(s8.dtype),
            _d_xkj(s8, g, w, idx).astype(xkj.dtype),
            triplet_agg(s8, xkj, w, idx).astype(g.dtype), _int_zeros(idx))


_d_w2.defvjp(_dw2_fwd, _dw2_bwd)
