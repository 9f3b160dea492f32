"""Fused QHNet tensor-product kernels (conv message + pair block).

QHNet's training step is bandwidth-bound in the XLA formulation: every
ConvNetLayer / PairNetLayer materializes a per-pair path-weight tensor
w = MLP(rbf) * MLP(s0) of shape [B,A,A,P*C] (~0.5 GB at the production
Hamiltonian bucket, P=65 paths, C=128) plus per-path pair-lattice
broadcasts of the node features as dot operands (~2.5 GB/layer). The
measured step moves ~650 GB of HBM traffic for only ~1.7 TFLOP of work
(815 ms at B=4, A=62 on a v5e quarter-chip).

These kernels fuse, per (molecule, receiver-atom) program:

  u_r = h_rbf @ W2r + b2r          # second Dense of the gate MLPs
  u_s = h_s0  @ W2s + b2s          # (first Dense + activation stay in XLA)
  w   = u_r * u_s                  # [A, P*C] — lives only in VMEM
  conv: agg[i] = sum_j sum_p CG_p(x_j (x) sh_ij) * w_p      (+ j-reduce)
  pair: fij[i,j] = sum_p CG_p(node_i (x) node_j) * w_p      (per-pair out)

so the only per-pair HBM tensors left are the small gate hiddens
[B,A,A,H] and, for conv, a channel-independent "cg_sh" table
(cg_sh = sh @ CGSH, shared by all conv layers). The pair kernel's
node_i-side contraction is likewise hoisted to a per-node zi = node @ CGZ
in XLA. Reference semantics: nablaDFT/qhnet/layers.py ConvLayer tensor
products (layers.py:150-344) and PairNetLayer (layers.py:346-494); this
module reproduces nabladft_tpu.models.qhnet.weighted_tensor_product /
self_tensor_product exactly (see tests/ops/test_qhnet_tp.py).

Both ops carry custom VJPs with hand-written backward kernels. QHNet is
a first-order model (no derivative forces), so reverse-mode is all the
engine needs. The sh / cg_sh inputs are declared non-differentiable
(positions are never differentiated in Hamiltonian training); their
cotangents are zero.

Layouts (wrapper code in models/qhnet.py adapts):
  x      [B, S, A, C]   node features, S = (LMAX+1)^2 = 25, lanes = C
  cg_sh  [B, A, A, K]   sum_b CG[a,b,m] * sh_adj[b,i,j,b'] at col(p,a,m)
  zi     [B, A, Kz, C]  sum_a CG[a,b,m] * node[b,i,c,a]    at row(p,b,m)
  h_r/h_s [B, A, A, H]  gate-MLP hiddens (post-activation)
  out    [B, A, S, C]   conv aggregate   (transpose to per-l lists outside)
  fij    [B, A, S, A, C] pair blocks (receiver i, SH slot, neighbor j)
"""

from __future__ import annotations

import functools
from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabladft_tpu.ops import so3

F32 = jnp.float32
LMAX = 4
S = (LMAX + 1) ** 2  # 25


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def tp_paths(lmax: int = LMAX) -> Tuple[Tuple[int, int, int], ...]:
    """(l1, l2, l3) triples — MUST match models.qhnet._tp_paths ordering."""
    paths = []
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                paths.append((l1, l2, l3))
    return tuple(paths)


@lru_cache(maxsize=None)
def _cg_layout(lmax: int = LMAX):
    """Column offsets for the cg_sh table: col(p, a, m) = off[p] + a*(2l3+1) + m."""
    paths = tp_paths(lmax)
    off, offs = 0, []
    for (l1, _, l3) in paths:
        offs.append(off)
        off += (2 * l1 + 1) * (2 * l3 + 1)
    return offs, off  # per-path offsets, total K


@lru_cache(maxsize=None)
def _zi_layout(lmax: int = LMAX):
    """Row offsets for the zi table: row(p, b, m) = off[p] + b*(2l3+1) + m."""
    paths = tp_paths(lmax)
    off, offs = 0, []
    for (_, l2, l3) in paths:
        offs.append(off)
        off += (2 * l2 + 1) * (2 * l3 + 1)
    return offs, off


@lru_cache(maxsize=None)
def cgsh_matrix(lmax: int = LMAX) -> np.ndarray:
    """CGSH [S, K_pad] with cg_sh = sh @ CGSH (sh flat-packed, m=-l..l per l)."""
    paths = tp_paths(lmax)
    offs, k_tot = _cg_layout(lmax)
    out = np.zeros(((lmax + 1) ** 2, _round_up(k_tot, 128)), np.float32)
    for p, (l1, l2, l3) in enumerate(paths):
        cg = so3.real_cg(l1, l2, l3)  # [2l1+1, 2l2+1, 2l3+1]
        for a in range(2 * l1 + 1):
            for b in range(2 * l2 + 1):
                for m in range(2 * l3 + 1):
                    out[l2 * l2 + b, offs[p] + a * (2 * l3 + 1) + m] = cg[a, b, m]
    return out


@lru_cache(maxsize=None)
def cgz_matrix(lmax: int = LMAX) -> np.ndarray:
    """CGZ [S, Kz_pad] with zi[..., row(p,b,m), c] = sum_a node[..., c, l1²+a]·CGZ[l1²+a, row]."""
    paths = tp_paths(lmax)
    offs, k_tot = _zi_layout(lmax)
    out = np.zeros(((lmax + 1) ** 2, _round_up(k_tot, 128)), np.float32)
    for p, (l1, l2, l3) in enumerate(paths):
        cg = so3.real_cg(l1, l2, l3)
        for a in range(2 * l1 + 1):
            for b in range(2 * l2 + 1):
                for m in range(2 * l3 + 1):
                    out[l1 * l1 + a, offs[p] + b * (2 * l3 + 1) + m] = cg[a, b, m]
    return out


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _cols(x, j0, j1):
    return jax.lax.slice_in_dim(x, j0, j1, axis=-1)


# ---------------------------------------------------------------------------
# Analytic FLOP model. XLA's cost analysis reports 0 FLOPs for custom calls,
# which silently deflates MFU numbers (round-2 STATUS gap #4); these formulas
# are attached to each pallas_call as pl.CostEstimate and exported for the
# benchmark's hand-computed MFU.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _path_mults(lmax: int) -> Tuple[int, int, int]:
    """(MACS, SUM_M3, P): Σ(2l1+1)(2l3+1), Σ(2l3+1), path count."""
    paths = tp_paths(lmax)
    macs = sum((2 * l1 + 1) * (2 * l3 + 1) for l1, _, l3 in paths)
    summ3 = sum(2 * l3 + 1 for _, _, l3 in paths)
    return macs, summ3, len(paths)


def conv_fwd_flops(b, a, c, h1, h2, lmax=LMAX) -> int:
    macs, summ3, p = _path_mults(lmax)
    pc = p * c
    per_prog = 2 * a * pc * (h1 + h2) + 2 * a * c * (macs + 2 * summ3 + p)
    return int(b * a * per_prog)


def conv_bwd_flops(b, a, c, h1, h2, lmax=LMAX) -> int:
    macs, summ3, p = _path_mults(lmax)
    pc = p * c
    per_prog = (
        2 * a * pc * (h1 + h2)          # u recompute
        + 2 * a * c * (2 * macs + 3 * summ3 + 3 * p)  # term recompute + gx + gw
        + 2 * a * pc * (h1 + h2)        # ghr/ghs matmuls
        + 2 * a * pc * (h1 + h2)        # gW2 matmuls
        + 4 * a * pc                    # gu_r/gu_s products
    )
    return int(b * a * per_prog)


def pair_fwd_flops(b, a, c, h1, h2, lmax=LMAX) -> int:
    macs_z = sum((2 * l2 + 1) * (2 * l3 + 1) for _, l2, l3 in tp_paths(lmax))
    _, summ3, p = _path_mults(lmax)
    pc = p * c
    per_prog = 2 * a * pc * (h1 + h2) + 2 * a * c * (macs_z + summ3 + 2 * p)
    return int(b * a * per_prog)


def pair_bwd_flops(b, a, c, h1, h2, lmax=LMAX) -> int:
    macs_z = sum((2 * l2 + 1) * (2 * l3 + 1) for _, l2, l3 in tp_paths(lmax))
    _, summ3, p = _path_mults(lmax)
    pc = p * c
    per_prog = (
        2 * a * pc * (h1 + h2)
        + 2 * a * c * (3 * macs_z + 2 * summ3 + 3 * p)
        + 4 * a * pc * (h1 + h2)
        + 6 * a * pc
    )
    return int(b * a * per_prog)


# ---------------------------------------------------------------------------
# conv TP: agg[b,i] = sum_j sum_p CG_p(x_j ⊗ sh_ij) ⊙ w_p[ij]
# ---------------------------------------------------------------------------


def _conv_fwd_kernel(x_ref, cgsh_ref, hr_ref, hs_ref, w2r_ref, b2r_ref,
                     w2s_ref, b2s_ref, out_ref, *, c, lmax):
    paths = tp_paths(lmax)
    offs, _ = _cg_layout(lmax)
    x = x_ref[0]          # [S, A, C]
    cgsh = cgsh_ref[0, 0]  # [A, K]
    u_r = _dot(hr_ref[0, 0], w2r_ref[:]) + b2r_ref[:]  # [A, P*C]
    u_s = _dot(hs_ref[0, 0], w2s_ref[:]) + b2s_ref[:]
    xs = [x[s] for s in range(x.shape[0])]  # [A, C] per flat-SH slot
    n_out = (lmax + 1) ** 2
    acc: List = [None] * n_out
    for p, (l1, _, l3) in enumerate(paths):
        w_p = _cols(u_r, p * c, (p + 1) * c) * _cols(u_s, p * c, (p + 1) * c)
        m3 = 2 * l3 + 1
        for m in range(m3):
            term = None
            for a in range(2 * l1 + 1):
                col = _cols(cgsh, offs[p] + a * m3 + m, offs[p] + a * m3 + m + 1)
                t = xs[l1 * l1 + a] * col
                term = t if term is None else term + t
            row = jnp.sum(term * w_p, axis=0, keepdims=True)  # [1, C]
            s_out = l3 * l3 + m
            acc[s_out] = row if acc[s_out] is None else acc[s_out] + row
    out_ref[0, 0] = jnp.concatenate(acc, axis=0).astype(out_ref.dtype)


def _conv_bwd_kernel(x_ref, cgsh_ref, hr_ref, hs_ref, w2r_ref, b2r_ref,
                     w2s_ref, b2s_ref, g_ref,
                     gx_ref, ghr_ref, ghs_ref, gw2r_ref, gb2r_ref,
                     gw2s_ref, gb2s_ref, *, c, lmax):
    paths = tp_paths(lmax)
    offs, _ = _cg_layout(lmax)
    b_idx, i_idx = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, i_idx == 0))
    def _init_w():
        gw2r_ref[...] = jnp.zeros_like(gw2r_ref)
        gb2r_ref[...] = jnp.zeros_like(gb2r_ref)
        gw2s_ref[...] = jnp.zeros_like(gw2s_ref)
        gb2s_ref[...] = jnp.zeros_like(gb2s_ref)

    @pl.when(i_idx == 0)
    def _init_x():
        gx_ref[...] = jnp.zeros_like(gx_ref)

    x = x_ref[0]
    cgsh = cgsh_ref[0, 0]
    hr = hr_ref[0, 0]
    hs = hs_ref[0, 0]
    u_r = _dot(hr, w2r_ref[:]) + b2r_ref[:]
    u_s = _dot(hs, w2s_ref[:]) + b2s_ref[:]
    g = g_ref[0, 0]  # [S_out, C]
    xs = [x[s] for s in range(x.shape[0])]
    gxs: List = [None] * x.shape[0]
    gw_parts: List = []
    for p, (l1, _, l3) in enumerate(paths):
        w_p = _cols(u_r, p * c, (p + 1) * c) * _cols(u_s, p * c, (p + 1) * c)
        m3 = 2 * l3 + 1
        gw_p = None
        for m in range(m3):
            gm = jax.lax.slice_in_dim(g, l3 * l3 + m, l3 * l3 + m + 1, axis=0)  # [1,C]
            term = None
            cols = []
            for a in range(2 * l1 + 1):
                col = _cols(cgsh, offs[p] + a * m3 + m, offs[p] + a * m3 + m + 1)
                cols.append(col)
                t = xs[l1 * l1 + a] * col
                term = t if term is None else term + t
            gterm = w_p * gm  # [A, C]
            contrib = term * gm
            gw_p = contrib if gw_p is None else gw_p + contrib
            for a in range(2 * l1 + 1):
                gxa = gterm * cols[a]
                s_in = l1 * l1 + a
                gxs[s_in] = gxa if gxs[s_in] is None else gxs[s_in] + gxa
        gw_parts.append(gw_p)
    gw = jnp.concatenate(gw_parts, axis=-1)  # [A, P*C]
    gu_r = gw * u_s
    gu_s = gw * u_r
    ghr_ref[0, 0] = _dot(gu_r, w2r_ref[:].T).astype(ghr_ref.dtype)
    ghs_ref[0, 0] = _dot(gu_s, w2s_ref[:].T).astype(ghs_ref.dtype)
    gw2r_ref[...] += _dot(hr.T, gu_r).astype(gw2r_ref.dtype)
    gw2s_ref[...] += _dot(hs.T, gu_s).astype(gw2s_ref.dtype)
    gb2r_ref[...] += jnp.sum(gu_r, axis=0, keepdims=True).astype(gb2r_ref.dtype)
    gb2s_ref[...] += jnp.sum(gu_s, axis=0, keepdims=True).astype(gb2s_ref.dtype)
    gx_new = jnp.stack(
        [gxs[s] if gxs[s] is not None else jnp.zeros_like(xs[0]) for s in range(x.shape[0])],
        axis=0,
    )
    gx_ref[0] += gx_new.astype(gx_ref.dtype)


def _conv_run_fwd(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, *, lmax, interpret):
    b2r = b2r.reshape(1, -1)
    b2s = b2s.reshape(1, -1)
    b, s, a, c = x.shape
    k = cgsh.shape[-1]
    h1, pc = w2r.shape
    h2 = w2s.shape[0]
    return pl.pallas_call(
        functools.partial(_conv_fwd_kernel, c=c, lmax=lmax),
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, a, k), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, a, s, c), F32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=conv_fwd_flops(b, a, c, h1, h2, lmax),
            bytes_accessed=4 * (x.size + cgsh.size + hr.size + hs.size
                                + w2r.size + w2s.size + b * a * s * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, cgsh, hr, hs, w2r, b2r, w2s, b2s)


def _conv_run_bwd(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, g, *, lmax, interpret):
    b2r = b2r.reshape(1, -1)
    b2s = b2s.reshape(1, -1)
    b, s, a, c = x.shape
    k = cgsh.shape[-1]
    h1, pc = w2r.shape
    h2 = w2s.shape[0]
    return pl.pallas_call(
        functools.partial(_conv_bwd_kernel, c=c, lmax=lmax),
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, a, k), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, a, c), F32),
            jax.ShapeDtypeStruct((b, a, a, h1), F32),
            jax.ShapeDtypeStruct((b, a, a, h2), F32),
            jax.ShapeDtypeStruct((h1, pc), F32),
            jax.ShapeDtypeStruct((1, pc), F32),
            jax.ShapeDtypeStruct((h2, pc), F32),
            jax.ShapeDtypeStruct((1, pc), F32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=conv_bwd_flops(b, a, c, h1, h2, lmax),
            bytes_accessed=4 * (2 * x.size + cgsh.size + 3 * (hr.size + hs.size)
                                + 3 * (w2r.size + w2s.size) + 2 * b * a * s * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def conv_tp(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, lmax=LMAX, interpret=False):
    """Fused conv-layer tensor product. Returns agg [B, A, S, C].

    cgsh must equal sh_adj @ cgsh_matrix() (adjacency premasked); it is
    non-differentiable (zero cotangent) — valid because QHNet never
    differentiates positions.
    """
    return _conv_run_fwd(x, cgsh, hr, hs, w2r, b2r, w2s, b2s,
                         lmax=lmax, interpret=interpret)


def _conv_tp_fwd(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, lmax, interpret):
    out = conv_tp(x, cgsh, hr, hs, w2r, b2r, w2s, b2s, lmax, interpret)
    return out, (x, cgsh, hr, hs, w2r, b2r, w2s, b2s)


def _conv_tp_bwd(lmax, interpret, res, g):
    x, cgsh, hr, hs, w2r, b2r, w2s, b2s = res
    gx, ghr, ghs, gw2r, gb2r, gw2s, gb2s = _conv_run_bwd(
        x, cgsh, hr, hs, w2r, b2r, w2s, b2s, g.astype(F32),
        lmax=lmax, interpret=interpret,
    )
    return (gx, jnp.zeros_like(cgsh), ghr, ghs,
            gw2r, gb2r[0], gw2s, gb2s[0])


conv_tp.defvjp(_conv_tp_fwd, _conv_tp_bwd)


# ---------------------------------------------------------------------------
# pair TP: fij[b,i,j] = sum_p CG_p(node_i ⊗ node_j) ⊙ w_p[ij]
# ---------------------------------------------------------------------------


def _pair_fwd_kernel(x_ref, zi_ref, mask_ref, hr_ref, hs_ref, w2r_ref, b2r_ref,
                     w2s_ref, b2s_ref, out_ref, *, c, lmax):
    paths = tp_paths(lmax)
    offs, _ = _zi_layout(lmax)
    x = x_ref[0]        # [S, A, C]  node_j features
    zi = zi_ref[0, 0]   # [Kz, C]    node_i contraction
    maskf = mask_ref[0, 0]  # [A, 1]
    u_r = _dot(hr_ref[0, 0], w2r_ref[:]) + b2r_ref[:]
    u_s = _dot(hs_ref[0, 0], w2s_ref[:]) + b2s_ref[:]
    xs = [x[s] for s in range(x.shape[0])]
    n_out = (lmax + 1) ** 2
    acc: List = [None] * n_out
    for p, (_, l2, l3) in enumerate(paths):
        w_p = (_cols(u_r, p * c, (p + 1) * c)
               * _cols(u_s, p * c, (p + 1) * c)) * maskf
        m3 = 2 * l3 + 1
        for m in range(m3):
            term = None
            for bb in range(2 * l2 + 1):
                zrow = jax.lax.slice_in_dim(
                    zi, offs[p] + bb * m3 + m, offs[p] + bb * m3 + m + 1, axis=0
                )  # [1, C]
                t = xs[l2 * l2 + bb] * zrow
                term = t if term is None else term + t
            contrib = term * w_p  # [A, C]
            s_out = l3 * l3 + m
            acc[s_out] = contrib if acc[s_out] is None else acc[s_out] + contrib
    out = jnp.stack(
        [acc[s] if acc[s] is not None else jnp.zeros_like(xs[0]) for s in range(n_out)],
        axis=0,
    )  # [S, A, C] — leading-axis stack avoids tile relayouts
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pair_bwd_kernel(x_ref, zi_ref, mask_ref, hr_ref, hs_ref, w2r_ref, b2r_ref,
                     w2s_ref, b2s_ref, g_ref,
                     gx_ref, gzi_ref, ghr_ref, ghs_ref, gw2r_ref, gb2r_ref,
                     gw2s_ref, gb2s_ref, *, c, lmax):
    paths = tp_paths(lmax)
    offs, kz_tot = _zi_layout(lmax)
    b_idx, i_idx = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, i_idx == 0))
    def _init_w():
        gw2r_ref[...] = jnp.zeros_like(gw2r_ref)
        gb2r_ref[...] = jnp.zeros_like(gb2r_ref)
        gw2s_ref[...] = jnp.zeros_like(gw2s_ref)
        gb2s_ref[...] = jnp.zeros_like(gb2s_ref)

    @pl.when(i_idx == 0)
    def _init_x():
        gx_ref[...] = jnp.zeros_like(gx_ref)

    gzi_ref[...] = jnp.zeros_like(gzi_ref)

    x = x_ref[0]
    zi = zi_ref[0, 0]
    maskf = mask_ref[0, 0]
    hr = hr_ref[0, 0]
    hs = hs_ref[0, 0]
    u_r = _dot(hr, w2r_ref[:]) + b2r_ref[:]
    u_s = _dot(hs, w2s_ref[:]) + b2s_ref[:]
    g = g_ref[0, 0]  # [S, A, C]
    xs = [x[s] for s in range(x.shape[0])]
    gxs: List = [None] * x.shape[0]
    gw_parts: List = []
    for p, (_, l2, l3) in enumerate(paths):
        w_p = (_cols(u_r, p * c, (p + 1) * c)
               * _cols(u_s, p * c, (p + 1) * c)) * maskf
        m3 = 2 * l3 + 1
        gw_p = None
        for m in range(m3):
            gm = g[l3 * l3 + m]  # [A, C]
            term = None
            zrows = []
            for bb in range(2 * l2 + 1):
                zrow = jax.lax.slice_in_dim(
                    zi, offs[p] + bb * m3 + m, offs[p] + bb * m3 + m + 1, axis=0
                )
                zrows.append(zrow)
                t = xs[l2 * l2 + bb] * zrow
                term = t if term is None else term + t
            contrib = term * gm
            gw_p = contrib if gw_p is None else gw_p + contrib
            gterm = w_p * gm  # [A, C]
            for bb in range(2 * l2 + 1):
                s_in = l2 * l2 + bb
                gxa = gterm * zrows[bb]
                gxs[s_in] = gxa if gxs[s_in] is None else gxs[s_in] + gxa
                gzi_ref[0, 0, offs[p] + bb * m3 + m, :] = jnp.sum(
                    gterm * xs[s_in], axis=0
                ).astype(gzi_ref.dtype)
        gw_parts.append(gw_p)
    gw = jnp.concatenate(gw_parts, axis=-1)  # [A, P*C], mask folded via w use
    gwm = gw  # gw already corresponds to cotangent of (u_r*u_s*mask)
    gu_r = gwm * u_s * maskf
    gu_s = gwm * u_r * maskf
    ghr_ref[0, 0] = _dot(gu_r, w2r_ref[:].T).astype(ghr_ref.dtype)
    ghs_ref[0, 0] = _dot(gu_s, w2s_ref[:].T).astype(ghs_ref.dtype)
    gw2r_ref[...] += _dot(hr.T, gu_r).astype(gw2r_ref.dtype)
    gw2s_ref[...] += _dot(hs.T, gu_s).astype(gw2s_ref.dtype)
    gb2r_ref[...] += jnp.sum(gu_r, axis=0, keepdims=True).astype(gb2r_ref.dtype)
    gb2s_ref[...] += jnp.sum(gu_s, axis=0, keepdims=True).astype(gb2s_ref.dtype)
    gx_new = jnp.stack(
        [gxs[s] if gxs[s] is not None else jnp.zeros_like(xs[0]) for s in range(x.shape[0])],
        axis=0,
    )
    gx_ref[0] += gx_new.astype(gx_ref.dtype)


def _pair_run_fwd(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, *, lmax, interpret):
    b2r = b2r.reshape(1, -1)
    b2s = b2s.reshape(1, -1)
    b, s, a, c = x.shape
    kz = zi.shape[-2]
    h1, pc = w2r.shape
    h2 = w2s.shape[0]
    return pl.pallas_call(
        functools.partial(_pair_fwd_kernel, c=c, lmax=lmax),
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, kz, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, 1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, s, a, c), lambda bb, ii: (bb, ii, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, a, s, a, c), F32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=pair_fwd_flops(b, a, c, h1, h2, lmax),
            bytes_accessed=4 * (x.size + zi.size + hr.size + hs.size
                                + w2r.size + w2s.size + b * a * s * a * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s)


def _pair_run_bwd(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, g, *, lmax, interpret):
    b2r = b2r.reshape(1, -1)
    b2s = b2s.reshape(1, -1)
    b, s, a, c = x.shape
    kz = zi.shape[-2]
    h1, pc = w2r.shape
    h2 = w2s.shape[0]
    return pl.pallas_call(
        functools.partial(_pair_bwd_kernel, c=c, lmax=lmax),
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, kz, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, 1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, 1, s, a, c), lambda bb, ii: (bb, ii, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, kz, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, h2), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((h1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((h2, pc), lambda bb, ii: (0, 0)),
            pl.BlockSpec((1, pc), lambda bb, ii: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, a, c), F32),
            jax.ShapeDtypeStruct((b, a, kz, c), F32),
            jax.ShapeDtypeStruct((b, a, a, h1), F32),
            jax.ShapeDtypeStruct((b, a, a, h2), F32),
            jax.ShapeDtypeStruct((h1, pc), F32),
            jax.ShapeDtypeStruct((1, pc), F32),
            jax.ShapeDtypeStruct((h2, pc), F32),
            jax.ShapeDtypeStruct((1, pc), F32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=pair_bwd_flops(b, a, c, h1, h2, lmax),
            bytes_accessed=4 * (2 * x.size + 2 * zi.size + 3 * (hr.size + hs.size)
                                + 3 * (w2r.size + w2s.size) + b * a * s * a * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def pair_tp(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, lmax=LMAX, interpret=False):
    """Fused pair-layer tensor product. Returns fij [B, A, S, A, C].

    zi must equal the CGZ contraction of the SAME node features x
    (zi = einsum("bcsa? ..." — see models/qhnet.py); both cotangents are
    emitted so the caller's AD sums the i- and j-side node gradients.
    maskf is the float pair mask (full-graph mask).
    """
    return _pair_run_fwd(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s,
                         lmax=lmax, interpret=interpret)


def _pair_tp_fwd(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, lmax, interpret):
    out = pair_tp(x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, lmax, interpret)
    return out, (x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s)


def _pair_tp_bwd(lmax, interpret, res, g):
    x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s = res
    gx, gzi, ghr, ghs, gw2r, gb2r, gw2s, gb2s = _pair_run_bwd(
        x, zi, maskf, hr, hs, w2r, b2r, w2s, b2s, g.astype(F32),
        lmax=lmax, interpret=interpret,
    )
    return (gx, gzi, jnp.zeros_like(maskf), ghr, ghs,
            gw2r, gb2r[0], gw2s, gb2s[0])


pair_tp.defvjp(_pair_tp_fwd, _pair_tp_bwd)
