"""Fused EquiformerV2 SO(2) graph-attention kernel.

Same design as ops/pallas/escn_layer.py (read that header first): one
pallas_call per (molecule, receiver) runs the whole per-edge attention
pipeline of SO2GraphAttention in VMEM:

  rotate+truncate src/tgt (compact masked Wigner MACs) -> channel concat
  -> per-(l,channel) radial scale (computed in-kernel from edge feats)
  -> SO2 conv 1 (packed complex matmuls, extra m0 alpha/gate scalars)
  -> separable S2 activation (grid silu on l>0 rows, plain silu gates on
  the l=0 row) -> SO2 conv 2 -> per-head LayerNorm+silu alpha logits ->
  masked softmax over neighbors -> value weighting -> rotate back ->
  neighbor reduction.

Reference semantics: nablaDFT/equiformer_v2/transformer_block.py:22-326;
math parity vs models/equiformer_v2.SO2GraphAttention is pinned by
tests/ops/test_eqv2_attn.py. The per-l output projection (node-level)
stays in XLA.

Alpha dropout: the caller passes a pre-scaled keep mask [B,A,A,NH]
(1/(1-p) or 0; ones for eval) — RNG stays outside the kernel.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nabladft_tpu.ops import so3
from nabladft_tpu.ops.pallas.escn_layer import (
    F32,
    _dsilu,
    _grid_factor_tables,
    _grid_silu_factored,
    _grid_tables,
    _mdot,
    _mm_rows,
    _rotate_fwd,
    _spans,
    s_trunc,
)


def attn_fwd_flops(b, a, k, c2, co, ec, l_max, m_max, n_grid, nh, va) -> int:
    """a = receivers per molecule (gather width), k = compacted edges."""
    st = s_trunc(l_max, m_max)
    s_full = (l_max + 1) ** 2
    rot_macs = sum(
        (2 * min(l, m_max) + 1) * (2 * l + 1) for l in range(l_max + 1)
    )
    n0 = l_max + 1
    so2_1 = 2 * k * (n0 * c2) * (n0 * co + nh * va + co)
    so2_2 = 2 * k * (n0 * co) * (n0 * co)
    for m in range(1, m_max + 1):
        n_l = l_max + 1 - m
        so2_1 += 2 * (2 * k) * (n_l * c2) * (2 * n_l * co)
        so2_2 += 2 * (2 * k) * (n_l * co) * (2 * n_l * co)
    per = (
        2 * s_full * k * a * (c2 // 2)            # one-hot neighbor gather
        + 2 * rot_macs * k * (c2 // 2) * 2        # rotations (src+tgt, C each)
        + 2 * k * ec * (n0 * c2)                  # radial-scale matmul
        + so2_1 + so2_2
        + 2 * 2 * n_grid * st * k * co            # grid act
        + 2 * k * nh * va * 6                     # LN + alpha dot
        + 2 * rot_macs * k * co                   # rotate back
    )
    return int(b * a * per)


def attn_bwd_flops(*args) -> int:
    return int(2.6 * attn_fwd_flops(*args))


def _expanders(nh: int, va: int, co: int):
    """Static per-head reduce/broadcast matrices (see _attn_pipeline)."""
    m_avg = np.kron(np.eye(nh, dtype=np.float32),
                    np.full((va, 1), 1.0 / va, np.float32))
    m_exp = np.kron(np.eye(nh, dtype=np.float32), np.ones((1, va), np.float32))
    m_expv = np.kron(np.eye(nh, dtype=np.float32),
                     np.ones((1, co // nh), np.float32))
    return jnp.asarray(m_avg), jnp.asarray(m_exp), jnp.asarray(m_expv)


# ---------------------------------------------------------------------------
# pipeline (jnp-traceable; runs inside the kernels and in tests)
# ---------------------------------------------------------------------------


def _so2_eq(flat, c_in, co, w_m0, fcm, l_max, m_max, mxu_bf16):
    """EqV2 SO2 conv on the m-major flat [A, S_t*c_in].
    w_m0 [n0*c_in, n0*co + extra]; fcm[m-1] [n_l*c_in, 2*n_l*co] packed
    (wr | wi). Returns (flat_out [A, S_t*co], extra [A, extra])."""
    spans = _spans(l_max, m_max)
    a = flat.shape[0]
    s0, n0 = spans[0]
    f0 = jax.lax.slice_in_dim(flat, s0 * c_in, (s0 + n0) * c_in, axis=-1)
    h0 = _mdot(f0, w_m0, mxu_bf16)
    if h0.shape[-1] > n0 * co:
        out0 = jax.lax.slice_in_dim(h0, 0, n0 * co, axis=-1)
        extra = jax.lax.slice_in_dim(h0, n0 * co, h0.shape[-1], axis=-1)
    else:
        out0, extra = h0, None
    parts = [out0]
    for m in range(1, m_max + 1):
        sp, n_l = spans[2 * m - 1]
        sm, _ = spans[2 * m]
        fp = jax.lax.slice_in_dim(flat, sp * c_in, (sp + n_l) * c_in, axis=-1)
        fm = jax.lax.slice_in_dim(flat, sm * c_in, (sm + n_l) * c_in, axis=-1)
        both = jnp.concatenate([fp, fm], axis=0)  # [2A, n_l*c_in]
        o = _mdot(both, fcm[m - 1], mxu_bf16)  # [2A, 2*n_l*co]
        o_r = jax.lax.slice_in_dim(o, 0, n_l * co, axis=-1)
        o_i = jax.lax.slice_in_dim(o, n_l * co, 2 * n_l * co, axis=-1)
        rp = jax.lax.slice_in_dim(o_r, 0, a, axis=0)
        rm = jax.lax.slice_in_dim(o_r, a, 2 * a, axis=0)
        ip = jax.lax.slice_in_dim(o_i, 0, a, axis=0)
        im = jax.lax.slice_in_dim(o_i, a, 2 * a, axis=0)
        parts.append(rp - im)
        parts.append(rm + ip)
    return jnp.concatenate(parts, axis=-1), extra


def _attn_pipeline(x, oh, xi, d, xe, maskf, dropk, w_rad, b_rad, w1, fc1m,
                   w2, fc2m, ln_scale, ln_bias, alpha_dot, m_avg, m_exp,
                   m_expv, *, l_max, m_max, c, co, nh, va, n_grid, mxu_bf16):
    """Receiver-blocked attention messages over the K-compacted neighbor
    list: R receivers of one molecule per call, edge rows stacked to
    [R·K, ·] so the SO2 matmuls fill MXU row tiles (K=30 alone wastes ¾
    of each 128-row tile; R=4 → 120 rows) and the per-program weight
    loads amortize over R receivers. Compaction skips the (A-K) dead
    edge slots of the dense formulation entirely — the reference caps
    neighbors at max_neighbors (equiformer_v2 config), so the SO2 FLOPs
    here drop by A/K ≈ 1.6x at the bench shapes.

    x [S,A,C] molecule features (shared across receivers); oh [R,K,A]
    masked one-hot gather matrix (row k of receiver i selects atom
    nl.idx[i,k]; gathers/scatters run as matmuls — Mosaic has no
    sublane gather); per-receiver blocks xi [R,S,C]; d [R,K,KW] masked
    compact Wigner; xe [R,K,EC3]; maskf [R,K,1] float; dropk [R,K,NH];
    w_rad [EC3,(L+1)*2C]; w1 [n0*2C, n0*co+nh*va+co];
    fc1m[m] [n_l*2C, 2 n_l co]; w2 [n0*co, n0*co];
    fc2m[m] [n_l*co, 2 n_l co];
    ln_scale/ln_bias [1, NH*va] PRE-TILED per head; alpha_dot [1, NH*va]
    lane-major; m_avg [NH*va, NH] (1/va group-average), m_exp [NH, NH*va]
    and m_expv [NH, co] (0/1 group expanders) — per-head reductions and
    broadcasts run as matmuls because Mosaic cannot broadcast offset-lane
    row vectors. Softmax and the neighbor reduction are segment ops over
    each receiver's K-row block. Returns agg [R, S, co]."""
    rows = _mm_rows(l_max, m_max)
    st = len(rows)
    s_full = (l_max + 1) ** 2
    r, a = d.shape[0], d.shape[1]
    ra = r * a
    k_pad = d.shape[-1]
    oh = oh.reshape(ra, oh.shape[-1])
    d = d.reshape(ra, k_pad)
    xe = xe.reshape(ra, xe.shape[-1])
    maskf = maskf.reshape(ra, 1)
    dropk = dropk.reshape(ra, dropk.shape[-1])

    xs_rows = [
        _mdot(oh, x[s], mxu_bf16) for s in range(s_full)
    ]  # [RK, C] neighbor-gathered molecule rows
    xi_rows = [
        jnp.broadcast_to(xi[:, s : s + 1, :], (r, a, c)).reshape(ra, c)
        for s in range(s_full)
    ]  # receiver row broadcast over its own K edge rows
    src, tgt = _rotate_fwd(xs_rows, xi_rows, d, l_max, m_max)
    # radial scale, shared over m within each l (rotation-commuting)
    rad = _mdot(xe, w_rad, mxu_bf16) + b_rad  # [A, (L+1)*2C]
    c2 = 2 * c
    flat_parts = []
    for ri, (l, m) in enumerate(rows):
        rl = jax.lax.slice_in_dim(rad, l * c2, (l + 1) * c2, axis=-1)
        blk = jnp.concatenate([src[ri], tgt[ri]], axis=-1) * rl  # [RA, 2C]
        flat_parts.append(blk)
    flat = jnp.concatenate(flat_parts, axis=-1)  # [RA, S_t*2C]

    hidden, extra = _so2_eq(flat, c2, co, w1, fc1m, l_max, m_max, mxu_bf16)
    alpha_scal = jax.lax.slice_in_dim(extra, 0, nh * va, axis=-1)
    gate_scal = jax.lax.slice_in_dim(extra, nh * va, nh * va + co, axis=-1)

    # separable S2 act: two-stage (lat,lon) grid silu on rows 1..St-1,
    # plain silu gates on the l=0 row (see escn_layer._grid_factor_tables)
    blocks = [
        jax.lax.slice_in_dim(hidden, s * co, (s + 1) * co, axis=-1)
        for s in range(st)
    ]
    acted = _grid_silu_factored(blocks, l_max, m_max, n_grid)
    acted[0] = jax.nn.silu(gate_scal)
    hidden2 = jnp.concatenate(acted, axis=-1)

    values, _ = _so2_eq(hidden2, co, co, w2, fc2m, l_max, m_max, mxu_bf16)

    # attention: per-head LN + silu + dot — group reductions/broadcasts as
    # matmuls (full-width, lane-offset 0), masked softmax over neighbors
    ah = alpha_scal.astype(F32)  # [A, NH*va]
    mu = _mdot(_mdot(ah, m_avg, False), m_exp, False)  # per-head mean, tiled
    cen = ah - mu
    var = _mdot(_mdot(cen * cen, m_avg, False), m_exp, False)
    ln = cen * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
    act = jax.nn.silu(ln)
    logits = _mdot(act * alpha_dot, m_avg, False) * float(va)  # group sums
    neg = jnp.float32(-1e9)
    logits = jnp.where(maskf > 0.5, logits, neg)
    # masked softmax over each receiver's own A-row segment
    lg3 = logits.reshape(r, a, nh)
    lmax_ = jnp.max(lg3, axis=1, keepdims=True)
    ex = jnp.exp(lg3 - lmax_).reshape(ra, nh) * jnp.where(maskf > 0.5, 1.0, 0.0)
    den = jnp.maximum(jnp.sum(ex.reshape(r, a, nh), axis=1, keepdims=True), 1e-20)
    alpha = (ex.reshape(r, a, nh) / den).reshape(ra, nh)
    alpha = alpha * dropk  # pre-scaled keep mask

    # expand alpha [A,NH] -> [A,co] (vc lanes per head) via the 0/1 matmul
    aexp = _mdot(alpha, m_expv, False)  # [A, co]
    vblocks = [
        jax.lax.slice_in_dim(values, r * co, (r + 1) * co, axis=-1) * aexp
        for r in range(st)
    ]

    # rotate back + per-receiver neighbor reduction
    offs, _ = so3.trunc_compact_layout(l_max, m_max)
    out_rows: List = [None] * s_full
    for rr, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d, idx, idx + 1, axis=-1)
            t = dc * vblocks[rr]
            s = l * l + col
            out_rows[s] = t if out_rows[s] is None else out_rows[s] + t
    reduced = [
        jnp.sum(rw.reshape(r, a, co), axis=1, keepdims=True) for rw in out_rows
    ]  # each [R, 1, co]
    return jnp.concatenate(reduced, axis=1)  # [R, S, co]


# ---------------------------------------------------------------------------
# hand-written backward (mirrors escn_layer._pipeline_bwd; verified against
# jax.vjp of _attn_pipeline in tests/ops/test_eqv2_attn.py). Replacing the
# in-kernel jax.vjp removes every autodiff-stored intermediate from VMEM —
# the backward keeps only the handful of tensors it actually re-contracts
# (flat slices, SO2 hidden halves, grid u-blocks, attention scalars), which
# is what lets the bwd kernel run the same receiver blocking as the forward.
# ---------------------------------------------------------------------------


def _so2_eq_save(flat, c_in, co, w_m0, fcm, l_max, m_max, mxu_bf16):
    """_so2_eq that also returns the residuals its backward needs:
    (out_flat, extra, f0, boths) where boths[m-1] is the stacked [2A, n_l*c_in]
    input of the m-th packed matmul."""
    spans = _spans(l_max, m_max)
    a = flat.shape[0]
    s0, n0 = spans[0]
    f0 = jax.lax.slice_in_dim(flat, s0 * c_in, (s0 + n0) * c_in, axis=-1)
    h0 = _mdot(f0, w_m0, mxu_bf16)
    if h0.shape[-1] > n0 * co:
        out0 = jax.lax.slice_in_dim(h0, 0, n0 * co, axis=-1)
        extra = jax.lax.slice_in_dim(h0, n0 * co, h0.shape[-1], axis=-1)
    else:
        out0, extra = h0, None
    parts = [out0]
    boths = []
    for m in range(1, m_max + 1):
        sp, n_l = spans[2 * m - 1]
        sm, _ = spans[2 * m]
        fp = jax.lax.slice_in_dim(flat, sp * c_in, (sp + n_l) * c_in, axis=-1)
        fm = jax.lax.slice_in_dim(flat, sm * c_in, (sm + n_l) * c_in, axis=-1)
        both = jnp.concatenate([fp, fm], axis=0)
        o = _mdot(both, fcm[m - 1], mxu_bf16)
        o_r = jax.lax.slice_in_dim(o, 0, n_l * co, axis=-1)
        o_i = jax.lax.slice_in_dim(o, n_l * co, 2 * n_l * co, axis=-1)
        rp = jax.lax.slice_in_dim(o_r, 0, a, axis=0)
        rm = jax.lax.slice_in_dim(o_r, a, 2 * a, axis=0)
        ip = jax.lax.slice_in_dim(o_i, 0, a, axis=0)
        im = jax.lax.slice_in_dim(o_i, a, 2 * a, axis=0)
        parts.append(rp - im)
        parts.append(rm + ip)
        boths.append(both)
    return jnp.concatenate(parts, axis=-1), extra, f0, boths


def _so2_eq_bwd(gout_flat, gextra, f0, boths, c_in, co, w_m0, fcm,
                l_max, m_max, mxu_bf16):
    """Transpose of _so2_eq. gout_flat [A, S_t*co]; gextra [A, extra] or
    None. Returns (gflat [A, S_t*c_in], g_w_m0, g_fcm list)."""
    spans = _spans(l_max, m_max)
    a = gout_flat.shape[0]
    s0, n0 = spans[0]
    gout0 = jax.lax.slice_in_dim(gout_flat, s0 * co, (s0 + n0) * co, axis=-1)
    gh0 = gout0 if gextra is None else jnp.concatenate([gout0, gextra], axis=-1)
    gf0 = _mdot(gh0, w_m0.T, mxu_bf16)
    g_w0 = _mdot(f0.T, gh0, mxu_bf16)
    gflat_parts = [gf0]
    g_fcm = []
    for m in range(1, m_max + 1):
        sp, n_l = spans[2 * m - 1]
        sm, _ = spans[2 * m]
        gop = jax.lax.slice_in_dim(gout_flat, sp * co, (sp + n_l) * co, axis=-1)
        gom = jax.lax.slice_in_dim(gout_flat, sm * co, (sm + n_l) * co, axis=-1)
        # out_+m = rp - im, out_-m = rm + ip  (rows of o_r = [p;m], o_i = [p;m])
        go_r = jnp.concatenate([gop, gom], axis=0)  # [2A, n_l*co]
        go_i = jnp.concatenate([gom, -gop], axis=0)
        go = jnp.concatenate([go_r, go_i], axis=-1)  # [2A, 2*n_l*co]
        gboth = _mdot(go, fcm[m - 1].T, mxu_bf16)
        g_fcm.append(_mdot(boths[m - 1].T, go, mxu_bf16))
        gflat_parts.append(jax.lax.slice_in_dim(gboth, 0, a, axis=0))
        gflat_parts.append(jax.lax.slice_in_dim(gboth, a, 2 * a, axis=0))
    return jnp.concatenate(gflat_parts, axis=-1), g_w0, g_fcm


def _grid_factored_fwd_u(blocks, l_max, m_max, n_points):
    """First (latitude) stage of the factored grid transform: returns the
    u[g][t] block table the backward re-contracts (the [t,f] grid points are
    cheap to recompute from u, so they are never stored)."""
    grp, lat_to, lon_to, lat_from, lon_from, n_t, n_p = _grid_factor_tables(
        l_max, m_max, n_points
    )
    g_n = lon_to.shape[0]
    st = len(blocks)
    u = [[None] * n_t for _ in range(g_n)]
    for s in range(st):
        g = int(grp[s])
        for t in range(n_t):
            w = float(lat_to[s, t])
            if w == 0.0:
                continue
            term = w * blocks[s]
            u[g][t] = term if u[g][t] is None else u[g][t] + term
    return u


def _grid_silu_factored_bwd(gacted, u, l_max, m_max, n_points):
    """Transpose of _grid_silu_factored given the output cotangents and the
    saved latitude-stage blocks u. Returns gblocks (list of st)."""
    grp, lat_to, lon_to, lat_from, lon_from, n_t, n_p = _grid_factor_tables(
        l_max, m_max, n_points
    )
    g_n = lon_to.shape[0]
    st = len(gacted)
    # gv[g][t] = sum_s lat_from[s,t] * gacted[s]
    gv = [[None] * n_t for _ in range(g_n)]
    for s in range(st):
        if gacted[s] is None:
            continue
        g = int(grp[s])
        for t in range(n_t):
            w = float(lat_from[s, t])
            if w == 0.0:
                continue
            term = w * gacted[s]
            gv[g][t] = term if gv[g][t] is None else gv[g][t] + term
    # per grid point: recompute pre-activation from u, chain through silu
    gu = [[None] * n_t for _ in range(g_n)]
    for t in range(n_t):
        for f in range(n_p):
            pre = None
            ggp = None
            for g in range(g_n):
                wt = float(lon_to[g, f])
                if wt != 0.0 and u[g][t] is not None:
                    term = wt * u[g][t]
                    pre = term if pre is None else pre + term
                wf = float(lon_from[g, f])
                if wf != 0.0 and gv[g][t] is not None:
                    term = wf * gv[g][t]
                    ggp = term if ggp is None else ggp + term
            if ggp is None or pre is None:
                continue
            gpre = ggp * _dsilu(pre)
            for g in range(g_n):
                wt = float(lon_to[g, f])
                if wt == 0.0:
                    continue
                term = wt * gpre
                gu[g][t] = term if gu[g][t] is None else gu[g][t] + term
    gblocks = []
    for s in range(st):
        g = int(grp[s])
        acc = None
        for t in range(n_t):
            w = float(lat_to[s, t])
            if w == 0.0 or gu[g][t] is None:
                continue
            term = w * gu[g][t]
            acc = term if acc is None else acc + term
        gblocks.append(acc)
    return gblocks


def _attn_pipeline_bwd(x, oh, xi, d, xe, maskf, dropk, w_rad, b_rad, w1,
                       fc1m, w2, fc2m, ln_scale, ln_bias, alpha_dot, m_avg,
                       m_exp, m_expv, g, *, l_max, m_max, c, co, nh, va,
                       n_grid, mxu_bf16):
    """Gradients of _attn_pipeline wrt (x, xi, xe, and all weights), given
    output cotangents g [R, S, co]. Recomputes the forward keeping only the
    residuals each transpose re-contracts. Returns
    (gx [S,A_mol,C], gxi [R,S,C], gxe [R,K,EC], g_wrad, g_brad, g_w1,
     g_fc1m, g_w2, g_fc2m, g_lns, g_lnb, g_adot)."""
    rows = _mm_rows(l_max, m_max)
    st = len(rows)
    s_full = (l_max + 1) ** 2
    offs, _ = so3.trunc_compact_layout(l_max, m_max)
    r, a = d.shape[0], d.shape[1]
    ra = r * a
    a_mol = x.shape[1]
    ec = xe.shape[-1]
    oh2 = oh.reshape(ra, a_mol)
    d2 = d.reshape(ra, d.shape[-1])
    xe2 = xe.reshape(ra, ec)
    maskf2 = maskf.reshape(ra, 1)
    dropk2 = dropk.reshape(ra, dropk.shape[-1])

    # ---- recompute forward ----
    xs_rows = [_mdot(oh2, x[s], mxu_bf16) for s in range(s_full)]
    xi_rows = [
        jnp.broadcast_to(xi[:, s : s + 1, :], (r, a, c)).reshape(ra, c)
        for s in range(s_full)
    ]
    src, tgt = _rotate_fwd(xs_rows, xi_rows, d2, l_max, m_max)
    rad = _mdot(xe2, w_rad, mxu_bf16) + b_rad
    c2 = 2 * c
    blks = []  # pre-scale concat(src, tgt) per row (residual for g_rad)
    flat_parts = []
    for ri, (l, m) in enumerate(rows):
        rl = jax.lax.slice_in_dim(rad, l * c2, (l + 1) * c2, axis=-1)
        blk = jnp.concatenate([src[ri], tgt[ri]], axis=-1)
        blks.append(blk)
        flat_parts.append(blk * rl)
    flat = jnp.concatenate(flat_parts, axis=-1)

    hidden, extra, f0_1, boths_1 = _so2_eq_save(
        flat, c2, co, w1, fc1m, l_max, m_max, mxu_bf16
    )
    alpha_scal = jax.lax.slice_in_dim(extra, 0, nh * va, axis=-1)
    gate_scal = jax.lax.slice_in_dim(extra, nh * va, nh * va + co, axis=-1)

    hblocks = [
        jax.lax.slice_in_dim(hidden, s * co, (s + 1) * co, axis=-1)
        for s in range(st)
    ]
    u = _grid_factored_fwd_u(hblocks, l_max, m_max, n_grid)
    acted = _grid_silu_factored(hblocks, l_max, m_max, n_grid)
    acted[0] = jax.nn.silu(gate_scal)
    hidden2 = jnp.concatenate(acted, axis=-1)

    values, _, f0_2, boths_2 = _so2_eq_save(
        hidden2, co, co, w2, fc2m, l_max, m_max, mxu_bf16
    )

    ah = alpha_scal.astype(F32)
    mu = _mdot(_mdot(ah, m_avg, False), m_exp, False)
    cen = ah - mu
    var = _mdot(_mdot(cen * cen, m_avg, False), m_exp, False)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = cen * inv
    ln = xhat * ln_scale + ln_bias
    act = jax.nn.silu(ln)
    logits = _mdot(act * alpha_dot, m_avg, False) * float(va)
    neg = jnp.float32(-1e9)
    logits = jnp.where(maskf2 > 0.5, logits, neg)
    lg3 = logits.reshape(r, a, nh)
    lmax_ = jnp.max(lg3, axis=1, keepdims=True)
    ex = jnp.exp(lg3 - lmax_).reshape(ra, nh) * jnp.where(maskf2 > 0.5, 1.0, 0.0)
    den = jnp.maximum(jnp.sum(ex.reshape(r, a, nh), axis=1, keepdims=True), 1e-20)
    alpha_soft = (ex.reshape(r, a, nh) / den).reshape(ra, nh)
    alpha_fin = alpha_soft * dropk2
    aexp = _mdot(alpha_fin, m_expv, False)
    vblocks = [
        jax.lax.slice_in_dim(values, s * co, (s + 1) * co, axis=-1) * aexp
        for s in range(st)
    ]

    # ---- backward ----
    # rotate-back + neighbor-reduce transpose: broadcast g over each
    # receiver's K rows, contract with the masked Wigner values
    g_rows = [
        jnp.broadcast_to(g[:, s : s + 1, :], (r, a, co)).reshape(ra, co)
        for s in range(s_full)
    ]
    gvb = []
    for rr, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        acc = None
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d2, idx, idx + 1, axis=-1)
            t = dc * g_rows[l * l + col]
            acc = t if acc is None else acc + t
        gvb.append(acc)

    # value weighting transpose
    gvalues = jnp.concatenate([gvb[s] * aexp for s in range(st)], axis=-1)
    gaexp = None
    for s in range(st):
        vs = jax.lax.slice_in_dim(values, s * co, (s + 1) * co, axis=-1)
        t = gvb[s] * vs
        gaexp = t if gaexp is None else gaexp + t
    galpha_fin = _mdot(gaexp, m_expv.T, False)  # [RA, NH]
    galpha_soft = galpha_fin * dropk2

    # masked-softmax transpose over each receiver's K-row segment
    al3 = alpha_soft.reshape(r, a, nh)
    ga3 = galpha_soft.reshape(r, a, nh)
    dot = jnp.sum(al3 * ga3, axis=1, keepdims=True)
    glog3 = al3 * (ga3 - dot)
    glogits = glog3.reshape(ra, nh) * jnp.where(maskf2 > 0.5, 1.0, 0.0)

    # alpha head transpose: logits = group-sum(act * alpha_dot)
    gz = _mdot(glogits, m_exp, False)  # broadcast per head
    gact = gz * alpha_dot
    g_adot = jnp.sum(gz * act, axis=0, keepdims=True)
    gln = gact * _dsilu(ln)
    g_lns = jnp.sum(gln * xhat, axis=0, keepdims=True)
    g_lnb = jnp.sum(gln, axis=0, keepdims=True)
    gxhat = gln * ln_scale

    def mean_g(z):
        return _mdot(_mdot(z, m_avg, False), m_exp, False)

    gah = inv * (gxhat - mean_g(gxhat) - xhat * mean_g(gxhat * xhat))
    galpha_scal = gah

    # conv2 transpose -> g_hidden2
    ghidden2, g_w2, g_fc2m = _so2_eq_bwd(
        gvalues, None, f0_2, boths_2, co, co, w2, fc2m, l_max, m_max, mxu_bf16
    )
    gh2_blocks = [
        jax.lax.slice_in_dim(ghidden2, s * co, (s + 1) * co, axis=-1)
        for s in range(st)
    ]
    ggate_scal = gh2_blocks[0] * _dsilu(gate_scal)
    gacted = [None] + gh2_blocks[1:]

    # grid transpose (+ silu chain, pre-activations recomputed from u)
    gh_blocks = _grid_silu_factored_bwd(gacted, u, l_max, m_max, n_grid)
    ghidden = jnp.concatenate(
        [gb if gb is not None else jnp.zeros_like(hblocks[s])
         for s, gb in enumerate(gh_blocks)],
        axis=-1,
    )

    # conv1 transpose (extra = [alpha_scal | gate_scal] grads)
    gextra = jnp.concatenate([galpha_scal, ggate_scal], axis=-1)
    gflat, g_w1, g_fc1m = _so2_eq_bwd(
        ghidden, gextra, f0_1, boths_1, c2, co, w1, fc1m, l_max, m_max,
        mxu_bf16,
    )

    # radial-scale transpose
    grad_l = [None] * (l_max + 1)
    gblk = []
    for ri, (l, m) in enumerate(rows):
        rl = jax.lax.slice_in_dim(rad, l * c2, (l + 1) * c2, axis=-1)
        gf = jax.lax.slice_in_dim(gflat, ri * c2, (ri + 1) * c2, axis=-1)
        gblk.append(gf * rl)
        t = gf * blks[ri]
        grad_l[l] = t if grad_l[l] is None else grad_l[l] + t
    grad = jnp.concatenate(
        [gl if gl is not None else jnp.zeros((ra, c2), F32) for gl in grad_l],
        axis=-1,
    )
    gxe = _mdot(grad, w_rad.T, mxu_bf16).reshape(r, a, ec)
    g_wrad = _mdot(xe2.T, grad, mxu_bf16)
    g_brad = jnp.sum(grad, axis=0, keepdims=True)

    # rotation transpose: src rows -> neighbor-gathered features; tgt rows
    # -> the receiver's own features (summed over its K edge rows)
    gsrc = [jax.lax.slice_in_dim(gb, 0, c, axis=-1) for gb in gblk]
    gtgt = [jax.lax.slice_in_dim(gb, c, c2, axis=-1) for gb in gblk]
    gxs_rows: List = [None] * s_full
    gxi_rows: List = [None] * s_full
    for rr, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d2, idx, idx + 1, axis=-1)
            s = l * l + col
            t = dc * gsrc[rr]
            gxs_rows[s] = t if gxs_rows[s] is None else gxs_rows[s] + t
            ti = dc * gtgt[rr]
            gxi_rows[s] = ti if gxi_rows[s] is None else gxi_rows[s] + ti
    gx = jnp.stack(
        [_mdot(oh2.T, gr, mxu_bf16) for gr in gxs_rows], axis=0
    )  # [S, A_mol, C]
    gxi = jnp.stack(
        [jnp.sum(gr.reshape(r, a, c), axis=1) for gr in gxi_rows], axis=1
    )  # [R, S, C]

    return (gx, gxi, gxe, g_wrad, g_brad, g_w1, g_fc1m, g_w2, g_fc2m,
            g_lns, g_lnb, g_adot)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

_N_W = 9  # w_rad, b_rad, w1, w2, ln_scale, ln_bias, alpha_dot + per-m lists


def _weight_list(w_rad, b_rad, w1, fc1m, w2, fc2m, ln_scale, ln_bias,
                 alpha_dot, m_avg, m_exp, m_expv, mxu_bf16=False):
    """When mxu_bf16, the large matmul-only weights enter the kernel
    already cast to bf16 — _mdot casts them anyway, and halving their
    VMEM windows is what lets the backward fit r=2 (f32 weights put the
    bwd kernel at 143 MB > the 128 MB VMEM budget on real TPU). b_rad
    and the LN/alpha/expander vectors stay f32 (used in f32 arithmetic)."""
    big = jnp.bfloat16 if mxu_bf16 else None

    def _c(w):
        return w.astype(big) if big is not None else w

    mats = [_c(w_rad), b_rad, _c(w1), _c(w2), ln_scale, ln_bias, alpha_dot,
            m_avg, m_exp, m_expv]
    mats += [_c(w) for w in fc1m] + [_c(w) for w in fc2m]
    return mats


N_FIXED_W = 10


def _unpack_weights(refs, m_max):
    (w_rad, b_rad, w1, w2, ln_s, ln_b, adot, m_avg, m_exp, m_expv) = (
        r[:] for r in refs[:N_FIXED_W]
    )
    fc1m = [refs[N_FIXED_W + m][:] for m in range(m_max)]
    fc2m = [refs[N_FIXED_W + m_max + m][:] for m in range(m_max)]
    return (w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot,
            m_avg, m_exp, m_expv)


def _fwd_kernel(x_ref, oh_ref, xi_ref, d_ref, xe_ref, mask_ref, drop_ref,
                *refs, l_max, m_max, c, co, nh, va, n_grid, mxu_bf16):
    n_w = N_FIXED_W + 2 * m_max
    wrefs = refs[:n_w]
    out_ref = refs[n_w]
    (w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot, m_avg, m_exp,
     m_expv) = _unpack_weights(wrefs, m_max)
    out = _attn_pipeline(
        x_ref[0], oh_ref[0], xi_ref[0], d_ref[0], xe_ref[0],
        mask_ref[0], drop_ref[0],
        w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot,
        m_avg, m_exp, m_expv,
        l_max=l_max, m_max=m_max, c=c, co=co, nh=nh, va=va,
        n_grid=n_grid, mxu_bf16=mxu_bf16,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _pick_r(a: int, cap: int) -> int:
    """Receivers per program: the largest divisor of a that is <= cap.
    (Equal pallas blocks need r | a; cap bounds the VMEM footprint, which
    scales linearly in r for every per-edge tensor.)"""
    for r in range(min(cap, a), 0, -1):
        if a % r == 0:
            return r
    return 1


# receivers-per-program caps (fwd, bwd), bounded by VMEM: at the bench
# configuration (A=48, K=30→32, L=6/M=2, C=128) the bf16-MXU fwd kernel
# fits r=4 under the 128 MB budget (4·32 = 128 rows = one full MXU tile).
# The hand-written backward (_attn_pipeline_bwd) keeps only the residuals
# it re-contracts — unlike the earlier in-kernel jax.vjp, which stored
# every intermediate and capped bwd at r=2 bf16 / r=1 fp32 — so the bwd
# runs the same receiver blocking as the forward. Overridable for
# tests/tuning via NABLA_EQV2_R="fwd,bwd".
import os as _os

_env = _os.environ.get("NABLA_EQV2_R")
_R_CAPS = tuple(int(v) for v in _env.split(",")) if _env else None


def _r_caps(mxu_bf16: bool, a: int) -> tuple:
    if _R_CAPS is not None:
        return _R_CAPS
    # bwd r=4 only fits VMEM because _weight_list ships the big matmul
    # weights bf16 (f32 weights put the bwd at 160.9M > 128M on real TPU;
    # the weight-grad accumulators stay f32). Measured on TPU v5: (4,4)
    # 805 ms/step vs (4,2) 920 ms at the bench config (B=32, A=48, K=30).
    # Above A=48 the fixed x block (s*a*c) plus the r-scaled per-edge
    # blocks push the bwd 222KB past the 127M scoped limit at r=4
    # (measured at the A=64 fixture bucket on v5e) - halve the bwd cap.
    if mxu_bf16:
        return (4, 4) if a <= 48 else (4, 2)
    return (2, 1)


def _run_fwd(x, oh, x_asc, d, xe, maskf, dropk, mats,
             l_max, m_max, c, co, nh, va, n_grid, interpret, mxu_bf16):
    b, s, a, _ = x.shape
    k_e = d.shape[2]  # compacted neighbor slots per receiver
    kw = d.shape[-1]
    ec = xe.shape[-1]
    r = _pick_r(a, _r_caps(mxu_bf16, a)[0])
    specs = [
        pl.BlockSpec(w.shape, (lambda nd: lambda bb, ii: (0,) * nd)(w.ndim))
        for w in mats
    ]
    kern = functools.partial(
        _fwd_kernel, l_max=l_max, m_max=m_max, c=c, co=co, nh=nh, va=va,
        n_grid=n_grid, mxu_bf16=mxu_bf16,
    )
    return pl.pallas_call(
        kern,
        grid=(b, a // r),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, r, k_e, a), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, s, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, kw), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, ec), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, 1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, dropk.shape[-1]),
                         lambda bb, ii: (bb, ii, 0, 0)),
            *specs,
        ],
        out_specs=pl.BlockSpec((1, r, s, co), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, a, s, co), F32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=attn_fwd_flops(b, a, k_e, 2 * c, co, ec, l_max, m_max,
                                 n_grid, nh, va),
            bytes_accessed=4 * (x.size + d.size + xe.size + b * a * s * co),
            transcendentals=b * a * k_e * (40 * co + nh * va),
        ),
        interpret=interpret,
    )(x, oh, x_asc, d, xe, maskf, dropk, *mats)


def _bwd_kernel(x_ref, oh_ref, xi_ref, d_ref, xe_ref, mask_ref, drop_ref,
                *refs, l_max, m_max, c, co, nh, va, n_grid, mxu_bf16):
    n_w = N_FIXED_W + 2 * m_max
    wrefs = refs[:n_w]
    g_ref = refs[n_w]
    outs = refs[n_w + 1 :]
    gx_ref, gxi_ref, gxe_ref = outs[0], outs[1], outs[2]
    gw_refs = outs[3:]
    (w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot, m_avg, m_exp,
     m_expv) = _unpack_weights(wrefs, m_max)
    b_idx, i_idx = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, i_idx == 0))
    def _init_w():
        for r in gw_refs:
            r[...] = jnp.zeros_like(r)

    @pl.when(i_idx == 0)
    def _init_x():
        gx_ref[...] = jnp.zeros_like(gx_ref)

    (gx, gxi, gxe, g_wrad, g_brad, g_w1, g_fc1m, g_w2, g_fc2m, g_lns,
     g_lnb, g_adot) = _attn_pipeline_bwd(
        x_ref[0], oh_ref[0], xi_ref[0], d_ref[0], xe_ref[0],
        mask_ref[0], drop_ref[0],
        w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot,
        m_avg, m_exp, m_expv, g_ref[0].astype(F32),
        l_max=l_max, m_max=m_max, c=c, co=co, nh=nh, va=va,
        n_grid=n_grid, mxu_bf16=mxu_bf16,
    )
    gx_ref[0] += gx.astype(gx_ref.dtype)
    gxi_ref[0] = gxi.astype(gxi_ref.dtype)
    gxe_ref[0] = gxe.astype(gxe_ref.dtype)
    # accumulation order must match _weight_list:
    # [w_rad, b_rad, w1, w2, ln_s, ln_b, adot, m_avg, m_exp, m_expv,
    #  fc1m..., fc2m...]; the static expander matrices get zero grads
    ordered = [g_wrad, g_brad, g_w1, g_w2, g_lns, g_lnb, g_adot,
               jnp.zeros_like(m_avg), jnp.zeros_like(m_exp),
               jnp.zeros_like(m_expv), *g_fc1m, *g_fc2m]
    for ref, gval in zip(gw_refs, ordered):
        ref[...] += gval.astype(ref.dtype)


def _run_bwd(x, oh, x_asc, d, xe, maskf, dropk, mats, g,
             l_max, m_max, c, co, nh, va, n_grid, interpret, mxu_bf16):
    b, s, a, _ = x.shape
    k_e = d.shape[2]
    kw = d.shape[-1]
    ec = xe.shape[-1]
    r = _pick_r(a, _r_caps(mxu_bf16, a)[1])
    specs = [
        pl.BlockSpec(w.shape, (lambda nd: lambda bb, ii: (0,) * nd)(w.ndim))
        for w in mats
    ]
    kern = functools.partial(
        _bwd_kernel, l_max=l_max, m_max=m_max, c=c, co=co, nh=nh, va=va,
        n_grid=n_grid, mxu_bf16=mxu_bf16,
    )
    out_specs = [
        pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
        pl.BlockSpec((1, r, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        pl.BlockSpec((1, r, k_e, ec), lambda bb, ii: (bb, ii, 0, 0)),
        *specs,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, s, a, c), F32),
        jax.ShapeDtypeStruct((b, a, s, c), F32),
        jax.ShapeDtypeStruct((b, a, k_e, ec), F32),
        *[jax.ShapeDtypeStruct(w.shape, F32) for w in mats],
    ]
    return pl.pallas_call(
        kern,
        grid=(b, a // r),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, r, k_e, a), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, s, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, kw), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, ec), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, 1), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, r, k_e, dropk.shape[-1]),
                         lambda bb, ii: (bb, ii, 0, 0)),
            *specs,
            pl.BlockSpec((1, r, s, co), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=attn_bwd_flops(b, a, k_e, 2 * c, co, ec, l_max, m_max,
                                 n_grid, nh, va),
            bytes_accessed=4 * (2 * x.size + d.size + 2 * xe.size
                                + b * a * s * (c + co)),
            transcendentals=2 * b * a * k_e * (40 * co + nh * va),
        ),
        interpret=interpret,
    )(x, oh, x_asc, d, xe, maskf, dropk, *mats, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def eqv2_attention_vjp(l_max, m_max, n_grid, interpret, mxu_bf16, nh, va,
                       x_sm, oh, x_asc, d, xe, maskf, dropk,
                       w_rad, b_rad, w1, fc1m, w2, fc2m,
                       ln_scale, ln_bias, alpha_dot):
    """Fused EqV2 SO(2) graph attention with custom VJP.

    oh [B,A,K,A] is the masked one-hot neighbor gather matrix; oh / d /
    maskf / dropk are non-differentiable (direct forces; dropout mask is
    sampled outside). Returns agg [B, A, S, co].
    """
    c = x_sm.shape[-1]
    co = w2.shape[-1] // (l_max + 1)
    m_avg, m_exp, m_expv = _expanders(nh, va, co)
    mats = _weight_list(w_rad, b_rad, w1, fc1m, w2, fc2m,
                        ln_scale, ln_bias, alpha_dot, m_avg, m_exp, m_expv,
                        mxu_bf16)
    return _run_fwd(x_sm, oh, x_asc, d, xe, maskf, dropk, mats,
                    l_max, m_max, c, co, nh, va, n_grid, interpret, mxu_bf16)


def _attn_fwd(l_max, m_max, n_grid, interpret, mxu_bf16, nh, va,
              x_sm, oh, x_asc, d, xe, maskf, dropk,
              w_rad, b_rad, w1, fc1m, w2, fc2m, ln_scale, ln_bias, alpha_dot):
    out = eqv2_attention_vjp(
        l_max, m_max, n_grid, interpret, mxu_bf16, nh, va,
        x_sm, oh, x_asc, d, xe, maskf, dropk,
        w_rad, b_rad, w1, fc1m, w2, fc2m, ln_scale, ln_bias, alpha_dot,
    )
    return out, (x_sm, oh, x_asc, d, xe, maskf, dropk, w_rad, b_rad, w1,
                 fc1m, w2, fc2m, ln_scale, ln_bias, alpha_dot)


def _attn_bwd(l_max, m_max, n_grid, interpret, mxu_bf16, nh, va, res, g):
    (x_sm, oh, x_asc, d, xe, maskf, dropk, w_rad, b_rad, w1, fc1m, w2, fc2m,
     ln_scale, ln_bias, alpha_dot) = res
    c = x_sm.shape[-1]
    co = w2.shape[-1] // (l_max + 1)
    m_avg, m_exp, m_expv = _expanders(nh, va, co)
    mats = _weight_list(w_rad, b_rad, w1, fc1m, w2, fc2m,
                        ln_scale, ln_bias, alpha_dot, m_avg, m_exp, m_expv,
                        mxu_bf16)
    outs = _run_bwd(x_sm, oh, x_asc, d, xe, maskf, dropk, mats, g.astype(F32),
                    l_max, m_max, c, co, nh, va, n_grid, interpret, mxu_bf16)
    gx, gxi, gxe = outs[0], outs[1], outs[2]
    gw = outs[3:]
    m_max_ = len(fc1m)
    (g_wrad, g_brad, g_w1, g_w2, g_lns, g_lnb, g_adot) = gw[:7]
    # slots 7..9 are the static expander matrices (zero grads, discarded)
    g_fc1m = list(gw[10 : 10 + m_max_])
    g_fc2m = list(gw[10 + m_max_ : 10 + 2 * m_max_])
    return (gx, jnp.zeros_like(oh), gxi, jnp.zeros_like(d), gxe,
            jnp.zeros_like(maskf), jnp.zeros_like(dropk), g_wrad, g_brad,
            g_w1, g_fc1m, g_w2, g_fc2m, g_lns, g_lnb, g_adot)


eqv2_attention_vjp.defvjp(_attn_fwd, _attn_bwd)
