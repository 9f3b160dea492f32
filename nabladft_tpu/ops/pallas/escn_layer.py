"""Fused eSCN message-layer kernel.

The XLA formulation of an eSCN layer chains ~10 edge-lattice ops (gather,
rotate, SO(2) convs, sphere-grid activation, rotate back, reduce), each
materializing a 0.4–1.4 GB [E, ·, C] tensor in HBM; the measured layer is
bandwidth-bound at <10% MFU (see models/escn.py history). This kernel runs
the ENTIRE per-edge message pipeline of one layer in VMEM, per
(molecule, receiver) program:

  1. rotate+truncate source (x_j) and target (x_i) streams into the
     m-major stack — unrolled [A,1]x[A,C] VPU MACs against the COMPACT
     block-diagonal Wigner values (so3.wigner_trunc_compact_from_rot),
     pre-masked in XLA so padded/out-of-cutoff neighbors contribute 0;
  2. the two SO(2) conv blocks — MXU matmuls on lane-contiguous m-major
     flats [A, S_t*C] (the r/i pair of each m>0 path is ONE [2A, n_l*C] x
     [n_l*C, 2H] matmul), with the per-edge gates computed in-kernel from
     the invariant edge features (one [A,EC]x[EC,5H] matmul + silu);
  3. the truncated-sphere grid activation (Gauss-Legendre x uniform-phi,
     models/escn._grid_mats with m_max resolution) as unrolled
     static-scalar MACs + silu on P grid blocks;
  4. rotate back to the full (L+1)^2 rows and reduce over neighbors.

HBM traffic per program: x_mol (shared), one [A, K] rotation slice, one
[A, EC] edge-feature slice, weights (shared), and the [S, C] output — the
[E, ·, C] intermediates never exist.

Reference semantics: nablaDFT/escn/escn.py MessageBlock.forward
(escn.py:658-704): rotate -> so2_block_source/target -> _grid_act ->
_rotate_inv -> _reduce_edge. Parity vs models/escn.ESCNLayer is pinned by
tests/ops/test_escn_layer.py.
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


def _mdot(a, b, bf16):
    """MXU matmul; optional bf16 operand cast (fp32 accumulate)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=F32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=None)
def _mm_rows(l_max: int, m_max: int) -> Tuple[Tuple[int, int], ...]:
    return tuple(so3.mmajor_rows(l_max, m_max))


@lru_cache(maxsize=None)
def _spans(l_max: int, m_max: int) -> Tuple[Tuple[int, int], ...]:
    """(start,n_l) spans of the m-major stack: m0, then +m/-m per m."""
    spans = [(0, l_max + 1)]
    off = l_max + 1
    for m in range(1, m_max + 1):
        n_l = l_max + 1 - m
        spans.append((off, n_l))
        spans.append((off + n_l, n_l))
        off += 2 * n_l
    return tuple(spans)


@lru_cache(maxsize=None)
def _grid_tables(l_max: int, m_max: int, n_points: int):
    """(to_g [P, S_t], from_g [S_t, P]) in m-major column order."""
    from nabladft_tpu.models.escn import _grid_mats

    to_g, from_g = _grid_mats(l_max, n_points, m_max)
    cols = so3.mmajor_cols(l_max, m_max)
    return np.asarray(to_g[:, cols], np.float64), np.asarray(
        from_g[cols], np.float64
    )


def s_trunc(l_max: int, m_max: int) -> int:
    return sum(2 * min(l, m_max) + 1 for l in range(l_max + 1))


# ---------------------------------------------------------------------------
# FLOP model (for pl.CostEstimate and MFU accounting)
# ---------------------------------------------------------------------------


def _rot_macs(l_max: int, m_max: int) -> int:
    return sum((2 * min(l, m_max) + 1) * (2 * l + 1) for l in range(l_max + 1))


def _so2_matmul_flops(a: int, c: int, h: int, l_max: int, m_max: int) -> int:
    """One SO2 block's matmul FLOPs for A edge rows."""
    n0 = l_max + 1
    f = 2 * a * (n0 * c) * h * 2  # m0 fc1+fc2
    for m in range(1, m_max + 1):
        n_l = l_max + 1 - m
        f += 2 * (2 * a) * (n_l * c) * (2 * h)  # packed fc1 (r|i on p;m rows)
        f += 2 * 2 * (2 * a) * h * (n_l * c)  # two fc2 matmuls
    return f


def layer_fwd_flops(b, a, c, h, ec, gates, l_max, m_max, n_grid) -> int:
    st = s_trunc(l_max, m_max)
    per = (
        2 * _rot_macs(l_max, m_max) * a * c * 2      # rot src+tgt
        + 2 * a * ec * gates * 2                     # gate matmuls (2 blocks)
        + 2 * _so2_matmul_flops(a, c, h, l_max, m_max)
        + 2 * 2 * n_grid * st * a * c                # grid to+from
        + 2 * _rot_macs(l_max, m_max) * a * c        # rotate back
    )
    return int(b * a * per)


def layer_bwd_flops(b, a, c, h, ec, gates, l_max, m_max, n_grid) -> int:
    # recompute-forward + transposed passes: ~2.6x fwd is the right order
    return int(2.6 * layer_fwd_flops(b, a, c, h, ec, gates, l_max, m_max, n_grid))


# ---------------------------------------------------------------------------
# shared in-kernel pipeline pieces (also traceable outside pallas for the
# pure-XLA reference used in tests)
# ---------------------------------------------------------------------------


def _rotate_fwd(xs_rows, xi_rows, d, l_max, m_max):
    """xs_rows[s]=[A,C] molecule features; xi_rows[s]=[1,C] receiver rows.
    d [A, K_pad] compact masked Wigner. Returns (src, tgt) m-major lists of
    [A, C] blocks."""
    offs, _ = so3.trunc_compact_layout(l_max, m_max)
    src: List = []
    tgt: List = []
    for (l, m) in _mm_rows(l_max, m_max):
        mc = min(l, m_max)
        mrow = m + mc
        acc_s = None
        acc_t = None
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d, idx, idx + 1, axis=-1)  # [A,1]
            ts = dc * xs_rows[l * l + col]
            tt = dc * xi_rows[l * l + col]
            acc_s = ts if acc_s is None else acc_s + ts
            acc_t = tt if acc_t is None else acc_t + tt
        src.append(acc_s)
        tgt.append(acc_t)
    return src, tgt


def _so2_block(flat, gates, w1_0, w2_0, fc1_m, w2r_m, w2i_m, l_max, m_max, c, h, mxu_bf16=False):
    """flat [A, S_t*C] m-major; gates [A, (2M+1)H] silu'd.
    Returns msg flat [A, S_t*C]."""
    spans = _spans(l_max, m_max)
    a = flat.shape[0]
    s0, n0 = spans[0]
    f0 = jax.lax.slice_in_dim(flat, s0 * c, (s0 + n0) * c, axis=-1)
    g0 = jax.lax.slice_in_dim(gates, 0, h, axis=-1)
    h0 = _mdot(f0, w1_0, mxu_bf16) * g0
    parts = [_mdot(h0, w2_0, mxu_bf16)]
    for m in range(1, m_max + 1):
        sp, n_l = spans[2 * m - 1]
        sm, _ = spans[2 * m]
        fp = jax.lax.slice_in_dim(flat, sp * c, (sp + n_l) * c, axis=-1)
        fm = jax.lax.slice_in_dim(flat, sm * c, (sm + n_l) * c, axis=-1)
        gr = jax.lax.slice_in_dim(gates, (2 * m - 1) * h, 2 * m * h, axis=-1)
        gi = jax.lax.slice_in_dim(gates, 2 * m * h, (2 * m + 1) * h, axis=-1)
        both = jnp.concatenate([fp, fm], axis=0)  # [2A, n_l*C]
        hid = _mdot(both, fc1_m[m - 1], mxu_bf16)  # [2A, 2H]
        hr = jax.lax.slice_in_dim(hid, 0, h, axis=-1)
        hi = jax.lax.slice_in_dim(hid, h, 2 * h, axis=-1)
        g2 = jnp.concatenate([gr, gr], axis=0)
        gi2 = jnp.concatenate([gi, gi], axis=0)
        o_r = _mdot(hr * g2, w2r_m[m - 1], mxu_bf16)  # [2A, n_lC]
        o_i = _mdot(hi * gi2, w2i_m[m - 1], mxu_bf16)
        rp = jax.lax.slice_in_dim(o_r, 0, a, axis=0)
        rm = jax.lax.slice_in_dim(o_r, a, 2 * a, axis=0)
        ip = jax.lax.slice_in_dim(o_i, 0, a, axis=0)
        im = jax.lax.slice_in_dim(o_i, a, 2 * a, axis=0)
        parts.append(rp - im)  # out_+m rows
        parts.append(rm + ip)  # out_-m rows
    return jnp.concatenate(parts, axis=-1)


@lru_cache(maxsize=None)
def _grid_factor_tables(l_max: int, m_max: int, n_points: int):
    """Separable (latitude x longitude) factorization of the S2 grid maps.

    On the Gauss-Legendre x uniform-phi product grid every m-major basis
    column is rank-1: Y_lm(theta_t, phi_f) = lat[s][t] * lon[g(s)][f] with
    the longitude vector shared by all l of the same signed m (real SH:
    cos/sin of m*phi). Factoring lets the kernels run the grid transform
    in two stages — st*n_theta + n_theta*n_phi*(2M+1) scalar MACs instead
    of P*st — which roughly halves the unrolled VPU op count of the
    dominant kernel section. Returns (grp [st], lat_to [st,n_t],
    lon_to [G,n_p], lat_from [st,n_t], lon_from [G,n_p], n_t, n_p).
    """
    to_g, from_g = _grid_tables(l_max, m_max, n_points)
    rows = _mm_rows(l_max, m_max)
    st = to_g.shape[1]
    n_t = max(l_max + 1, int(round((n_points / 2.0) ** 0.5)))
    n_p = to_g.shape[0] // n_t
    assert n_t * n_p == to_g.shape[0]
    # group rows by signed m (shared longitude vector)
    keys = sorted({m for (_, m) in rows}, key=lambda m: (abs(m), -m))
    grp = np.array([keys.index(m) for (_, m) in rows], np.int64)
    g_n = len(keys)
    lon_to = np.zeros((g_n, n_p))
    lon_from = np.zeros((g_n, n_p))
    lat_to = np.zeros((st, n_t))
    lat_from = np.zeros((st, n_t))
    for g in range(g_n):
        s0 = int(np.argmax(grp == g))
        for mat, lon in ((to_g, lon_to), (from_g, lon_from)):
            col = (mat[:, s0] if mat is to_g else mat[s0, :]).reshape(n_t, n_p)
            u, sv, vt = np.linalg.svd(col, full_matrices=False)
            v = vt[0]
            if v[np.argmax(np.abs(v))] < 0:
                v = -v
            lon[g] = v
    for s in range(st):
        g = int(grp[s])
        lat_to[s] = to_g[:, s].reshape(n_t, n_p) @ lon_to[g]
        lat_from[s] = from_g[s, :].reshape(n_t, n_p) @ lon_from[g]
        # exactness check: the factorization must reconstruct the tables
        assert np.abs(np.outer(lat_to[s], lon_to[g]).ravel()
                      - to_g[:, s]).max() < 1e-9
        assert np.abs(np.outer(lat_from[s], lon_from[g]).ravel()
                      - from_g[s, :]).max() < 1e-9
    return grp, lat_to, lon_to, lat_from, lon_from, n_t, n_p


def _grid_silu_factored(blocks, l_max, m_max, n_points, act=jax.nn.silu):
    """Two-stage (lat, lon) grid transform + pointwise act + two-stage
    inverse over m-major coefficient blocks. Returns the acted blocks."""
    grp, lat_to, lon_to, lat_from, lon_from, n_t, n_p = _grid_factor_tables(
        l_max, m_max, n_points
    )
    st = len(blocks)
    g_n = lon_to.shape[0]
    u = [[None] * n_t for _ in range(g_n)]
    for s in range(st):
        g = int(grp[s])
        for t in range(n_t):
            w = float(lat_to[s, t])
            if w == 0.0:
                continue
            term = w * blocks[s]
            u[g][t] = term if u[g][t] is None else u[g][t] + term
    gps = [[None] * n_p for _ in range(n_t)]
    for t in range(n_t):
        for f in range(n_p):
            acc = None
            for g in range(g_n):
                w = float(lon_to[g, f])
                if w == 0.0 or u[g][t] is None:
                    continue
                term = w * u[g][t]
                acc = term if acc is None else acc + term
            gps[t][f] = act(acc)
    v = [[None] * n_t for _ in range(g_n)]
    for g in range(g_n):
        for t in range(n_t):
            acc = None
            for f in range(n_p):
                w = float(lon_from[g, f])
                if w == 0.0:
                    continue
                term = w * gps[t][f]
                acc = term if acc is None else acc + term
            v[g][t] = acc
    outs = []
    for s in range(st):
        g = int(grp[s])
        acc = None
        for t in range(n_t):
            w = float(lat_from[s, t])
            if w == 0.0 or v[g][t] is None:
                continue
            term = w * v[g][t]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


def _grid_act(msg_flat, l_max, m_max, n_points, c):
    """Pointwise silu on the truncated sphere grid (separable two-stage
    transform — see _grid_factor_tables)."""
    st = s_trunc(l_max, m_max)
    blocks = [
        jax.lax.slice_in_dim(msg_flat, s * c, (s + 1) * c, axis=-1)
        for s in range(st)
    ]
    outs = _grid_silu_factored(blocks, l_max, m_max, n_points)
    return jnp.concatenate(outs, axis=-1)


def _rotate_back_reduce(msg_flat, d, l_max, m_max, c):
    """Rotate m-major msg back to full rows and reduce over neighbors.
    Returns [S, C] (receiver aggregate)."""
    offs, _ = so3.trunc_compact_layout(l_max, m_max)
    rows = _mm_rows(l_max, m_max)
    s_full = (l_max + 1) ** 2
    blocks = [
        jax.lax.slice_in_dim(msg_flat, r * c, (r + 1) * c, axis=-1)
        for r in range(len(rows))
    ]
    out_rows: List = [None] * s_full
    for r, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d, idx, idx + 1, axis=-1)  # [A,1]
            t = dc * blocks[r]
            s = l * l + col
            out_rows[s] = t if out_rows[s] is None else out_rows[s] + t
    reduced = [jnp.sum(rw, axis=0, keepdims=True) for rw in out_rows]  # [1,C]
    return jnp.concatenate(reduced, axis=0)  # [S, C]


def _message_pipeline(x, xi, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m,
                      *, l_max, m_max, c, h, n_grid, mxu_bf16=False):
    """Full per-receiver message computation. x [S,A,C]; xi [S,C];
    d [A,K]; xe [A,EC]; weights have leading block axis 2 (src, tgt)."""
    s_full = (l_max + 1) ** 2
    xs_rows = [x[s] for s in range(s_full)]
    xi_rows = [jax.lax.slice_in_dim(xi, s, s + 1, axis=0) for s in range(s_full)]
    src, tgt = _rotate_fwd(xs_rows, xi_rows, d, l_max, m_max)
    src_flat = jnp.concatenate(src, axis=-1)
    tgt_flat = jnp.concatenate(tgt, axis=-1)
    msg = None
    for b, flat in ((0, src_flat), (1, tgt_flat)):
        gates = jax.nn.silu(
            _mdot(xe, wg[b], mxu_bf16) + bg[b]
        )
        out = _so2_block(
            flat, gates, w1_0[b], w2_0[b],
            [fc1_m[m][b] for m in range(m_max)],
            [w2r_m[m][b] for m in range(m_max)],
            [w2i_m[m][b] for m in range(m_max)],
            l_max, m_max, c, h, mxu_bf16,
        )
        msg = out if msg is None else msg + out
    msg = _grid_act(msg, l_max, m_max, n_grid, c)
    return _rotate_back_reduce(msg, d, l_max, m_max, c)


# ---------------------------------------------------------------------------
# pallas wrappers
# ---------------------------------------------------------------------------


def _weight_specs(wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m):
    mats = [wg, bg, w1_0, w2_0]
    for m in range(len(fc1_m)):
        mats += [fc1_m[m], w2r_m[m], w2i_m[m]]
    specs = [
        pl.BlockSpec(w.shape, (lambda nd: lambda bb, ii: (0,) * nd)(w.ndim))
        for w in mats
    ]
    return mats, specs


def _unpack_weight_refs(refs, m_max):
    wg, bg, w1_0, w2_0 = refs[0][:], refs[1][:], refs[2][:], refs[3][:]
    fc1_m = [refs[4 + 3 * m][:] for m in range(m_max)]
    w2r_m = [refs[5 + 3 * m][:] for m in range(m_max)]
    w2i_m = [refs[6 + 3 * m][:] for m in range(m_max)]
    return wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m


def _fwd_kernel(x_ref, xi_ref, d_ref, xe_ref, *refs, l_max, m_max, c, h, n_grid, mxu_bf16):
    wrefs = refs[: 4 + 3 * m_max]
    out_ref = refs[4 + 3 * m_max]
    wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m = _unpack_weight_refs(wrefs, m_max)
    out = _message_pipeline(
        x_ref[0], xi_ref[0, 0], d_ref[0, 0], xe_ref[0, 0],
        wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m,
        l_max=l_max, m_max=m_max, c=c, h=h, n_grid=n_grid,
        mxu_bf16=mxu_bf16,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, xi_ref, d_ref, xe_ref, *refs, l_max, m_max, c, h, n_grid, mxu_bf16):
    n_w = 4 + 3 * m_max
    wrefs = refs[:n_w]
    g_ref = refs[n_w]
    outs = refs[n_w + 1 :]
    (gx_ref, gxi_ref, gxe_ref, gwg_ref, gbg_ref, gw10_ref, gw20_ref) = outs[:7]
    gm_refs = outs[7:]
    wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m = _unpack_weight_refs(wrefs, m_max)
    b_idx, i_idx = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, i_idx == 0))
    def _init_w():
        gwg_ref[...] = jnp.zeros_like(gwg_ref)
        gbg_ref[...] = jnp.zeros_like(gbg_ref)
        gw10_ref[...] = jnp.zeros_like(gw10_ref)
        gw20_ref[...] = jnp.zeros_like(gw20_ref)
        for r in gm_refs:
            r[...] = jnp.zeros_like(r)

    @pl.when(i_idx == 0)
    def _init_x():
        gx_ref[...] = jnp.zeros_like(gx_ref)

    (gx, gxi, gxe, gwg, gbg, gw1_0, gw2_0, gfc1, gw2r, gw2i) = _pipeline_bwd(
        x_ref[0], xi_ref[0, 0], d_ref[0, 0], xe_ref[0, 0],
        wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m, g_ref[0, 0],
        l_max=l_max, m_max=m_max, c=c, h=h, n_grid=n_grid,
        mxu_bf16=mxu_bf16,
    )
    gx_ref[0] += gx.astype(gx_ref.dtype)
    gxi_ref[0, 0] = gxi.astype(gxi_ref.dtype)
    gxe_ref[0, 0] = gxe.astype(gxe_ref.dtype)
    gwg_ref[...] += gwg.astype(gwg_ref.dtype)
    gbg_ref[...] += gbg.astype(gbg_ref.dtype)
    gw10_ref[...] += gw1_0.astype(gw10_ref.dtype)
    gw20_ref[...] += gw2_0.astype(gw20_ref.dtype)
    for m in range(m_max):
        gm_refs[3 * m][...] += gfc1[m].astype(gm_refs[3 * m].dtype)
        gm_refs[3 * m + 1][...] += gw2r[m].astype(gm_refs[3 * m + 1].dtype)
        gm_refs[3 * m + 2][...] += gw2i[m].astype(gm_refs[3 * m + 2].dtype)


def _run_fwd(x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m,
             l_max, m_max, n_grid, interpret, mxu_bf16):
    b, s, a, c = x.shape
    k = d.shape[-1]
    ec = xe.shape[-1]
    h = w1_0.shape[-1]
    gates = wg.shape[-1]
    mats, specs = _weight_specs(wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m)
    kern = functools.partial(
        _fwd_kernel, l_max=l_max, m_max=m_max, c=c, h=h, n_grid=n_grid,
        mxu_bf16=mxu_bf16,
    )
    return pl.pallas_call(
        kern,
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, k), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, ec), lambda bb, ii: (bb, ii, 0, 0)),
            *specs,
        ],
        out_specs=pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, a, s, c), F32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=layer_fwd_flops(b, a, c, h, ec, gates, l_max, m_max, n_grid),
            bytes_accessed=4 * (x.size + d.size + xe.size + b * a * s * c),
            transcendentals=b * a * a * (gates + 40 * c),
        ),
        interpret=interpret,
    )(x, x_asc, d, xe, *mats)


def _run_bwd(x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m, g,
             l_max, m_max, n_grid, interpret, mxu_bf16):
    b, s, a, c = x.shape
    k = d.shape[-1]
    ec = xe.shape[-1]
    h = w1_0.shape[-1]
    gates = wg.shape[-1]
    mats, specs = _weight_specs(wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m)
    kern = functools.partial(
        _bwd_kernel, l_max=l_max, m_max=m_max, c=c, h=h, n_grid=n_grid,
        mxu_bf16=mxu_bf16,
    )
    w_out_specs = [
        pl.BlockSpec(w.shape, (lambda nd: lambda bb, ii: (0,) * nd)(w.ndim))
        for w in mats
    ]
    # outputs: gx, gxi, gxe, then one grad per weight mat (same shapes)
    out_specs = [
        pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
        pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        pl.BlockSpec((1, 1, a, ec), lambda bb, ii: (bb, ii, 0, 0)),
        *w_out_specs,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, s, a, c), F32),
        jax.ShapeDtypeStruct((b, a, s, c), F32),
        jax.ShapeDtypeStruct((b, a, a, ec), F32),
        *[jax.ShapeDtypeStruct(w.shape, F32) for w in mats],
    ]
    return pl.pallas_call(
        kern,
        grid=(b, a),
        in_specs=[
            pl.BlockSpec((1, s, a, c), lambda bb, ii: (bb, 0, 0, 0)),
            pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, k), lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, a, ec), lambda bb, ii: (bb, ii, 0, 0)),
            *specs,
            pl.BlockSpec((1, 1, s, c), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=layer_bwd_flops(b, a, c, h, ec, gates, l_max, m_max, n_grid),
            bytes_accessed=4 * (2 * x.size + d.size + 2 * xe.size
                                + 2 * b * a * s * c),
            transcendentals=2 * b * a * a * (gates + 40 * c),
        ),
        interpret=interpret,
    )(x, x_asc, d, xe, *mats, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def escn_message(l_max, m_max, n_grid, interpret, mxu_bf16,
                 x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m):
    """Fused eSCN message layer with custom VJP.

    x      [B, S, A, C] fp32 node features (S-major)
    d      [B, A, A, K] compact MASKED Wigner values (receiver, neighbor) —
           non-differentiable (eSCN trains direct forces; positions are
           never differentiated, like qhnet_tp's sh input)
    xe     [B, A, A, EC] invariant edge features (differentiable)
    wg/bg  [2, EC, (2M+1)H] / [2, 1, (2M+1)H] gate weights (src, tgt)
    w1_0   [2, (L+1)C, H]; w2_0 [2, H, (L+1)C]
    fc1_m  list of [2, n_lC, 2H] (fc1_r | fc1_i packed);
    w2r_m / w2i_m lists of [2, H, n_lC]
    Returns [B, A, S, C] aggregated messages.
    """
    return _run_fwd(x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m,
                    w2i_m, l_max, m_max, n_grid, interpret, mxu_bf16)


def _escn_message_fwd(l_max, m_max, n_grid, interpret, mxu_bf16,
                      x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m):
    out = escn_message(l_max, m_max, n_grid, interpret, mxu_bf16,
                       x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m)
    return out, (x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m)


def _escn_message_bwd(l_max, m_max, n_grid, interpret, mxu_bf16, res, g):
    x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m = res
    outs = _run_bwd(x, x_asc, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m,
                    g.astype(F32), l_max, m_max, n_grid, interpret, mxu_bf16)
    gx, gxi, gxe = outs[0], outs[1], outs[2]
    gmats = outs[3:]
    m_max_ = len(fc1_m)
    gwg, gbg, gw1_0, gw2_0 = gmats[0], gmats[1], gmats[2], gmats[3]
    gfc1 = [gmats[4 + 3 * m] for m in range(m_max_)]
    gw2r = [gmats[5 + 3 * m] for m in range(m_max_)]
    gw2i = [gmats[6 + 3 * m] for m in range(m_max_)]
    return (gx, gxi, jnp.zeros_like(d), gxe, gwg, gbg, gw1_0, gw2_0,
            gfc1, gw2r, gw2i)


escn_message.defvjp(_escn_message_fwd, _escn_message_bwd)


# ---------------------------------------------------------------------------
# manual backward (shared between the bwd kernel and the interpret-mode test;
# verified against jax.vjp of _message_pipeline in tests/ops/test_escn_layer)
# ---------------------------------------------------------------------------


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _pipeline_bwd(x, xi, d, xe, wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m, g,
                  *, l_max, m_max, c, h, n_grid, mxu_bf16=False):
    """Gradients of _message_pipeline wrt (x, xi, xe, and all weights).

    Returns (gx [S,A,C], gxi [S,C], gxe [A,EC],
             gwg [2,EC,G], gbg [2,1,G], gw1_0, gw2_0, gfc1_m, gw2r_m, gw2i_m)
    """
    offs, _ = so3.trunc_compact_layout(l_max, m_max)
    rows = _mm_rows(l_max, m_max)
    spans = _spans(l_max, m_max)
    s_full = (l_max + 1) ** 2
    a = x.shape[1]
    st = len(rows)

    # ---- recompute forward ----
    xs_rows = [x[s] for s in range(s_full)]
    xi_rows = [jax.lax.slice_in_dim(xi, s, s + 1, axis=0) for s in range(s_full)]
    src, tgt = _rotate_fwd(xs_rows, xi_rows, d, l_max, m_max)
    flats = (jnp.concatenate(src, axis=-1), jnp.concatenate(tgt, axis=-1))
    pre_gates, gates_b = [], []
    saved = []  # per block: (f0, f1, h0, both, hid, hr, hi, g2, gi2)
    msg_pre = None
    for b in range(2):
        pg = _mdot(xe, wg[b], mxu_bf16) + bg[b]
        gt = jax.nn.silu(pg)
        pre_gates.append(pg)
        gates_b.append(gt)
        flat = flats[b]
        s0, n0 = spans[0]
        f0 = jax.lax.slice_in_dim(flat, s0 * c, (s0 + n0) * c, axis=-1)
        g0 = jax.lax.slice_in_dim(gt, 0, h, axis=-1)
        f1 = _mdot(f0, w1_0[b], mxu_bf16)
        h0 = f1 * g0
        parts = [_mdot(h0, w2_0[b], mxu_bf16)]
        msaved = []
        for m in range(1, m_max + 1):
            sp, n_l = spans[2 * m - 1]
            sm, _ = spans[2 * m]
            fp = jax.lax.slice_in_dim(flat, sp * c, (sp + n_l) * c, axis=-1)
            fm = jax.lax.slice_in_dim(flat, sm * c, (sm + n_l) * c, axis=-1)
            gr = jax.lax.slice_in_dim(gt, (2 * m - 1) * h, 2 * m * h, axis=-1)
            gi = jax.lax.slice_in_dim(gt, 2 * m * h, (2 * m + 1) * h, axis=-1)
            both = jnp.concatenate([fp, fm], axis=0)
            hid = _mdot(both, fc1_m[m - 1][b], mxu_bf16)
            hr = jax.lax.slice_in_dim(hid, 0, h, axis=-1)
            hi = jax.lax.slice_in_dim(hid, h, 2 * h, axis=-1)
            g2 = jnp.concatenate([gr, gr], axis=0)
            gi2 = jnp.concatenate([gi, gi], axis=0)
            o_r = _mdot(hr * g2, w2r_m[m - 1][b], mxu_bf16)
            o_i = _mdot(hi * gi2, w2i_m[m - 1][b], mxu_bf16)
            rp = jax.lax.slice_in_dim(o_r, 0, a, axis=0)
            rm = jax.lax.slice_in_dim(o_r, a, 2 * a, axis=0)
            ip = jax.lax.slice_in_dim(o_i, 0, a, axis=0)
            im = jax.lax.slice_in_dim(o_i, a, 2 * a, axis=0)
            parts.append(rp - im)
            parts.append(rm + ip)
            msaved.append((fp, fm, both, hr, hi, g2, gi2))
        saved.append((f0, f1, h0, msaved))
        out = jnp.concatenate(parts, axis=-1)
        msg_pre = out if msg_pre is None else msg_pre + out
    # grid forward (keep pre-activations)
    to_g, from_g = _grid_tables(l_max, m_max, n_grid)
    mblocks = [
        jax.lax.slice_in_dim(msg_pre, s * c, (s + 1) * c, axis=-1)
        for s in range(st)
    ]
    gp_pre = []
    for p in range(to_g.shape[0]):
        acc = None
        for s in range(st):
            w = float(to_g[p, s])
            if w == 0.0:
                continue
            t = w * mblocks[s]
            acc = t if acc is None else acc + t
        gp_pre.append(acc)

    # ---- backward ----
    # rotate-back transpose: gmsg2[r] = sum_{cols} d[:, idx] * g[l*l+col]
    g_rows = [g[s] for s in range(s_full)]  # [1, C] each? g is [S, C]
    g_rows = [jax.lax.slice_in_dim(g, s, s + 1, axis=0) for s in range(s_full)]
    gmsg2 = []
    for r, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        acc = None
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d, idx, idx + 1, axis=-1)
            t = dc * g_rows[l * l + col]  # [A,1]*[1,C] -> [A,C]
            acc = t if acc is None else acc + t
        gmsg2.append(acc)
    # grid backward
    gmsg_blocks = [None] * st
    for p in range(to_g.shape[0]):
        gp = None
        for s in range(st):
            w = float(from_g[s, p])
            if w == 0.0:
                continue
            t = w * gmsg2[s]
            gp = t if gp is None else gp + t
        gpre = gp * _dsilu(gp_pre[p])
        for s in range(st):
            w = float(to_g[p, s])
            if w == 0.0:
                continue
            t = w * gpre
            gmsg_blocks[s] = t if gmsg_blocks[s] is None else gmsg_blocks[s] + t
    gmsg = jnp.concatenate(gmsg_blocks, axis=-1)  # [A, S_t*C]

    # SO2 blocks backward (gmsg feeds both blocks identically)
    gflats = []
    gxe_acc = None
    gwg_l, gbg_l, gw1_0_l, gw2_0_l = [], [], [], []
    gfc1_l = [[] for _ in range(m_max)]
    gw2r_l = [[] for _ in range(m_max)]
    gw2i_l = [[] for _ in range(m_max)]
    for b in range(2):
        f0, f1, h0, msaved = saved[b]
        gt = gates_b[b]
        s0, n0 = spans[0]
        gout0 = jax.lax.slice_in_dim(gmsg, s0 * c, (s0 + n0) * c, axis=-1)
        gh0 = _mdot(gout0, w2_0[b].T, mxu_bf16)
        g0 = jax.lax.slice_in_dim(gt, 0, h, axis=-1)
        gf1 = gh0 * g0
        gg0 = gh0 * f1
        gf0 = _mdot(gf1, w1_0[b].T, mxu_bf16)
        gw1_0_l.append(_mdot(f0.T, gf1, mxu_bf16))
        gw2_0_l.append(_mdot(h0.T, gout0, mxu_bf16))
        gflat_parts = [gf0]
        gg_parts = [gg0]
        for m in range(1, m_max + 1):
            sp, n_l = spans[2 * m - 1]
            sm, _ = spans[2 * m]
            fp, fm, both, hr, hi, g2, gi2 = msaved[m - 1]
            gout_p = jax.lax.slice_in_dim(gmsg, sp * c, (sp + n_l) * c, axis=-1)
            gout_m = jax.lax.slice_in_dim(gmsg, sm * c, (sm + n_l) * c, axis=-1)
            go_r = jnp.concatenate([gout_p, gout_m], axis=0)
            go_i = jnp.concatenate([gout_m, -gout_p], axis=0)
            ghrg = _mdot(go_r, w2r_m[m - 1][b].T, mxu_bf16)
            ghig = _mdot(go_i, w2i_m[m - 1][b].T, mxu_bf16)
            gw2r_l[m - 1].append(
                _mdot((hr * g2).T, go_r, mxu_bf16)
            )
            gw2i_l[m - 1].append(
                _mdot((hi * gi2).T, go_i, mxu_bf16)
            )
            ghr = ghrg * g2
            ghi = ghig * gi2
            # gate grads: sum the p and m row-halves
            ggr_full = ghrg * hr
            ggi_full = ghig * hi
            ggr = (jax.lax.slice_in_dim(ggr_full, 0, a, axis=0)
                   + jax.lax.slice_in_dim(ggr_full, a, 2 * a, axis=0))
            ggi = (jax.lax.slice_in_dim(ggi_full, 0, a, axis=0)
                   + jax.lax.slice_in_dim(ggi_full, a, 2 * a, axis=0))
            gg_parts.append(ggr)
            gg_parts.append(ggi)
            ghid = jnp.concatenate([ghr, ghi], axis=-1)
            gboth = _mdot(ghid, fc1_m[m - 1][b].T, mxu_bf16)
            gfc1_l[m - 1].append(
                _mdot(both.T, ghid, mxu_bf16)
            )
            gflat_parts.append(jax.lax.slice_in_dim(gboth, 0, a, axis=0))
            gflat_parts.append(jax.lax.slice_in_dim(gboth, a, 2 * a, axis=0))
        gflats.append(jnp.concatenate(gflat_parts, axis=-1))
        gg_all = jnp.concatenate(gg_parts, axis=-1)  # [A, G]
        gpre_gate = gg_all * _dsilu(pre_gates[b])
        gxe_b = _mdot(gpre_gate, wg[b].T, mxu_bf16)
        gxe_acc = gxe_b if gxe_acc is None else gxe_acc + gxe_b
        gwg_l.append(_mdot(xe.T, gpre_gate, mxu_bf16))
        gbg_l.append(jnp.sum(gpre_gate, axis=0, keepdims=True))

    # rotation transpose: src -> gx rows; tgt -> gxi rows
    gsrc_blocks = [
        jax.lax.slice_in_dim(gflats[0], r * c, (r + 1) * c, axis=-1)
        for r in range(st)
    ]
    gtgt_blocks = [
        jax.lax.slice_in_dim(gflats[1], r * c, (r + 1) * c, axis=-1)
        for r in range(st)
    ]
    gx_rows: List = [None] * s_full
    gxi_rows: List = [None] * s_full
    for r, (l, m) in enumerate(rows):
        mc = min(l, m_max)
        mrow = m + mc
        for col in range(2 * l + 1):
            idx = offs[l] + mrow * (2 * l + 1) + col
            dc = jax.lax.slice_in_dim(d, idx, idx + 1, axis=-1)
            s = l * l + col
            t = dc * gsrc_blocks[r]
            gx_rows[s] = t if gx_rows[s] is None else gx_rows[s] + t
            ti = jnp.sum(dc * gtgt_blocks[r], axis=0, keepdims=True)  # [1,C]
            gxi_rows[s] = ti if gxi_rows[s] is None else gxi_rows[s] + ti
    gx = jnp.stack([rw for rw in gx_rows], axis=0)  # [S, A, C]
    gxi = jnp.concatenate(gxi_rows, axis=0)  # [S, C]

    return (
        gx, gxi, gxe_acc,
        jnp.stack(gwg_l), jnp.stack(gbg_l),
        jnp.stack(gw1_0_l), jnp.stack(gw2_0_l),
        [jnp.stack(gfc1_l[m]) for m in range(m_max)],
        [jnp.stack(gw2r_l[m]) for m in range(m_max)],
        [jnp.stack(gw2i_l[m]) for m in range(m_max)],
    )
