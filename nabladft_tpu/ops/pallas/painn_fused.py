"""Fused PaiNN message kernels: forward, backward, and dual (JVP) lanes.

This replaces the round-1 kernel pair with a set designed so the *training*
step — whose cost is second-order AD through the pairwise message block
(reference semantics: forces = -∂E/∂pos, painn_pyg/painn.py:130-146, then
∂loss/∂θ through them) — runs entirely in fused kernels. The trick is the
surrogate force-gradient formulation (see train/engine.py): with
w = stop_grad(∂L_F/∂F), the parameter gradient of the force loss is the
gradient of a directional derivative, so the graph that gets reverse-
differentiated is a *dual-number forward* (primal + tangent lanes). In that
graph, pair-level tensors (rbf, unit, and their pos-tangents) are
θ-independent leaves — their cotangents are never needed, which removes the
[B,A,A,R] gradient traffic that dominates the XLA formulation.

Kernels (all channel-streamed to keep VMEM small; grid over molecules):
  A `_fwd`       : (rbf, phi, v, unit_t, w)          → ds, dv
  B `_bwd`       : + (rbfp, gds, gdv)                → g_dist, g_unit_t,
                                                       gphi, gv[, gw]
  C `_dual_fwd`  : + tangents (rbfd, phid, vd, unitd_t) → ds, dv, dsd, dvd
  D `_dual_bwd`  : + (gds, gdv, gdsd, gdvd)          → gphi, gphid, gv,
                                                       gvd, gw

Semantics (premasked inputs; bias and mask terms are handled *outside* in
XLA — see models/painn.py — so the kernels see rbf already multiplied by
envelope and adjacency):

  wm  = rbf @ W                (channel k slice: wm_k = rbf @ W[:, kF:(k+1)F])
  ds_i  = Σ_j wm0[i,j] ⊙ φ0_j
  dv_ic = Σ_j wm1[i,j] ⊙ φ1_j ⊙ v_jc  +  Σ_j u_c[i,j] · wm2[i,j] ⊙ φ2_j

Kernel B folds the chain rule through the radial basis: instead of emitting
grbf [B,A,A,R] it takes rbfp = ∂(basis·envelope)/∂dist and emits the scalar
g_dist [B,A,A] directly (the [B,A,A,R] cotangent never exists in HBM).
Because of that, the custom_vjp op takes `dist` as an explicit input and
declares rbf/rbfp non-differentiable: the caller must pass rbf == f(dist),
rbfp == f'(dist), which models/painn.py guarantees.

Kernel D emits *node-level cotangents only* (gphi, gphid, gv, gvd, gw). It
is therefore only valid where positions are not differentiated — exactly
the surrogate's parameter-gradient pass. `painn_message_train` (custom_jvp)
is the only entry point that reaches it.

Layouts: v and dv are component-major flat [B,A,3F] (slice c*F:(c+1)*F is
spatial component c); unit_t is [B,A,3,A] (u_t[b,i,c,j] = unit(j→i)_c) so
the u-contractions run on the MXU as K∈{3,6} batched matmuls instead of
VPU broadcasts over a 3-wide lane dim.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero
from jax.experimental import pallas as pl

F32 = jnp.float32


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _bdot(lhs, rhs, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(contract, batch), preferred_element_type=F32
    )


def _sl(x, k, f, axis=-1):
    """Static channel slice [kF:(k+1)F] via lax.slice_in_dim (Mosaic-safe)."""
    return jax.lax.slice_in_dim(x, k * f, (k + 1) * f, axis=axis)


def _e0(x):
    return jnp.expand_dims(x, 0)


def _e1(x):
    return jnp.expand_dims(x, 1)


# ---------------------------------------------------------------------------
# Analytic FLOP model (XLA cost analysis reports 0 for custom calls; these
# feed pl.CostEstimate and the benchmark's hand-computed MFU).
# ---------------------------------------------------------------------------


def kernel_flops(kind: str, b: int, a: int, r: int, f: int) -> int:
    """Approximate FLOPs of one kernel invocation over the whole grid.

    Matmul terms are exact; elementwise terms are counted from the kernel
    bodies (+/- a few percent).
    """
    mm = 2 * a * a * r * f          # one [A*A, R] @ [R, F] matmul
    el = a * a * f                  # one [A, A, F] elementwise op
    ud = 2 * a * a * 3 * f          # one [A,3,A] x [A,?,F] u-contraction
    per_mol = {
        "fwd":      3 * mm + 1 * ud + 26 * el,
        "bwd":      9 * mm + 3 * ud + 60 * el,
        "dual_fwd": 6 * mm + 3 * ud + 50 * el,
        "dual_bwd": 24 * mm + 4 * ud + 120 * el,
    }[kind]
    return int(b * per_mol)


# ---------------------------------------------------------------------------
# kernel A: forward
# ---------------------------------------------------------------------------


def _fwd_kernel(rbf_ref, phi_ref, v_ref, ut_ref, w_ref, ds_ref, dv_ref, *, bm, f):
    for g in range(bm):
        rbf = rbf_ref[g]  # [A, A, R]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r)
        phi = phi_ref[g].astype(F32)  # [A, 3F]
        w = w_ref[:]
        # channel 0: scalar messages
        wm0 = _dot(flat, _sl(w, 0, f)).reshape(a, a, f)
        ds_ref[g] = (wm0 * _e0(_sl(phi, 0, f))).sum(axis=1).astype(ds_ref.dtype)
        # channel 1: vector-mix messages
        wm1 = _dot(flat, _sl(w, 1, f)).reshape(a, a, f)
        vv = v_ref[g].astype(F32)  # [A, 3F] c-major
        phi1 = _sl(phi, 1, f)
        dvs = []
        for c in range(3):
            qc = phi1 * _sl(vv, c, f)
            dvs.append((wm1 * _e0(qc)).sum(axis=1))
        # channel 2: directional messages — u-contraction on the MXU
        wm2 = _dot(flat, _sl(w, 2, f)).reshape(a, a, f)
        m3 = wm2 * _e0(_sl(phi, 2, f))
        u = ut_ref[g].astype(F32)  # [A, 3, A]
        dvu = _bdot(u, m3, ((2,), (1,)))  # [A, 3, F]
        dv = jnp.concatenate(dvs, axis=-1) + dvu.reshape(a, 3 * f)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _run_fwd(rbf, phi, v, unit_t, w, *, bm, interpret):
    b, a = phi.shape[0], phi.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    grid = (b // bm,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bm=bm, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, 3, a), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((r, f3), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, f), rbf.dtype),
            jax.ShapeDtypeStruct((b, a, f3), rbf.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("fwd", b, a, w.shape[0], f),
            bytes_accessed=0, transcendentals=0,
        ),
        interpret=interpret,
    )(rbf, phi, v, unit_t, w)


# ---------------------------------------------------------------------------
# kernel B: first-order backward (pos grads via g_dist, node grads, gw)
# ---------------------------------------------------------------------------


def _bwd_kernel(rbf_ref, rbfp_ref, phi_ref, v_ref, ut_ref, w_ref, gds_ref, gdv_ref,
                gd_ref, gut_ref, gphi_ref, gv_ref, gw_ref, *, bm, f):
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r)
        flatp = rbfp_ref[g].reshape(a * a, r)
        phi = phi_ref[g].astype(F32)
        vv = v_ref[g].astype(F32)
        w = w_ref[:]
        g1 = gds_ref[g].astype(F32)  # [A, F]
        g2 = gdv_ref[g].astype(F32)  # [A, 3F] c-major
        g2c = g2.reshape(a, 3, f)

        # channel 0
        wm0 = _dot(flat, _sl(w, 0, f)).reshape(a, a, f)
        rpw0 = _dot(flatp, _sl(w, 0, f)).reshape(a, a, f)
        gwm0 = _e1(g1) * _e0(_sl(phi, 0, f))
        gd = (gwm0 * rpw0).sum(axis=-1)  # [A, A]
        gphi0 = (_e1(g1) * wm0).sum(axis=0)  # [A(j), F]
        gw_ref[:, :f] += _dot(flat.T, gwm0.reshape(a * a, f)).astype(gw_ref.dtype)

        # channel 1
        wm1 = _dot(flat, _sl(w, 1, f)).reshape(a, a, f)
        rpw1 = _dot(flatp, _sl(w, 1, f)).reshape(a, a, f)
        phi1 = _sl(phi, 1, f)
        gwm1 = jnp.zeros((a, a, f), F32)
        gphi1 = jnp.zeros((a, f), F32)
        gvs = []
        for c in range(3):
            vc = _sl(vv, c, f)
            g2_c = jax.lax.index_in_dim(g2c, c, axis=1, keepdims=False)
            gwm1 = gwm1 + _e1(g2_c) * _e0(phi1 * vc)
            s_c = (_e1(g2_c) * wm1).sum(axis=0)  # [A(j), F]
            gphi1 = gphi1 + s_c * vc
            gvs.append(s_c * phi1)
        gd = gd + (gwm1 * rpw1).sum(axis=-1)
        gw_ref[:, f : 2 * f] += _dot(flat.T, gwm1.reshape(a * a, f)).astype(gw_ref.dtype)

        # channel 2
        wm2 = _dot(flat, _sl(w, 2, f)).reshape(a, a, f)
        rpw2 = _dot(flatp, _sl(w, 2, f)).reshape(a, a, f)
        phi2 = _sl(phi, 2, f)
        u = ut_ref[g].astype(F32)  # [A, 3, A]
        pa = _bdot(u, g2c, ((1,), (1,)))  # [A(i), A(j), F] = Σ_c u_c g2_c
        gwm2 = pa * _e0(phi2)
        gd = gd + (gwm2 * rpw2).sum(axis=-1)
        m3 = wm2 * phi2[None]
        gu = _bdot(m3, g2c, ((2,), (2,)))  # [A(i), A(j), 3]
        gut_ref[g] = jnp.swapaxes(gu, 1, 2).astype(gut_ref.dtype)
        gphi2 = (pa * wm2).sum(axis=0)
        gw_ref[:, 2 * f :] += _dot(flat.T, gwm2.reshape(a * a, f)).astype(gw_ref.dtype)

        gd_ref[g] = gd.astype(gd_ref.dtype)
        gphi_ref[g] = jnp.concatenate([gphi0, gphi1, gphi2], axis=-1).astype(gphi_ref.dtype)
        gv_ref[g] = jnp.concatenate(gvs, axis=-1).astype(gv_ref.dtype)


def _run_bwd(rbf, rbfp, phi, v, unit_t, w, gds, gdv, *, bm, interpret):
    b, a = phi.shape[0], phi.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    grid = (b // bm,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, bm=bm, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, 3, a), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((r, f3), lambda i: (0, 0)),
            pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, a, a), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, 3, a), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, f3), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, a), F32),
            jax.ShapeDtypeStruct((b, a, 3, a), F32),
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((r, f3), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("bwd", b, a, w.shape[0], f),
            bytes_accessed=0, transcendentals=0,
        ),
        interpret=interpret,
    )(rbf, rbfp, phi, v, unit_t, w, gds, gdv)


# ---------------------------------------------------------------------------
# kernel C: dual forward (primal + tangent lanes)
# ---------------------------------------------------------------------------


def _dual_fwd_kernel(rbf_ref, rbfd_ref, phi_ref, phid_ref, v_ref, vd_ref,
                     ut_ref, utd_ref, w_ref,
                     ds_ref, dv_ref, dsd_ref, dvd_ref, *, bm, f):
    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r)
        flatd = rbfd_ref[g].reshape(a * a, r)
        phi = phi_ref[g].astype(F32)
        phid = phid_ref[g].astype(F32)
        vv = v_ref[g].astype(F32)
        vvd = vd_ref[g].astype(F32)
        w = w_ref[:]

        wm0 = _dot(flat, _sl(w, 0, f)).reshape(a, a, f)
        wmd0 = _dot(flatd, _sl(w, 0, f)).reshape(a, a, f)
        phi0, phid0 = _sl(phi, 0, f), _sl(phid, 0, f)
        ds_ref[g] = (wm0 * _e0(phi0)).sum(axis=1).astype(ds_ref.dtype)
        dsd_ref[g] = (
            (wmd0 * _e0(phi0)).sum(axis=1)
            + (wm0 * _e0(phid0)).sum(axis=1)
        ).astype(dsd_ref.dtype)

        wm1 = _dot(flat, _sl(w, 1, f)).reshape(a, a, f)
        wmd1 = _dot(flatd, _sl(w, 1, f)).reshape(a, a, f)
        phi1, phid1 = _sl(phi, 1, f), _sl(phid, 1, f)
        dvs, dvds = [], []
        for c in range(3):
            vc = _sl(vv, c, f)
            vdc = _sl(vvd, c, f)
            qc = phi1 * vc
            qdc = phid1 * vc + phi1 * vdc
            dvs.append((wm1 * _e0(qc)).sum(axis=1))
            dvds.append((wmd1 * _e0(qc)).sum(axis=1) + (wm1 * _e0(qdc)).sum(axis=1))

        wm2 = _dot(flat, _sl(w, 2, f)).reshape(a, a, f)
        wmd2 = _dot(flatd, _sl(w, 2, f)).reshape(a, a, f)
        phi2, phid2 = _sl(phi, 2, f), _sl(phid, 2, f)
        m3 = wm2 * _e0(phi2)
        m3d = wmd2 * _e0(phi2) + wm2 * _e0(phid2)
        u = ut_ref[g].astype(F32)
        ud = utd_ref[g].astype(F32)
        dvu = _bdot(u, m3, ((2,), (1,)))
        dvdu = _bdot(ud, m3, ((2,), (1,))) + _bdot(u, m3d, ((2,), (1,)))
        dv_ref[g] = (jnp.concatenate(dvs, axis=-1) + dvu.reshape(a, 3 * f)).astype(dv_ref.dtype)
        dvd_ref[g] = (jnp.concatenate(dvds, axis=-1) + dvdu.reshape(a, 3 * f)).astype(dvd_ref.dtype)


def _run_dual_fwd(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, *, bm, interpret):
    b, a = phi.shape[0], phi.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    grid = (b // bm,)
    pair4 = pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0))
    node = pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0))
    ut = pl.BlockSpec((bm, a, 3, a), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_dual_fwd_kernel, bm=bm, f=f),
        grid=grid,
        in_specs=[pair4, pair4, node, node, node, node, ut, ut,
                  pl.BlockSpec((r, f3), lambda i: (0, 0))],
        out_specs=[
            pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, f), rbf.dtype),
            jax.ShapeDtypeStruct((b, a, f3), rbf.dtype),
            jax.ShapeDtypeStruct((b, a, f), rbf.dtype),
            jax.ShapeDtypeStruct((b, a, f3), rbf.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("dual_fwd", b, a, w.shape[0], f),
            bytes_accessed=0, transcendentals=0,
        ),
        interpret=interpret,
    )(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w)


# ---------------------------------------------------------------------------
# kernel D: backward of the dual forward — node-level cotangents only
# ---------------------------------------------------------------------------


def _dual_bwd_kernel(rbf_ref, rbfd_ref, phi_ref, phid_ref, v_ref, vd_ref,
                     ut_ref, utd_ref, w_ref,
                     gds_ref, gdv_ref, gdsd_ref, gdvd_ref,
                     gphi_ref, gphid_ref, gv_ref, gvd_ref, gw_ref, *, bm, f):
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r)
        flatd = rbfd_ref[g].reshape(a * a, r)
        phi = phi_ref[g].astype(F32)
        phid = phid_ref[g].astype(F32)
        vv = v_ref[g].astype(F32)
        vvd = vd_ref[g].astype(F32)
        w = w_ref[:]
        g1 = gds_ref[g].astype(F32)
        g1d = gdsd_ref[g].astype(F32)
        g2c = gdv_ref[g].astype(F32).reshape(a, 3, f)
        g2dc = gdvd_ref[g].astype(F32).reshape(a, 3, f)

        # ---- channel 0 ----------------------------------------------------
        wm0 = _dot(flat, _sl(w, 0, f)).reshape(a, a, f)
        wmd0 = _dot(flatd, _sl(w, 0, f)).reshape(a, a, f)
        phi0, phid0 = _sl(phi, 0, f), _sl(phid, 0, f)
        gwm0 = _e1(g1) * _e0(phi0) + _e1(g1d) * _e0(phid0)
        gwmd0 = _e1(g1d) * _e0(phi0)
        gphi0 = (_e1(g1) * wm0 + _e1(g1d) * wmd0).sum(axis=0)
        gphid0 = (_e1(g1d) * wm0).sum(axis=0)
        gw_ref[:, :f] += (
            _dot(flat.T, gwm0.reshape(a * a, f)) + _dot(flatd.T, gwmd0.reshape(a * a, f))
        ).astype(gw_ref.dtype)

        # ---- channel 1 ----------------------------------------------------
        wm1 = _dot(flat, _sl(w, 1, f)).reshape(a, a, f)
        wmd1 = _dot(flatd, _sl(w, 1, f)).reshape(a, a, f)
        phi1, phid1 = _sl(phi, 1, f), _sl(phid, 1, f)
        gwm1 = jnp.zeros((a, a, f), F32)
        gwmd1 = jnp.zeros((a, a, f), F32)
        gphi1 = jnp.zeros((a, f), F32)
        gphid1 = jnp.zeros((a, f), F32)
        gvs, gvds = [], []
        for c in range(3):
            vc = _sl(vv, c, f)
            vdc = _sl(vvd, c, f)
            qc = phi1 * vc
            qdc = phid1 * vc + phi1 * vdc
            g2_c = jax.lax.index_in_dim(g2c, c, axis=1, keepdims=False)
            g2d_c = jax.lax.index_in_dim(g2dc, c, axis=1, keepdims=False)
            gwm1 = gwm1 + _e1(g2_c) * _e0(qc) + _e1(g2d_c) * _e0(qdc)
            gwmd1 = gwmd1 + _e1(g2d_c) * _e0(qc)
            s_c = (_e1(g2_c) * wm1 + _e1(g2d_c) * wmd1).sum(axis=0)
            sd_c = (_e1(g2d_c) * wm1).sum(axis=0)
            gphi1 = gphi1 + s_c * vc + sd_c * vdc
            gphid1 = gphid1 + sd_c * vc
            gvs.append(s_c * phi1 + sd_c * phid1)
            gvds.append(sd_c * phi1)
        gw_ref[:, f : 2 * f] += (
            _dot(flat.T, gwm1.reshape(a * a, f)) + _dot(flatd.T, gwmd1.reshape(a * a, f))
        ).astype(gw_ref.dtype)

        # ---- channel 2 ----------------------------------------------------
        wm2 = _dot(flat, _sl(w, 2, f)).reshape(a, a, f)
        wmd2 = _dot(flatd, _sl(w, 2, f)).reshape(a, a, f)
        phi2, phid2 = _sl(phi, 2, f), _sl(phid, 2, f)
        u = ut_ref[g].astype(F32)  # [A, 3, A]
        ud = utd_ref[g].astype(F32)
        u6 = jnp.concatenate([u, ud], axis=1)  # [A, 6, A]
        g6 = jnp.concatenate([g2c, g2dc], axis=1)  # [A, 6, F]
        pa = _bdot(u6, g6, ((1,), (1,)))  # Σ_c u_c g2_c + ud_c g2d_c → [A,A,F]
        pb = _bdot(u, g2dc, ((1,), (1,)))  # Σ_c u_c g2d_c
        gwm2 = pa * _e0(phi2) + pb * _e0(phid2)
        gwmd2 = pb * _e0(phi2)
        gphi2 = (pa * wm2 + pb * wmd2).sum(axis=0)
        gphid2 = (pb * wm2).sum(axis=0)
        gw_ref[:, 2 * f :] += (
            _dot(flat.T, gwm2.reshape(a * a, f)) + _dot(flatd.T, gwmd2.reshape(a * a, f))
        ).astype(gw_ref.dtype)

        gphi_ref[g] = jnp.concatenate([gphi0, gphi1, gphi2], axis=-1).astype(gphi_ref.dtype)
        gphid_ref[g] = jnp.concatenate([gphid0, gphid1, gphid2], axis=-1).astype(gphid_ref.dtype)
        gv_ref[g] = jnp.concatenate(gvs, axis=-1).astype(gv_ref.dtype)
        gvd_ref[g] = jnp.concatenate(gvds, axis=-1).astype(gvd_ref.dtype)


def _run_dual_bwd(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w,
                  gds, gdv, gdsd, gdvd, *, bm, interpret):
    b, a = phi.shape[0], phi.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    grid = (b // bm,)
    pair4 = pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0))
    node = pl.BlockSpec((bm, a, f3), lambda i: (i, 0, 0))
    node1 = pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0))
    ut = pl.BlockSpec((bm, a, 3, a), lambda i: (i, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_dual_bwd_kernel, bm=bm, f=f),
        grid=grid,
        in_specs=[pair4, pair4, node, node, node, node, ut, ut,
                  pl.BlockSpec((r, f3), lambda i: (0, 0)),
                  node1, node, node1, node],
        out_specs=[node, node, node, node,
                   pl.BlockSpec((r, f3), lambda i: (0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((b, a, f3), F32),
            jax.ShapeDtypeStruct((r, f3), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("dual_bwd", b, a, w.shape[0], f),
            bytes_accessed=0, transcendentals=0,
        ),
        interpret=interpret,
    )(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, gds, gdv, gdsd, gdvd)


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------


def _pick_bm(b: int, prefer: Sequence[int] = (4, 2, 1)) -> int:
    for bm in prefer:
        if b % bm == 0:
            return bm
    return 1


def _bm_for(rbf, bf16_prefer, f32_prefer) -> int:
    """Molecules per program, halved for f32 inputs (VMEM is the binding
    constraint: the pair tiles double in size vs bfloat16)."""
    prefer = bf16_prefer if rbf.dtype == jnp.bfloat16 else f32_prefer
    return _pick_bm(rbf.shape[0], prefer)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def painn_message(dist, rbf, rbfp, phi, v, unit_t, w, interpret=False):
    """First-order fused PaiNN message (inference / forces / relaxation).

    dist [B,A,A] is carried only for AD routing: the VJP emits the chain
    through the radial basis as g_dist (requires rbf == f(dist) premasked,
    rbfp == f'(dist)); rbf/rbfp themselves get zero cotangents.
    Returns (ds [B,A,F], dv [B,A,3F] c-major).
    """
    del dist, rbfp
    return _run_fwd(rbf, phi, v, unit_t, w, bm=_bm_for(rbf, (4, 2, 1), (2, 1)),
                    interpret=interpret)


def _pm_fwd(dist, rbf, rbfp, phi, v, unit_t, w, interpret):
    out = painn_message(dist, rbf, rbfp, phi, v, unit_t, w, interpret)
    return out, (rbf, rbfp, phi, v, unit_t, w)


def _pm_bwd(interpret, res, cots):
    rbf, rbfp, phi, v, unit_t, w = res
    gds, gdv = cots
    g_dist, g_ut, gphi, gv, gw = _run_bwd(
        rbf, rbfp, phi, v, unit_t, w, gds.astype(rbf.dtype), gdv.astype(rbf.dtype),
        bm=_bm_for(rbf, (2, 1), (1,)), interpret=interpret,
    )
    zero_pair = jnp.zeros_like(rbf)
    return (g_dist.astype(jnp.float32), zero_pair, zero_pair,
            gphi.astype(phi.dtype), gv.astype(v.dtype),
            g_ut.astype(unit_t.dtype), gw.astype(w.dtype))


painn_message.defvjp(_pm_fwd, _pm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def painn_dual(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, interpret=False):
    """Dual-number fused message: primal + tangent lanes in one sweep.

    VALID ONLY where positions are non-differentiated leaves (the surrogate
    parameter-gradient pass): the VJP emits node-level cotangents
    (gphi, gphid, gv, gvd, gw) and ZEROS for all pair-level inputs.
    """
    return _run_dual_fwd(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w,
                         bm=_bm_for(rbf, (2, 1), (1,)), interpret=interpret)


def _pd_fwd(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, interpret):
    out = painn_dual(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, interpret)
    return out, (rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w)


def _pd_bwd(interpret, res, cots):
    rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w = res
    gds, gdv, gdsd, gdvd = (c.astype(rbf.dtype) for c in cots)
    gphi, gphid, gv, gvd, gw = _run_dual_bwd(
        rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, gds, gdv, gdsd, gdvd,
        bm=_pick_bm(rbf.shape[0], (1,)), interpret=interpret,
    )
    zp = jnp.zeros_like(rbf)
    zu = jnp.zeros_like(unit_t)
    return (zp, zp, gphi.astype(phi.dtype), gphid.astype(phi.dtype),
            gv.astype(v.dtype), gvd.astype(v.dtype), zu, zu, gw.astype(w.dtype))


painn_dual.defvjp(_pd_fwd, _pd_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(7,))
def painn_message_train(dist, rbf, rbfp, phi, v, unit_t, w, interpret=False):
    """The message op for the surrogate training pass.

    Under `jax.jvp` (directional derivative wrt positions) this expands to
    the fused dual kernel; the resulting graph is first-order reverse-
    differentiable wrt parameters through `painn_dual`'s custom VJP. Do not
    reverse-differentiate this op directly (no transpose rule) — the engine
    only ever evaluates it inside an explicit jvp.
    """
    del dist, rbfp
    return _run_fwd(rbf, phi, v, unit_t, w, bm=_pick_bm(rbf.shape[0]),
                    interpret=interpret)


def _pmt_jvp(interpret, primals, tangents):
    dist, rbf, rbfp, phi, v, unit_t, w = primals
    _, trbf, _, tphi, tv, tut, tw = tangents

    def inst(t, like):
        if isinstance(t, SymbolicZero) or type(t).__name__ == "Zero":
            return jnp.zeros_like(like)
        return t

    if not (isinstance(tw, SymbolicZero) or type(tw).__name__ == "Zero"):
        # parameter tangents are outside this kernel's contract — fall back
        # to the exact XLA jvp of the reference formulation
        f = lambda rbf, phi, v, unit_t, w: painn_message_reference(rbf, phi, v, unit_t, w)
        return jax.jvp(
            f, (rbf, phi, v, unit_t, w),
            (inst(trbf, rbf), inst(tphi, phi), inst(tv, v), inst(tut, unit_t), inst(tw, w)),
        )
    ds, dv, dsd, dvd = painn_dual(
        rbf, inst(trbf, rbf), phi, inst(tphi, phi), v, inst(tv, v),
        unit_t, inst(tut, unit_t), w, interpret,
    )
    return (ds, dv), (dsd, dvd)


painn_message_train.defjvp(_pmt_jvp, symbolic_zeros=True)


def painn_message_reference(rbf, phi, v, unit_t, w):
    """Plain-XLA reference of the kernel semantics (premasked rbf, no bias).

    Used by tests and as the `use_pallas="off"` model path; shapes/layouts
    identical to the kernels' (v and dv c-major flat, unit_t [B,A,3,A]).
    """
    f3 = w.shape[1]
    f = f3 // 3
    wm = jnp.einsum("bijr,rk->bijk", rbf, w)
    phif = phi.astype(wm.dtype)
    ds = (wm[..., :f] * phif[:, None, :, :f]).sum(axis=2)
    vv = v.astype(wm.dtype)
    phi1 = phif[:, :, f : 2 * f]
    dvs = []
    for c in range(3):
        qc = phi1 * vv[:, :, c * f : (c + 1) * f]
        dvs.append((wm[..., f : 2 * f] * qc[:, None]).sum(axis=2))
    m3 = wm[..., 2 * f :] * phif[:, None, :, 2 * f :]
    dvu = jnp.einsum("bicj,bijf->bicf", unit_t.astype(wm.dtype), m3)
    dv = jnp.concatenate(dvs, axis=-1) + dvu.reshape(*ds.shape[:2], f3)
    return ds.astype(rbf.dtype), dv.astype(rbf.dtype)
