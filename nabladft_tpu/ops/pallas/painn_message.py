"""Fused Pallas kernel for the PaiNN message block.

The PaiNN layer's cost is ~25 separate XLA passes over [B,A,A,·] pair
tensors (filter matmul, mask/φ products, three reductions — profiled at
~6ms each on v5e). This kernel computes the whole message block in ONE
pass per (batch, receiver-tile):

    m   = (rbf_env @ W + b) ⊙ φ_j ⊙ mask           (never hits HBM)
    ds  = Σ_j m[:, :F]
    dv  = Σ_j m[:, F:2F] ⊙ v_j  +  Σ_j m[:, 2F:] ⊙ û_ij

plus the matching backward kernel producing all six input gradients, wired
together with `jax.custom_vjp`. HBM traffic per layer drops from ~25·0.5GB
to one rbf_env read + small node-level tensors.

Use: first-order paths (inference, force evaluation inside the relaxation
engine, MD). Training needs gradients *of* the backward (second order) —
the backward here is a Pallas kernel and is not further differentiable, so
the training step keeps the XLA formulation (`PaiNN(use_pallas=False)`,
the default).

All shapes static: B, A, R, F fixed per compilation; A padded to the
receiver-tile size internally. Tested against the XLA reference in
interpret mode (CPU) and compiled on TPU.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_I = 8  # receivers per program


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(rbf_ref, phi_ref, v_ref, unit_ref, mask_ref, w_ref, b_ref,
                ds_ref, dv_ref, *, f: int):
    rbf = rbf_ref[0]  # [TI, A, R]
    ti, a, r = rbf.shape
    w = w_ref[:]  # [R, 3F]
    m = jnp.dot(
        rbf.reshape(ti * a, r), w, preferred_element_type=jnp.float32
    ) + b_ref[0].astype(jnp.float32)
    m = m.reshape(ti, a, 3 * f)
    phi = phi_ref[0]  # [A, 3F]
    m = m * phi[None].astype(jnp.float32)
    m = m * mask_ref[0].astype(jnp.float32)[:, :, None]
    ds_ref[0] = m[..., :f].sum(axis=1).astype(ds_ref.dtype)
    v = v_ref[0].astype(jnp.float32)  # [A, 3F] = (c-major: c*F+f)
    u = unit_ref[0].astype(jnp.float32)  # [TI, A, 3]
    mvv = m[..., f : 2 * f]
    mvs = m[..., 2 * f :]
    outs = []
    for c in range(3):
        vc = v[:, c * f : (c + 1) * f]  # simple slice, then expand
        uc = u[:, :, c]
        dv_c = (mvv * vc[None]).sum(axis=1)
        dv_c = dv_c + (mvs * uc[:, :, None]).sum(axis=1)
        outs.append(dv_c)
    dv_ref[0] = jnp.concatenate(outs, axis=-1).astype(dv_ref.dtype)


def _run_fwd(rbf_env, phi, v_flat, unit, mask, w, b, *, interpret: bool):
    bsz, a = mask.shape[0], mask.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    a_pad = ((a + TILE_I - 1) // TILE_I) * TILE_I
    rbf_p = _pad_to(rbf_env, TILE_I, 1)
    unit_p = _pad_to(unit, TILE_I, 1)
    mask_p = _pad_to(mask, TILE_I, 1)
    grid = (bsz, a_pad // TILE_I)
    ds, dv = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_I, a, r), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, TILE_I, a, 3), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((1, TILE_I, a), lambda bi, ii: (bi, ii, 0)),
            pl.BlockSpec((r, f3), lambda bi, ii: (0, 0)),
            pl.BlockSpec((1, f3), lambda bi, ii: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_I, f), lambda bi, ii: (bi, ii, 0)),
            pl.BlockSpec((1, TILE_I, f3), lambda bi, ii: (bi, ii, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, a_pad, f), rbf_env.dtype),
            jax.ShapeDtypeStruct((bsz, a_pad, f3), rbf_env.dtype),
        ],
        interpret=interpret,
    )(rbf_p, phi, v_flat, unit_p, mask_p, w, b.reshape(1, -1))
    return ds[:, :a], dv[:, :a]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(rbf_ref, phi_ref, v_ref, unit_ref, mask_ref, w_ref, b_ref,
                gds_ref, gdv_ref,
                grbf_ref, gphi_ref, gv_ref, gunit_ref, gw_ref, gb_ref,
                *, f: int):
    i_prog = pl.program_id(1)
    b_prog = pl.program_id(0)
    rbf = rbf_ref[0].astype(jnp.float32)  # [TI, A, R]
    ti, a, r = rbf.shape
    w = w_ref[:].astype(jnp.float32)
    phi = phi_ref[0].astype(jnp.float32)  # [A, 3F]
    v = v_ref[0].astype(jnp.float32)  # [A, 3F]
    u = unit_ref[0].astype(jnp.float32)  # [TI, A, 3]
    mask = mask_ref[0].astype(jnp.float32)[:, :, None]
    gds = gds_ref[0].astype(jnp.float32)  # [TI, F]
    gdv = gdv_ref[0].astype(jnp.float32)  # [TI, 3F]

    m_pre = jnp.dot(rbf.reshape(ti * a, r), w, preferred_element_type=jnp.float32)
    m_pre = (m_pre + b_ref[0].astype(jnp.float32)).reshape(ti, a, 3 * f)

    # cotangents of the masked message m = m_pre * phi_j * mask
    mbar_s = jnp.broadcast_to(gds[:, None, :], (ti, a, f))
    gdv_c = [gdv[:, c * f : (c + 1) * f] for c in range(3)]  # [TI,F] each
    v_c = [v[:, c * f : (c + 1) * f] for c in range(3)]  # [A,F] each
    u_c = [u[:, :, c] for c in range(3)]  # [TI,A] each
    mbar_vv = sum(gdv_c[c][:, None] * v_c[c][None] for c in range(3))
    mbar_vs = sum(gdv_c[c][:, None] * u_c[c][:, :, None] for c in range(3))
    mbar = jnp.concatenate([mbar_s, mbar_vv, mbar_vs], axis=-1) * mask  # [TI,A,3F]

    gm_pre = mbar * phi[None]  # cotangent of m_pre
    # grad rbf: gm_pre @ W^T
    grbf_ref[0] = jnp.dot(
        gm_pre.reshape(ti * a, 3 * f), w.T, preferred_element_type=jnp.float32
    ).reshape(ti, a, r).astype(grbf_ref.dtype)
    # grad unit: Σ_f m3 * gdv_c
    m3 = m_pre[..., 2 * f :] * phi[:, 2 * f :][None] * mask
    gu = [(m3 * gdv_c[c][:, None]).sum(axis=-1) for c in range(3)]
    gunit_ref[0] = jnp.stack(gu, axis=-1).astype(gunit_ref.dtype)

    # accumulated outputs (same block revisited across the grid): init at
    # the first program, accumulate afterwards
    @pl.when((i_prog == 0) & (b_prog == 0))
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    @pl.when(i_prog == 0)
    def _init_nodes():
        gphi_ref[...] = jnp.zeros_like(gphi_ref)
        gv_ref[...] = jnp.zeros_like(gv_ref)

    gw_ref[...] += jnp.dot(
        rbf.reshape(ti * a, r).T, gm_pre.reshape(ti * a, 3 * f),
        preferred_element_type=jnp.float32,
    ).astype(gw_ref.dtype)
    gb_ref[...] += gm_pre.sum(axis=(0, 1))[None].astype(gb_ref.dtype)
    gphi_ref[0] += (mbar * m_pre).sum(axis=0).astype(gphi_ref.dtype)  # [A,3F]
    m2 = m_pre[..., f : 2 * f] * phi[:, f : 2 * f][None] * mask
    gv_parts = [(m2 * gdv_c[c][:, None]).sum(axis=0) for c in range(3)]
    gv_ref[0] += jnp.concatenate(gv_parts, axis=-1).astype(gv_ref.dtype)


def _run_bwd(rbf_env, phi, v_flat, unit, mask, w, b, gds, gdv, *, interpret: bool):
    bsz, a = mask.shape[0], mask.shape[1]
    r, f3 = w.shape
    f = f3 // 3
    a_pad = ((a + TILE_I - 1) // TILE_I) * TILE_I
    rbf_p = _pad_to(rbf_env, TILE_I, 1)
    unit_p = _pad_to(unit, TILE_I, 1)
    mask_p = _pad_to(mask, TILE_I, 1)
    gds_p = _pad_to(gds, TILE_I, 1)
    gdv_p = _pad_to(gdv, TILE_I, 1)
    grid = (bsz, a_pad // TILE_I)
    f32 = jnp.float32
    grbf, gphi, gv, gunit, gw, gb = pl.pallas_call(
        functools.partial(_bwd_kernel, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_I, a, r), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, TILE_I, a, 3), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((1, TILE_I, a), lambda bi, ii: (bi, ii, 0)),
            pl.BlockSpec((r, f3), lambda bi, ii: (0, 0)),
            pl.BlockSpec((1, f3), lambda bi, ii: (0, 0)),
            pl.BlockSpec((1, TILE_I, f), lambda bi, ii: (bi, ii, 0)),
            pl.BlockSpec((1, TILE_I, f3), lambda bi, ii: (bi, ii, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_I, a, r), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, a, f3), lambda bi, ii: (bi, 0, 0)),
            pl.BlockSpec((1, TILE_I, a, 3), lambda bi, ii: (bi, ii, 0, 0)),
            pl.BlockSpec((r, f3), lambda bi, ii: (0, 0)),
            pl.BlockSpec((1, f3), lambda bi, ii: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, a_pad, a, r), f32),
            jax.ShapeDtypeStruct((bsz, a, f3), f32),
            jax.ShapeDtypeStruct((bsz, a, f3), f32),
            jax.ShapeDtypeStruct((bsz, a_pad, a, 3), f32),
            jax.ShapeDtypeStruct((r, f3), f32),
            jax.ShapeDtypeStruct((1, f3), f32),
        ],
        interpret=interpret,
    )(rbf_p, phi, v_flat, unit_p, mask_p, w, b.reshape(1, -1), gds_p, gdv_p)
    return grbf[:, :a], gphi, gv, gunit[:, :a], gw, gb[0]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def painn_message_fused(rbf_env, phi, v_flat, unit, mask, w, b, interpret=False):
    """Fused PaiNN message. Shapes:
    rbf_env [B,A,A,R], phi [B,A,3F], v_flat [B,A,3F] (component-major),
    unit [B,A,A,3], mask [B,A,A] float, w [R,3F], b [3F]
    → (ds [B,A,F], dv_flat [B,A,3F]).
    """
    return _run_fwd(rbf_env, phi, v_flat, unit, mask, w, b, interpret=interpret)


def _vjp_fwd(rbf_env, phi, v_flat, unit, mask, w, b, interpret):
    out = _run_fwd(rbf_env, phi, v_flat, unit, mask, w, b, interpret=interpret)
    return out, (rbf_env, phi, v_flat, unit, mask, w, b)


def _vjp_bwd(interpret, residuals, cotangents):
    rbf_env, phi, v_flat, unit, mask, w, b = residuals
    gds, gdv = cotangents
    grbf, gphi, gv, gunit, gw, gb = _run_bwd(
        rbf_env, phi, v_flat, unit, mask, w, b, gds, gdv, interpret=interpret
    )
    return (
        grbf.astype(rbf_env.dtype),
        gphi.astype(phi.dtype),
        gv.astype(v_flat.dtype),
        gunit.astype(unit.dtype),
        jnp.zeros_like(mask),
        gw.astype(w.dtype),
        gb.astype(b.dtype),
    )


painn_message_fused.defvjp(_vjp_fwd, _vjp_bwd)


def painn_message_reference(rbf_env, phi, v_flat, unit, mask, w, b):
    """Plain-XLA reference implementation (for tests and 2nd-order paths)."""
    f3 = w.shape[1]
    f = f3 // 3
    m = jnp.einsum("bijr,rk->bijk", rbf_env, w) + b
    m = m * phi[:, None] * mask[..., None]
    ds = m[..., :f].sum(axis=2)
    v = v_flat.reshape(*v_flat.shape[:-1], 3, f)
    dv1 = (m[..., f : 2 * f][:, :, :, None, :] * v[:, None]).sum(axis=2)
    dv2 = (m[..., 2 * f :][:, :, :, None, :] * unit[..., None]).sum(axis=2)
    dv = (dv1 + dv2).reshape(*ds.shape[:-1], f3)
    return ds, dv
