"""Fused SchNet continuous-filter convolution kernels.

SchNet is the lightest reference model (schnetpack composition,
config/model/schnet.yaml) yet its XLA step ran at MFU 0.03: each
interaction materializes ~400 MB [B,A,K,F] HBM tensors (two filter-MLP
activations, the neighbor gather, their product) that exist only to be
reduced over neighbors — pure bandwidth.

These kernels run the whole per-pair pipeline in VMEM per molecule, on the
DENSE pair lattice (at nablaDFT sizes A<=62 dense all-pairs is smaller than
the K=63 neighbor list and feeds the MXU; masking is folded into the
premasked cutoff envelope `envf`, which also kills the filter bias b2 on
invalid pairs):

    z1  = rbf @ W1 + b1        h = ssp(z1)          # filter MLP
    wmr = h @ W2 + b2          wm = wmr * envf      # cosine cutoff + adj
    msg_i = sum_j wm[i,j] ⊙ xin[j]                  # cfconv reduce

Same 4-lane design as painn_fused (which see for the surrogate-training
rationale): A fwd, B bwd (emits the scalar g_dist chain through basis AND
envelope — no [B,A,A,R] cotangent in HBM), C dual (JVP) fwd, D dual bwd
(node/θ cotangents only — valid exactly in the surrogate parameter pass).
The filter MLP's nonlinearity adds the ssp'=σ and ssp''=σ' chain terms that
PaiNN's single-Dense filter doesn't have. Parity: tests/ops/test_schnet_fused.py.

Layouts: rbf/rbfp [B,A,A,R]; envf/envp [B,A,A] premasked (adj ∧ i≠j);
xin [B,A,F]; W1 [R,F]; b1 [1,F]; W2 [F,F]; b2 [1,F].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.custom_derivatives import SymbolicZero
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_LOG2 = 0.6931471805599453


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _ssp(x):
    return jax.nn.softplus(x) - _LOG2


def kernel_flops(kind: str, b: int, a: int, r: int, f: int) -> int:
    mm = 2 * a * a * r * f + 2 * a * a * f * f   # filter MLP matmuls
    el = a * a * f
    per_mol = {
        "fwd": mm + 6 * el,
        "bwd": 3 * mm + 20 * el,
        "dual_fwd": 2 * mm + 14 * el,
        "dual_bwd": 6 * mm + 40 * el,
    }[kind]
    return int(b * per_mol)


def _filter(flat, w, b1, w2, b2):
    """rbf -> (z1, s, h, wmr): the in-VMEM filter MLP."""
    z1 = _dot(flat, w) + b1
    s = jax.nn.sigmoid(z1)
    h = _ssp(z1)
    wmr = _dot(h, w2) + b2
    return z1, s, h, wmr


# ---------------------------------------------------------------- kernels ----


def _fwd_kernel(rbf_ref, envf_ref, xin_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                msg_ref, *, bm):
    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r).astype(F32)
        _, _, _, wmr = _filter(flat, w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0])
        f = wmr.shape[-1]
        wm = wmr.reshape(a, a, f) * envf_ref[g].astype(F32)[..., None]
        xin = xin_ref[g].astype(F32)
        msg_ref[g] = (wm * xin[None]).sum(axis=1).astype(msg_ref.dtype)


def _bwd_kernel(rbf_ref, rbfp_ref, envf_ref, envp_ref, xin_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, gmsg_ref,
                gd_ref, gxin_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref, *, bm):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw1_ref[...] = jnp.zeros_like(gw1_ref)
        gb1_ref[...] = jnp.zeros_like(gb1_ref)
        gw2_ref[...] = jnp.zeros_like(gw2_ref)
        gb2_ref[...] = jnp.zeros_like(gb2_ref)

    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r).astype(F32)
        flatp = rbfp_ref[g].reshape(a * a, r).astype(F32)
        w1, w2 = w1_ref[:], w2_ref[:]
        z1, s, h, wmr = _filter(flat, w1, b1_ref[0], w2, b2_ref[0])
        f = wmr.shape[-1]
        envf = envf_ref[g].astype(F32)
        wm = wmr.reshape(a, a, f) * envf[..., None]
        xin = xin_ref[g].astype(F32)
        gmsg = gmsg_ref[g].astype(F32)

        gwm = gmsg[:, None, :] * xin[None]                 # [A,A,F]
        gxin_ref[g] = (wm * gmsg[:, None, :]).sum(axis=0).astype(gxin_ref.dtype)
        g_env = (gwm * wmr.reshape(a, a, f)).sum(axis=-1)  # [A,A]
        gwmr = (gwm * envf[..., None]).reshape(a * a, f)
        gb2_ref[0] += gwmr.sum(axis=0).astype(gb2_ref.dtype)
        gw2_ref[...] += _dot(h.T, gwmr).astype(gw2_ref.dtype)
        gh = _dot(gwmr, w2.T)
        gz1 = gh * s
        gb1_ref[0] += gz1.sum(axis=0).astype(gb1_ref.dtype)
        gw1_ref[...] += _dot(flat.T, gz1).astype(gw1_ref.dtype)
        rpw = _dot(flatp, w1)                              # [P,F]
        g_dist = (gz1 * rpw).sum(axis=-1).reshape(a, a)
        gd_ref[g] = (g_dist + g_env * envp_ref[g].astype(F32)).astype(gd_ref.dtype)


def _dual_fwd_kernel(rbf_ref, rbfd_ref, envf_ref, envfd_ref, xin_ref, xind_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref,
                     msg_ref, msgd_ref, *, bm):
    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r).astype(F32)
        flatd = rbfd_ref[g].reshape(a * a, r).astype(F32)
        w1, w2 = w1_ref[:], w2_ref[:]
        z1, s, h, wmr = _filter(flat, w1, b1_ref[0], w2, b2_ref[0])
        f = wmr.shape[-1]
        z1d = _dot(flatd, w1)
        hd = s * z1d
        wmrd = _dot(hd, w2)
        envf = envf_ref[g].astype(F32)[..., None]
        envfd = envfd_ref[g].astype(F32)[..., None]
        wmr3 = wmr.reshape(a, a, f)
        wm = wmr3 * envf
        wmd = wmrd.reshape(a, a, f) * envf + wmr3 * envfd
        xin = xin_ref[g].astype(F32)
        xind = xind_ref[g].astype(F32)
        msg_ref[g] = (wm * xin[None]).sum(axis=1).astype(msg_ref.dtype)
        msgd_ref[g] = (
            (wmd * xin[None]).sum(axis=1) + (wm * xind[None]).sum(axis=1)
        ).astype(msgd_ref.dtype)


def _dual_bwd_kernel(rbf_ref, rbfd_ref, envf_ref, envfd_ref, xin_ref, xind_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, gmsg_ref, gmsgd_ref,
                     gxin_ref, gxind_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref,
                     *, bm):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw1_ref[...] = jnp.zeros_like(gw1_ref)
        gb1_ref[...] = jnp.zeros_like(gb1_ref)
        gw2_ref[...] = jnp.zeros_like(gw2_ref)
        gb2_ref[...] = jnp.zeros_like(gb2_ref)

    for g in range(bm):
        rbf = rbf_ref[g]
        a, _, r = rbf.shape
        flat = rbf.reshape(a * a, r).astype(F32)
        flatd = rbfd_ref[g].reshape(a * a, r).astype(F32)
        w1, w2 = w1_ref[:], w2_ref[:]
        z1, s, h, wmr = _filter(flat, w1, b1_ref[0], w2, b2_ref[0])
        f = wmr.shape[-1]
        z1d = _dot(flatd, w1)
        hd = s * z1d
        wmrd = _dot(hd, w2)
        envf = envf_ref[g].astype(F32)[..., None]
        envfd = envfd_ref[g].astype(F32)[..., None]
        wmr3 = wmr.reshape(a, a, f)
        wmrd3 = wmrd.reshape(a, a, f)
        wm = wmr3 * envf
        wmd = wmrd3 * envf + wmr3 * envfd
        xin = xin_ref[g].astype(F32)
        xind = xind_ref[g].astype(F32)
        gmsg = gmsg_ref[g].astype(F32)
        gmsgd = gmsgd_ref[g].astype(F32)

        # node cotangents
        gxin_ref[g] = (
            (wm * gmsg[:, None, :]).sum(axis=0)
            + (wmd * gmsgd[:, None, :]).sum(axis=0)
        ).astype(gxin_ref.dtype)
        gxind_ref[g] = (wm * gmsgd[:, None, :]).sum(axis=0).astype(gxind_ref.dtype)

        # pair-level cotangents (VMEM only)
        gwm = gmsg[:, None, :] * xin[None] + gmsgd[:, None, :] * xind[None]
        gwmd = gmsgd[:, None, :] * xin[None]
        cot_wmr = (gwm * envf + gwmd * envfd).reshape(a * a, f)
        cot_wmrd = (gwmd * envf).reshape(a * a, f)
        gb2_ref[0] += cot_wmr.sum(axis=0).astype(gb2_ref.dtype)
        gw2_ref[...] += (_dot(h.T, cot_wmr) + _dot(hd.T, cot_wmrd)).astype(gw2_ref.dtype)
        gh = _dot(cot_wmr, w2.T)
        ghd = _dot(cot_wmrd, w2.T)
        # hd = s(z1)·z1d ⇒ ∂hd/∂z1 = s'(z1)·z1d with s' = s(1-s)
        gz1 = gh * s + ghd * (s * (1.0 - s) * z1d)
        gz1d = ghd * s
        gb1_ref[0] += gz1.sum(axis=0).astype(gb1_ref.dtype)
        gw1_ref[...] += (_dot(flat.T, gz1) + _dot(flatd.T, gz1d)).astype(gw1_ref.dtype)


# ------------------------------------------------------------ pallas_call ----


def _compiler_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_bm(b: int, prefer=(4, 2, 1)) -> int:
    for bm in prefer:
        if b % bm == 0:
            return bm
    return 1


def _pair_spec(bm, a, r):
    return pl.BlockSpec((bm, a, a, r), lambda i: (i, 0, 0, 0))


def _env_spec(bm, a):
    return pl.BlockSpec((bm, a, a), lambda i: (i, 0, 0))


def _node_spec(bm, a, f):
    return pl.BlockSpec((bm, a, f), lambda i: (i, 0, 0))


def _w_specs(r, f):
    return [
        pl.BlockSpec((r, f), lambda i: (0, 0)),
        pl.BlockSpec((1, f), lambda i: (0, 0)),
        pl.BlockSpec((f, f), lambda i: (0, 0)),
        pl.BlockSpec((1, f), lambda i: (0, 0)),
    ]


def _run_fwd(rbf, envf, xin, w1, b1, w2, b2, *, bm, interpret):
    b, a, _, r = rbf.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bm=bm),
        grid=(b // bm,),
        in_specs=[_pair_spec(bm, a, r), _env_spec(bm, a), _node_spec(bm, a, f),
                  *_w_specs(r, f)],
        out_specs=_node_spec(bm, a, f),
        out_shape=jax.ShapeDtypeStruct((b, a, f), rbf.dtype),
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("fwd", b, a, r, f), bytes_accessed=0,
            transcendentals=b * a * a * f,
        ),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rbf, envf, xin, w1, b1, w2, b2)


def _run_bwd(rbf, rbfp, envf, envp, xin, w1, b1, w2, b2, gmsg, *, bm, interpret):
    b, a, _, r = rbf.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, bm=bm),
        grid=(b // bm,),
        in_specs=[_pair_spec(bm, a, r), _pair_spec(bm, a, r),
                  _env_spec(bm, a), _env_spec(bm, a), _node_spec(bm, a, f),
                  *_w_specs(r, f), _node_spec(bm, a, f)],
        out_specs=[_env_spec(bm, a), _node_spec(bm, a, f), *_w_specs(r, f)],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, a), F32),
            jax.ShapeDtypeStruct((b, a, f), F32),
            jax.ShapeDtypeStruct((r, f), F32),
            jax.ShapeDtypeStruct((1, f), F32),
            jax.ShapeDtypeStruct((f, f), F32),
            jax.ShapeDtypeStruct((1, f), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("bwd", b, a, r, f), bytes_accessed=0,
            transcendentals=b * a * a * f,
        ),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rbf, rbfp, envf, envp, xin, w1, b1, w2, b2, gmsg)


def _run_dual_fwd(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2,
                  *, bm, interpret):
    b, a, _, r = rbf.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_dual_fwd_kernel, bm=bm),
        grid=(b // bm,),
        in_specs=[_pair_spec(bm, a, r), _pair_spec(bm, a, r),
                  _env_spec(bm, a), _env_spec(bm, a),
                  _node_spec(bm, a, f), _node_spec(bm, a, f), *_w_specs(r, f)],
        out_specs=[_node_spec(bm, a, f), _node_spec(bm, a, f)],
        out_shape=[jax.ShapeDtypeStruct((b, a, f), rbf.dtype),
                   jax.ShapeDtypeStruct((b, a, f), rbf.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("dual_fwd", b, a, r, f), bytes_accessed=0,
            transcendentals=b * a * a * f,
        ),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2)


def _run_dual_bwd(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2,
                  gmsg, gmsgd, *, bm, interpret):
    b, a, _, r = rbf.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_dual_bwd_kernel, bm=bm),
        grid=(b // bm,),
        in_specs=[_pair_spec(bm, a, r), _pair_spec(bm, a, r),
                  _env_spec(bm, a), _env_spec(bm, a),
                  _node_spec(bm, a, f), _node_spec(bm, a, f), *_w_specs(r, f),
                  _node_spec(bm, a, f), _node_spec(bm, a, f)],
        out_specs=[_node_spec(bm, a, f), _node_spec(bm, a, f), *_w_specs(r, f)],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, f), F32),
            jax.ShapeDtypeStruct((b, a, f), F32),
            jax.ShapeDtypeStruct((r, f), F32),
            jax.ShapeDtypeStruct((1, f), F32),
            jax.ShapeDtypeStruct((f, f), F32),
            jax.ShapeDtypeStruct((1, f), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops("dual_bwd", b, a, r, f), bytes_accessed=0,
            transcendentals=b * a * a * f,
        ),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2, gmsg, gmsgd)


# -------------------------------------------------------------- public ops ----


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def schnet_message(dist, rbf, rbfp, envf, envp, xin, w1, b1, w2, b2,
                   interpret=False):
    """First-order fused cfconv (inference / forces / relaxation).

    dist [B,A,A] routes AD only: the VJP emits the scalar chain through the
    radial basis AND the cutoff envelope as g_dist (requires rbf == f(dist),
    rbfp == f'(dist), envf == premasked env(dist), envp == env'(dist));
    rbf/rbfp/envf/envp get zero cotangents. Returns msg [B,A,F].
    """
    del dist, rbfp, envp
    return _run_fwd(rbf, envf, xin, w1, b1, w2, b2,
                    bm=_pick_bm(rbf.shape[0]), interpret=interpret)


def _sm_fwd(dist, rbf, rbfp, envf, envp, xin, w1, b1, w2, b2, interpret):
    out = schnet_message(dist, rbf, rbfp, envf, envp, xin, w1, b1, w2, b2,
                         interpret)
    return out, (rbf, rbfp, envf, envp, xin, w1, b1, w2, b2)


def _sm_bwd(interpret, res, gmsg):
    rbf, rbfp, envf, envp, xin, w1, b1, w2, b2 = res
    g_dist, gxin, gw1, gb1, gw2, gb2 = _run_bwd(
        rbf, rbfp, envf, envp, xin, w1, b1, w2, b2, gmsg.astype(rbf.dtype),
        bm=_pick_bm(rbf.shape[0], (2, 1)), interpret=interpret,
    )
    zp = jnp.zeros_like(rbf)
    ze = jnp.zeros_like(envf)
    return (g_dist.astype(F32), zp, zp, ze, ze, gxin.astype(xin.dtype),
            gw1.astype(w1.dtype), gb1.astype(b1.dtype),
            gw2.astype(w2.dtype), gb2.astype(b2.dtype))


schnet_message.defvjp(_sm_fwd, _sm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def schnet_dual(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2,
                interpret=False):
    """Dual-number fused cfconv (surrogate parameter pass only: the VJP
    emits node/θ cotangents and ZEROS for all pair-level inputs)."""
    return _run_dual_fwd(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2,
                         bm=_pick_bm(rbf.shape[0], (2, 1)), interpret=interpret)


def _sd_fwd(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2, interpret):
    out = schnet_dual(rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2,
                      interpret)
    return out, (rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2)


def _sd_bwd(interpret, res, cots):
    rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2 = res
    gmsg, gmsgd = (c.astype(rbf.dtype) for c in cots)
    gxin, gxind, gw1, gb1, gw2, gb2 = _run_dual_bwd(
        rbf, rbfd, envf, envfd, xin, xind, w1, b1, w2, b2, gmsg, gmsgd,
        bm=_pick_bm(rbf.shape[0], (1,)), interpret=interpret,
    )
    zp = jnp.zeros_like(rbf)
    ze = jnp.zeros_like(envf)
    return (zp, zp, ze, ze, gxin.astype(xin.dtype), gxind.astype(xin.dtype),
            gw1.astype(w1.dtype), gb1.astype(b1.dtype),
            gw2.astype(w2.dtype), gb2.astype(b2.dtype))


schnet_dual.defvjp(_sd_fwd, _sd_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(10,))
def schnet_message_train(dist, rbf, rbfp, envf, envp, xin, w1, b1, w2, b2,
                         interpret=False):
    """The cfconv op for the surrogate training pass: under jax.jvp wrt
    positions it expands to the fused dual kernel, whose custom VJP makes
    the resulting graph reverse-differentiable wrt parameters. Do not
    reverse-differentiate this op directly."""
    del dist, rbfp, envp
    return _run_fwd(rbf, envf, xin, w1, b1, w2, b2,
                    bm=_pick_bm(rbf.shape[0]), interpret=interpret)


def _smt_jvp(interpret, primals, tangents):
    dist, rbf, rbfp, envf, envp, xin, w1, b1, w2, b2 = primals
    _, trbf, _, tenvf, _, txin, tw1, tb1, tw2, tb2 = tangents

    def is_zero(t):
        return isinstance(t, SymbolicZero) or type(t).__name__ == "Zero"

    def inst(t, like):
        return jnp.zeros_like(like) if is_zero(t) else t

    if not all(is_zero(t) for t in (tw1, tb1, tw2, tb2)):
        # parameter tangents are outside this kernel's contract
        f = lambda rbf, envf, xin, w1, b1, w2, b2: schnet_message_reference(
            rbf, envf, xin, w1, b1, w2, b2)
        return jax.jvp(
            f, (rbf, envf, xin, w1, b1, w2, b2),
            (inst(trbf, rbf), inst(tenvf, envf), inst(txin, xin),
             inst(tw1, w1), inst(tb1, b1), inst(tw2, w2), inst(tb2, b2)),
        )
    msg, msgd = schnet_dual(
        rbf, inst(trbf, rbf), envf, inst(tenvf, envf), xin, inst(txin, xin),
        w1, b1, w2, b2, interpret,
    )
    return msg, msgd


schnet_message_train.defjvp(_smt_jvp, symbolic_zeros=True)


def schnet_message_reference(rbf, envf, xin, w1, b1, w2, b2):
    """Plain-XLA reference of the kernel semantics (dense-pair layout)."""
    z1 = jnp.einsum("bijr,rf->bijf", rbf.astype(F32), w1) + b1[0]
    h = _ssp(z1)
    wmr = jnp.einsum("bijf,fg->bijg", h, w2) + b2[0]
    wm = wmr * envf.astype(F32)[..., None]
    return (wm * xin.astype(F32)[:, None]).sum(axis=2).astype(rbf.dtype)
