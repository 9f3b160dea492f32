"""Fused PaiNN kernel set vs the XLA reference (interpret mode on CPU).

Covers the three ops and every gradient path the training/relaxation
engines rely on:
  * forward parity (kernel A),
  * first-order grads incl. the folded g_dist chain (kernel B),
  * dual-lane forward = jax.jvp of the reference (kernel C),
  * parameter-side grads of a dual-lane scalar (kernel D),
  * painn_message_train's custom_jvp wiring (symbolic-zero w tangent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.ops.pallas.painn_fused import (
    painn_dual,
    painn_message,
    painn_message_reference,
    painn_message_train,
)

B, A, R, F = 4, 8, 12, 16
F3 = 3 * F


@pytest.fixture()
def data(rng):
    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.3

    dist = jnp.abs(mk(B, A, A)) + 0.5
    mask = jnp.asarray(rng.random((B, A, A)) > 0.3).astype(jnp.float32)
    phi, v = mk(B, A, F3), mk(B, A, F3)
    unit_t = mk(B, A, 3, A)
    w = mk(R, F3)
    return dist, mask, phi, v, unit_t, w


def basis(dist, mask):
    """A stand-in radial basis chain f(dist)·mask with nonzero derivative."""
    mu = jnp.linspace(0.5, 3.0, R)
    g = jnp.exp(-((dist[..., None] - mu) ** 2))
    return g * mask[..., None]


def test_forward_matches_reference(data):
    dist, mask, phi, v, unit_t, w = data
    rbf = basis(dist, mask)
    rbfp = jax.jvp(lambda d: basis(d, mask), (dist,), (jnp.ones_like(dist),))[1]
    ds, dv = painn_message(dist, rbf, rbfp, phi, v, unit_t, w, True)
    ds_r, dv_r = painn_message_reference(rbf, phi, v, unit_t, w)
    np.testing.assert_allclose(ds, ds_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dv, dv_r, rtol=2e-5, atol=2e-5)


def test_first_order_grads(data):
    """Kernel B: grads wrt dist (through the basis), phi, v, unit_t, w."""
    dist, mask, phi, v, unit_t, w = data
    seed_s = jnp.asarray(np.random.default_rng(1).normal(size=(B, A, F)), jnp.float32)
    seed_v = jnp.asarray(np.random.default_rng(2).normal(size=(B, A, F3)), jnp.float32)

    def loss_pallas(dist, phi, v, unit_t, w):
        rbf = jax.lax.stop_gradient(basis(dist, mask))
        rbfp = jax.lax.stop_gradient(
            jax.jvp(lambda d: basis(d, mask), (dist,), (jnp.ones_like(dist),))[1]
        )
        ds, dv = painn_message(dist, rbf, rbfp, phi, v, unit_t, w, True)
        return (ds * seed_s).sum() + (dv * seed_v).sum()

    def loss_ref(dist, phi, v, unit_t, w):
        ds, dv = painn_message_reference(basis(dist, mask), phi, v, unit_t, w)
        return (ds * seed_s).sum() + (dv * seed_v).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(dist, phi, v, unit_t, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(dist, phi, v, unit_t, w)
    for a, b, name in zip(gp, gr, ["dist", "phi", "v", "unit_t", "w"]):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5, err_msg=name)


def test_dual_forward_matches_jvp(data, rng):
    dist, mask, phi, v, unit_t, w = data
    rbf = basis(dist, mask)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.3

    rbfd, phid, vd, unitd_t = mk(B, A, A, R), mk(B, A, F3), mk(B, A, F3), mk(B, A, 3, A)
    ds, dv, dsd, dvd = painn_dual(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, True)
    (ds_r, dv_r), (dsd_r, dvd_r) = jax.jvp(
        lambda rbf, phi, v, ut: painn_message_reference(rbf, phi, v, ut, w),
        (rbf, phi, v, unit_t), (rbfd, phid, vd, unitd_t),
    )
    np.testing.assert_allclose(ds, ds_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dv, dv_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dsd, dsd_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dvd, dvd_r, rtol=2e-5, atol=2e-5)


def test_dual_backward_param_grads(data, rng):
    """Kernel D: grads wrt (phi, phid, v, vd, w) of a scalar over all four
    dual outputs match AD through the jvp of the reference."""
    dist, mask, phi, v, unit_t, w = data
    rbf = basis(dist, mask)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.3

    rbfd, phid, vd, unitd_t = mk(B, A, A, R), mk(B, A, F3), mk(B, A, F3), mk(B, A, 3, A)
    seeds = [mk(B, A, F), mk(B, A, F3), mk(B, A, F), mk(B, A, F3)]

    def scal(outs):
        return sum((o * s).sum() for o, s in zip(outs, seeds))

    def loss_pallas(phi, phid, v, vd, w):
        return scal(painn_dual(rbf, rbfd, phi, phid, v, vd, unit_t, unitd_t, w, True))

    def loss_ref(phi, phid, v, vd, w):
        outs = jax.jvp(
            lambda rbf, phi, v, ut, w: painn_message_reference(rbf, phi, v, ut, w),
            (rbf, phi, v, unit_t, w), (rbfd, phid, vd, unitd_t, jnp.zeros_like(w)),
        )
        return scal(outs[0] + outs[1])

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(phi, phid, v, vd, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(phi, phid, v, vd, w)
    for a, b, name in zip(gp, gr, ["phi", "phid", "v", "vd", "w"]):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5, err_msg=name)


def test_train_op_surrogate_pattern(data):
    """painn_message_train: jvp wrt dist-chain inputs with zero w-tangent
    routes through the dual kernel; grads of the jvp wrt (phi, v, w) match
    pure-XLA second-order AD."""
    dist, mask, phi, v, unit_t, w = data
    wdir = jnp.asarray(np.random.default_rng(3).normal(size=dist.shape), jnp.float32)

    def t_pallas(phi, v, w):
        def fwd(d):
            rbf = jax.lax.stop_gradient(basis(d, mask))
            ds, dv = painn_message_train(d, rbf, rbf, phi, v, unit_t, w, True)
            return (ds.sum() + dv.sum())

        # tangent wrt dist only — but rbf is stop_grad'd, so seed the rbf
        # tangent through the op by differentiating the basis explicitly:
        def fwd2(d):
            rbf = basis(d, mask)
            ds, dv = painn_message_train(d, rbf, rbf, phi, v, unit_t, w, True)
            return ds.sum() + dv.sum()

        _, t = jax.jvp(fwd2, (dist,), (wdir,))
        return t

    def t_ref(phi, v, w):
        def fwd(d):
            ds, dv = painn_message_reference(basis(d, mask), phi, v, unit_t, w)
            return ds.sum() + dv.sum()

        _, t = jax.jvp(fwd, (dist,), (wdir,))
        return t

    np.testing.assert_allclose(t_pallas(phi, v, w), t_ref(phi, v, w), rtol=1e-4)
    gp = jax.grad(t_pallas, argnums=(0, 1, 2))(phi, v, w)
    gr = jax.grad(t_ref, argnums=(0, 1, 2))(phi, v, w)
    for a, b, name in zip(gp, gr, ["phi", "v", "w"]):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5, err_msg=name)


def test_painn_model_fused_matches_off(rng):
    """Full PaiNN with use_pallas='fused': same energies AND forces."""
    from nabladft_tpu.data.batch import MolBatch
    from nabladft_tpu.models import create_model

    Bm, Am = 3, 10
    z = rng.integers(1, 9, (Bm, Am)).astype(np.int32)
    pos = rng.uniform(-3, 3, (Bm, Am, 3)).astype(np.float32)
    node_mask = np.ones((Bm, Am), bool)
    node_mask[2, 7:] = False
    batch = MolBatch(
        z=z, pos=pos, node_mask=node_mask,
        graph_mask=np.ones((Bm,), bool), energy=None, forces=None,
        mol_id=np.arange(Bm, dtype=np.int32),
    )
    kw = dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=7)
    m_x = create_model("painn", **kw, use_pallas="off", remat=False)
    m_p = create_model("painn", **kw, use_pallas="fused")
    params = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)

    def ef(model):
        def e(pos):
            return model.apply(params, batch.replace(pos=pos))["energy"].sum()
        forces = -jax.grad(e)(batch.pos)
        return model.apply(params, batch)["energy"], forces

    e_x, f_x = ef(m_x)
    e_p, f_p = ef(m_p)
    np.testing.assert_allclose(e_p, e_x, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(f_p, f_x, rtol=2e-3, atol=2e-4)
