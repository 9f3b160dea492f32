"""Fused PaiNN message kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.ops.pallas.painn_message import (
    painn_message_fused,
    painn_message_reference,
)

pytestmark = pytest.mark.model


def make_inputs(rng, b=2, a=12, r=16, f=8):
    rbf = rng.normal(size=(b, a, a, r)).astype(np.float32)
    phi = rng.normal(size=(b, a, 3 * f)).astype(np.float32)
    v = rng.normal(size=(b, a, 3 * f)).astype(np.float32)
    unit = rng.normal(size=(b, a, a, 3)).astype(np.float32)
    mask = (rng.uniform(size=(b, a, a)) > 0.3).astype(np.float32)
    w = (rng.normal(size=(r, 3 * f)) * 0.1).astype(np.float32)
    bias = rng.normal(size=(3 * f,)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (rbf, phi, v, unit, mask, w, bias))


def test_forward_matches_reference(rng):
    args = make_inputs(rng)
    ds_k, dv_k = painn_message_fused(*args, True)
    ds_r, dv_r = painn_message_reference(*args)
    np.testing.assert_allclose(np.asarray(ds_k), np.asarray(ds_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), rtol=1e-4, atol=1e-4)


def test_backward_matches_reference(rng):
    args = make_inputs(rng)

    def loss_k(rbf, phi, v, unit, w, bias):
        ds, dv = painn_message_fused(rbf, phi, v, unit, args[4], w, bias, True)
        return jnp.sum(jnp.sin(ds)) + jnp.sum(dv * dv)

    def loss_r(rbf, phi, v, unit, w, bias):
        ds, dv = painn_message_reference(rbf, phi, v, unit, args[4], w, bias)
        return jnp.sum(jnp.sin(ds)) + jnp.sum(dv * dv)

    diff_args = (args[0], args[1], args[2], args[3], args[5], args[6])
    g_k = jax.grad(loss_k, argnums=tuple(range(6)))(*diff_args)
    g_r = jax.grad(loss_r, argnums=tuple(range(6)))(*diff_args)
    names = ["rbf", "phi", "v", "unit", "w", "bias"]
    for n, a_, b_ in zip(names, g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-3, atol=1e-4, err_msg=n
        )


def test_padding_tile_sizes(rng):
    """A not a multiple of the receiver tile (8)."""
    args = make_inputs(rng, a=13)
    ds_k, dv_k = painn_message_fused(*args, True)
    ds_r, dv_r = painn_message_reference(*args)
    np.testing.assert_allclose(np.asarray(ds_k), np.asarray(ds_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), rtol=1e-4, atol=1e-4)


def test_painn_model_pallas_path_matches_xla(rng):
    """Full PaiNN with use_pallas=True: same energies AND forces."""
    import sys

    sys.path.insert(0, "tests")
    from models.test_energy_models import make_batch

    from nabladft_tpu.models import create_model, forward

    batch = make_batch(np.random.default_rng(0))
    kw = dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=11)
    m_x = create_model("painn", **kw, use_pallas="off", remat=False)
    m_p = create_model("painn", **kw, use_pallas="full")
    params = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)
    out_x = forward(m_x, params, batch)
    out_p = forward(m_p, params, batch)
    np.testing.assert_allclose(
        np.asarray(out_x["energy"]), np.asarray(out_p["energy"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_x["forces"]), np.asarray(out_p["forces"]), rtol=1e-3, atol=1e-4
    )
