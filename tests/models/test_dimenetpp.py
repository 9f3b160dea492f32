"""Dense-triplet DimeNet++: physics sanity + second-order differentiability.

The dense all-pairs formulation has no gathers; these tests pin rotation/
translation invariance of the energy and that reverse-over-reverse force
training gradients are finite and nonzero (numeric parity with the
reference semantics is pinned by the converter golden,
tests/models/test_pretrained_converters.py::test_dimenetpp_converter_golden).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model

pytestmark = pytest.mark.model

KW = dict(hidden=16, num_blocks=2, int_emb_size=8, basis_emb_size=4,
          out_emb_channels=16, num_spherical=3, num_radial=4,
          max_neighbors=6, num_output_layers=1, node_latent_dim=8,
          cutoff=5.0, remat=False)


def _batch(rng, b=2, a=8):
    node_mask = np.ones((b, a), bool)
    node_mask[0, -2:] = False
    return MolBatch(
        z=rng.integers(1, 9, (b, a)).astype(np.int32),
        pos=(rng.normal(size=(b, a, 3)) * 1.5).astype(np.float32),
        node_mask=node_mask,
        graph_mask=np.ones((b,), bool),
        energy=rng.normal(size=(b,)).astype(np.float32),
        forces=rng.normal(size=(b, a, 3)).astype(np.float32)
        * node_mask[..., None],
        mol_id=np.arange(b, dtype=np.int32),
    )


def _rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def test_energy_invariance_forces_equivariance():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    model = create_model("dimenetpp", **KW)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def forces(pos):
        def esum(p):
            return model.apply(params, batch.replace(pos=p))["energy"].sum()

        return -jax.grad(esum)(pos) * batch.node_mask[..., None]

    e = model.apply(params, batch)["energy"]
    f = forces(batch.pos)
    R = _rot(rng)
    shift = np.asarray([1.0, -2.0, 0.5], np.float32)
    pos_rot = batch.pos @ R.T + shift
    e_rot = model.apply(params, batch.replace(pos=pos_rot))["energy"]
    f_rot = forces(jnp.asarray(pos_rot))
    np.testing.assert_allclose(np.asarray(e_rot), np.asarray(e),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_rot), np.asarray(f) @ R.T,
                               rtol=2e-4, atol=2e-5)


def test_second_order_force_gradients_finite():
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    model = create_model("dimenetpp", **KW)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def force_loss(p):
        def esum(pos):
            return model.apply(p, batch.replace(pos=pos))["energy"].sum()

        f = -jax.grad(esum)(batch.pos) * batch.node_mask[..., None]
        return jnp.sum((f - batch.forces) ** 2)

    g = jax.grad(force_loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in leaves)
    assert total > 0.0
