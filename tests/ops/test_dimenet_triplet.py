"""Parity of the fused DimeNet++ triplet kernels vs the XLA lattice path.

Both paths share one parameter layout, so the same tree evaluates in both
modes. Coverage: forward energy, first-order forces (-dE/dpos through the
kernel's custom VJP), and second-order force-training gradients (d/dtheta
of the force loss — reverse-over-reverse through the mutually-recursive
VJP quadruple)."""

import jax
import jax.numpy as jnp
import numpy as np

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model

KW = dict(hidden=16, num_blocks=2, int_emb_size=8, basis_emb_size=4,
          out_emb_channels=16, num_spherical=3, num_radial=4,
          max_neighbors=6, num_output_layers=1, node_latent_dim=8,
          cutoff=5.0, remat=False)


def _make_batch(rng, b=2, a=8):
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


def test_pallas_triplets_match_xla_to_second_order():
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    m_pl = create_model("dimenetpp", **KW, use_pallas=True)
    m_x = create_model("dimenetpp", **KW, use_pallas=False)
    params = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)

    e_pl = m_pl.apply(params, batch)["energy"]
    e_x = m_x.apply(params, batch)["energy"]
    np.testing.assert_allclose(np.asarray(e_pl), np.asarray(e_x),
                               rtol=1e-5, atol=1e-6)

    def forces(model, p, pos):
        def esum(pos):
            out = model.apply(p, batch.replace(pos=pos))
            return jnp.where(batch.graph_mask, out["energy"], 0.0).sum()

        return -jax.grad(esum)(pos) * batch.node_mask[..., None]

    f_pl = forces(m_pl, params, batch.pos)
    f_x = forces(m_x, params, batch.pos)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_x),
                               rtol=2e-4, atol=1e-6)

    # reverse-over-reverse: gradient of a force loss w.r.t. params
    def force_loss(model):
        def fn(p):
            f = forces(model, p, batch.pos)
            return jnp.sum((f - batch.forces) ** 2)

        return fn

    g_pl = jax.grad(force_loss(m_pl))(params)
    g_x = jax.grad(force_loss(m_x))(params)
    leaves_pl = jax.tree_util.tree_leaves(g_pl)
    leaves_x = jax.tree_util.tree_leaves(g_x)
    assert len(leaves_pl) == len(leaves_x)
    for a_, b_ in zip(leaves_pl, leaves_x):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-2, atol=2e-5)
