"""Parity: DimeNet++ gather_mode="onehot" ≡ "take" on the compact layout.

"onehot" replaces the compact layout's agg gather (take_along_axis) and
the reverse-edge flat gather with matmuls against one shared [B,A,K,A]
0/1 table, so no TPU scatter appears at any AD order (the bench config,
bench.py ZOO["dimenetpp"]). Both express the same index map, so a single
init must produce identical energies, forces, and parameter gradients —
including through the second-order force-loss backward that the scatter
elimination exists for.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.dimenetpp import DimeNetPP


def _batch(rng, b=2, a=14):
    pos = rng.normal(size=(b, a, 3)).astype(np.float32) * 2.2
    z = rng.integers(1, 9, size=(b, a)).astype(np.int32)
    n_atoms = np.array([a, a - 4])
    mask = np.arange(a)[None, :] < n_atoms[:, None]
    z = np.where(mask, z, 0)
    forces = rng.normal(size=(b, a, 3)).astype(np.float32) * mask[..., None]
    return MolBatch(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        node_mask=jnp.asarray(mask),
        graph_mask=jnp.ones(b, bool),
        energy=jnp.asarray(rng.normal(size=b).astype(np.float32)),
        forces=jnp.asarray(forces),
        mol_id=jnp.arange(b),
    )


@pytest.mark.parametrize("max_neighbors", [6, 32])
def test_onehot_matches_take(max_neighbors):
    # max_neighbors=6 < A exercises the strict top-k cap + missing reverse
    # edges (rev_valid zeroing == the one-hot scatter-matmul's implicit
    # zeros); 32 >= A is the no-cap regime.
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    kw = dict(
        hidden=32, num_blocks=2, int_emb_size=16, basis_emb_size=4,
        out_emb_channels=24, num_spherical=4, num_radial=3,
        max_neighbors=max_neighbors, remat=False, compact=True,
    )
    take = DimeNetPP(**kw, gather_mode="take")
    oneh = DimeNetPP(**kw, gather_mode="onehot")
    params = take.init(jax.random.PRNGKey(0), batch)

    def energies(model, pos):
        return model.apply(params, batch.replace(pos=pos))["energy"]

    et = energies(take, batch.pos)
    eo = energies(oneh, batch.pos)
    np.testing.assert_allclose(np.asarray(et), np.asarray(eo), rtol=1e-5)

    # forces (one reverse pass through the gathers)
    ft = jax.grad(lambda p: energies(take, p).sum())(batch.pos)
    fo = jax.grad(lambda p: energies(oneh, p).sum())(batch.pos)
    np.testing.assert_allclose(np.asarray(ft), np.asarray(fo),
                               rtol=1e-4, atol=1e-6)

    # parameter grads of an energy+force loss (reverse-over-reverse —
    # the AD order where "take" produces scatter-adds and "onehot" stays
    # matmul-only)
    def loss(model, params_):
        def e(pos):
            return model.apply(params_, batch.replace(pos=pos))["energy"].sum()

        en, neg_f = jax.value_and_grad(e)(batch.pos)
        f_err = jnp.abs((-neg_f) - batch.forces).mean()
        return f_err + jnp.abs(en - batch.energy.sum()) * 1e-3

    gt = jax.grad(lambda p: loss(take, p))(params)
    go = jax.grad(lambda p: loss(oneh, p))(params)
    flat_t, _ = ravel_pytree(gt)
    flat_o, _ = ravel_pytree(go)
    np.testing.assert_allclose(np.asarray(flat_t), np.asarray(flat_o),
                               rtol=5e-4, atol=1e-6)
