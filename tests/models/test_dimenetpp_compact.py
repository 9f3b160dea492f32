"""Parity: DimeNet++ K-compacted edge layout ≡ dense all-pairs layout.

The two layouts share one parameter tree (every per-edge Dense is
shape-blind to the edge axis), so a single init must evaluate identically
through both. Covers energies AND derivative forces (the compact path adds
take_along/reverse-edge gathers whose VJPs are scatter-adds — this pins
their correctness through one reverse pass).
"""

import jax
import jax.numpy as jnp
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
    return MolBatch(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        node_mask=jnp.asarray(mask),
        graph_mask=jnp.ones(b, bool),
        energy=jnp.zeros(b),
        forces=jnp.zeros((b, a, 3)),
        mol_id=jnp.arange(b),
    )


@pytest.mark.parametrize("max_neighbors", [6, 32])
def test_compact_matches_dense(max_neighbors):
    # max_neighbors=6 < A exercises the strict top-k cap + reverse-edge
    # asymmetry (j in topk(i) but i not in topk(j)); 32 >= A is the
    # no-cap regime where every in-cutoff edge survives.
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    kw = dict(
        hidden=32, num_blocks=2, int_emb_size=16, basis_emb_size=4,
        out_emb_channels=24, num_spherical=4, num_radial=3,
        max_neighbors=max_neighbors, remat=False,
    )
    dense = DimeNetPP(**kw, compact=False)
    comp = DimeNetPP(**kw, compact=True)
    params = comp.init(jax.random.PRNGKey(0), batch)

    def e_comp(pos):
        return comp.apply(params, batch.replace(pos=pos))["energy"].sum()

    def e_dense(pos):
        return dense.apply(params, batch.replace(pos=pos))["energy"].sum()

    ec, fc = jax.value_and_grad(e_comp)(batch.pos)
    ed, fd = jax.value_and_grad(e_dense)(batch.pos)
    np.testing.assert_allclose(float(ec), float(ed), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fd),
                               rtol=2e-4, atol=2e-5)
