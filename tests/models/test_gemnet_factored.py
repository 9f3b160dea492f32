"""Factorized GemNet-OC triplet path == explicit circular-basis lattice.

The production TripletInteraction runs the Legendre-addition-theorem
factorization (models/gemnet_oc.py); the explicit [B,A,K,M,S] lattice
survives only as the ScaleFactor-fitting branch (mutable "scale_stats").
Applying the model WITH that collection mutable therefore runs the old
explicit math — this pins the two paths against each other, including the
k == i back-triplet exclusion, padded atoms, and non-unit fitted scales.
"""

import jax
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model

pytestmark = pytest.mark.model

KW = dict(
    num_blocks=2, emb_size_atom=16, emb_size_edge=32, emb_size_trip_in=8,
    emb_size_trip_out=8, emb_size_quad_in=8, emb_size_quad_out=8,
    emb_size_rbf=8, emb_size_cbf=8, emb_size_sbf=8, num_radial=16,
    num_spherical=4, num_spherical_quad=3, max_neighbors=7,
    max_neighbors_qint=4, remat=False,
)


def _batch(rng, B=4, A=9, pad=True):
    z = rng.integers(1, 9, (B, A)).astype(np.int32)
    pos = rng.uniform(-3, 3, (B, A, 3)).astype(np.float32)
    mask = np.ones((B, A), bool)
    if pad:
        mask[0, -3:] = False
        mask[1, -1:] = False
        z[~mask] = 0
    return MolBatch(
        z=z, pos=pos, node_mask=mask,
        graph_mask=np.ones((B,), bool), energy=np.zeros(B, np.float32),
        forces=np.zeros((B, A, 3), np.float32), mol_id=np.arange(B, dtype=np.int32),
    )


def test_factored_triplet_matches_explicit(rng):
    model = create_model("gemnet_oc", **KW)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    # non-unit scales so s_basis/scale_cbf_sum placement is exercised too
    variables = {
        **variables,
        "scales": jax.tree_util.tree_map(lambda s: s * 1.37, variables["scales"]),
    }

    out_fac = model.apply(variables, batch)
    out_exp, _ = model.apply(variables, batch, mutable=["scale_stats"])

    e_f, e_e = np.asarray(out_fac["energy"]), np.asarray(out_exp["energy"])
    f_f, f_e = np.asarray(out_fac["forces"]), np.asarray(out_exp["forces"])
    np.testing.assert_allclose(e_f, e_e, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(f_f, f_e, rtol=2e-4, atol=2e-5)
    # and the padded slots stay exactly zero
    mask = np.asarray(batch.node_mask)
    assert np.all(f_f[~mask] == 0.0)
