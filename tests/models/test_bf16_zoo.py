"""bfloat16 compute path across the energy/forces zoo.

Hamiltonian models (QHNet/PhiSNet) deliberately stay fp32: their targets
are 1e-4 Eh matrix elements / 1e-5 overlaps — below bfloat16's ~3-digit
mantissa — so a bf16 compute path would be a silent accuracy loss, not an
optimization (the reference trains them fp32 for the same reason).
"""

import jax
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.models.base import forward

pytestmark = pytest.mark.model

SMALL = {
    "schnet": dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=7),
    "painn": dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=7, remat=False),
    "dimenetpp": dict(hidden=16, num_blocks=1, int_emb_size=8, basis_emb_size=4,
                      out_emb_channels=16, num_spherical=3, num_radial=4,
                      max_neighbors=7, node_latent_dim=8, remat=False),
    "graphormer3d": dict(blocks=1, layers=1, embed_dim=16, ffn_embed_dim=16,
                         attention_heads=2, num_kernel=8, remat=False),
    "gemnet_oc": dict(num_blocks=1, emb_size_atom=16, emb_size_edge=32,
                      emb_size_trip_in=8, emb_size_trip_out=8, emb_size_quad_in=8,
                      emb_size_quad_out=8, emb_size_rbf=8, emb_size_cbf=8,
                      emb_size_sbf=8, num_radial=16, num_spherical=4,
                      num_spherical_quad=3, max_neighbors=7, max_neighbors_qint=4,
                      remat=False),
    "escn": dict(num_layers=2, l_max=2, m_max=1, sphere_channels=8, hidden=16,
                 edge_channels=8, max_neighbors=7, num_sphere_samples=16,
                 remat=False),
    "equiformer_v2": dict(num_layers=1, sphere_channels=8, attn_alpha_channels=4,
                          num_heads=2, attn_value_channels=4,
                          ffn_hidden_channels=8, l_max=2, m_max=1,
                          edge_channels=8, num_distance_basis=8,
                          max_neighbors=7, remat=False),
}


def mk_batch(rng, B=3, A=8):
    z = rng.integers(1, 9, (B, A)).astype(np.int32)
    pos = rng.uniform(-3, 3, (B, A, 3)).astype(np.float32)
    return MolBatch(
        z=z, pos=pos, node_mask=np.ones((B, A), bool),
        graph_mask=np.ones((B,), bool), energy=None, forces=None,
        mol_id=np.arange(B, dtype=np.int32),
    )


@pytest.mark.parametrize("name", sorted(SMALL))
def test_bf16_forward_tracks_f32(name, rng):
    batch = mk_batch(rng)
    kw = SMALL[name]
    m32 = create_model(name, compute_dtype="float32", **kw)
    m16 = create_model(name, compute_dtype="bfloat16", **kw)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), batch)
    out32 = forward(m32, params, batch)
    out16 = forward(m16, params, batch)
    e32, e16 = np.asarray(out32["energy"]), np.asarray(out16["energy"])
    assert np.all(np.isfinite(e16))
    scale = max(np.abs(e32).max(), 1e-3)
    assert np.max(np.abs(e16 - e32)) / scale < 0.05, (e32, e16)
    if "forces" in out32:
        f16 = np.asarray(out16["forces"])
        assert np.all(np.isfinite(f16))
