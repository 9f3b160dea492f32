"""Parity of the fused Pallas EqV2 attention vs the XLA SO2GraphAttention.

Reduced (L=2, M=1) configuration — interpret-mode compile of the full-size
kernel is minutes-long on CPU; the math is L/M-parametric.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model


def _make_batch(rng, b=2, a=8):
    node_mask = np.ones((b, a), bool)
    node_mask[0, -2:] = False
    z = rng.integers(1, 9, (b, a)).astype(np.int32)
    pos = (rng.normal(size=(b, a, 3)) * 1.5).astype(np.float32)
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask,
        graph_mask=np.ones((b,), bool),
        energy=rng.normal(size=(b,)).astype(np.float32),
        forces=rng.normal(size=(b, a, 3)).astype(np.float32)
        * node_mask[..., None],
        mol_id=np.arange(b, dtype=np.int32),
    )


KW = dict(num_layers=1, l_max=2, m_max=1, sphere_channels=8,
          attn_alpha_channels=8, num_heads=2, attn_value_channels=4,
          ffn_hidden_channels=8, cutoff=6.0, max_neighbors=7)


def test_pallas_attention_matches_xla():
    from nabladft_tpu.models.param_convert import eqv2_params

    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    co = KW["num_heads"] * KW["attn_value_channels"]
    m_pl = create_model("equiformer_v2", **KW, use_pallas=True, remat=False)
    m_x = create_model("equiformer_v2", **KW, use_pallas=False, remat=False)
    p_pl = jax.jit(m_pl.init)(jax.random.PRNGKey(0), batch)
    p_x = eqv2_params(p_pl, "xla", KW["l_max"], KW["m_max"], co)

    out_pl = m_pl.apply(p_pl, batch)
    out_x = m_x.apply(p_x, batch)
    np.testing.assert_allclose(
        np.asarray(out_pl["energy"]), np.asarray(out_x["energy"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl["forces"]), np.asarray(out_x["forces"]),
        rtol=2e-3, atol=1e-6,
    )

    def loss(m, p):
        o = m.apply(p, batch)
        return jnp.sum(o["energy"] ** 2) + jnp.sum(o["forces"] ** 2)

    g_pl = jax.grad(lambda p: loss(m_pl, p))(p_pl)
    g_x = jax.grad(lambda p: loss(m_x, p))(p_x)
    ge_pl = np.asarray(g_pl["params"]["sphere_embedding"]["embedding"])
    ge_x = np.asarray(g_x["params"]["sphere_embedding"]["embedding"])
    np.testing.assert_allclose(ge_pl, ge_x, rtol=2e-3, atol=1e-6)
    gw_pl = np.asarray(g_pl["params"]["block_0"]["ga"]["w1"])
    gw_x = np.asarray(
        g_x["params"]["block_0"]["ga"]["so2_conv_1"]["fc_m0"]["kernel"]
    )
    np.testing.assert_allclose(gw_pl, gw_x, rtol=2e-3, atol=1e-6)


def test_receiver_block_sizes_agree(monkeypatch):
    """Receiver blocking is a pure scheduling choice: r=1 and an odd r
    must produce identical outputs and grads."""
    import nabladft_tpu.ops.pallas.eqv2_attn as ak

    rng = np.random.default_rng(1)
    batch = _make_batch(rng)
    m_pl = create_model("equiformer_v2", **KW, use_pallas=True, remat=False)
    p_pl = jax.jit(m_pl.init)(jax.random.PRNGKey(1), batch)

    def run():
        def loss(p):
            o = m_pl.apply(p, batch)
            return jnp.sum(o["energy"] ** 2) + jnp.sum(o["forces"] ** 2)

        val, g = jax.value_and_grad(loss)(p_pl)
        return np.asarray(val), np.asarray(
            g["params"]["block_0"]["ga"]["w1"]
        )

    monkeypatch.setattr(ak, "_R_CAPS", (1, 1))
    v1, g1 = run()
    monkeypatch.setattr(ak, "_R_CAPS", (3, 2))  # a=8 -> r_fwd=2, r_bwd=2
    v2, g2 = run()
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-7)
