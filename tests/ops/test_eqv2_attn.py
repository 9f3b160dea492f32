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


def test_pipeline_bwd_matches_jax_vjp():
    """The hand-written _attn_pipeline_bwd must reproduce jax.vjp of
    _attn_pipeline for EVERY differentiable input (pure jnp, no pallas)."""
    import nabladft_tpu.ops.pallas.eqv2_attn as ak
    from nabladft_tpu.ops import so3

    l_max, m_max, c, nh, va, vc = 2, 1, 8, 2, 4, 4
    co = nh * vc
    n0 = l_max + 1
    n_grid = 4 * (l_max + 1) ** 2
    r, k, a_mol, ec = 2, 8, 8, 8
    s_full = (l_max + 1) ** 2
    _, kw = so3.trunc_compact_layout(l_max, m_max)

    rng = np.random.default_rng(7)
    f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    x = f32(s_full, a_mol, c)
    xi = f32(r, s_full, c)
    xe = f32(r, k, ec)
    # masked one-hot gather + masked Wigner + neighbor mask
    mask = rng.random((r, k)) > 0.25
    idx = rng.integers(0, a_mol, (r, k))
    oh = jnp.asarray(
        (np.eye(a_mol)[idx] * mask[..., None]).astype(np.float32)
    )
    d = f32(r, k, kw) * jnp.asarray(mask[..., None], jnp.float32)
    maskf = jnp.asarray(mask[..., None], jnp.float32)
    dropk = jnp.asarray(
        (rng.random((r, k, nh)) > 0.1).astype(np.float32) / 0.9
    )
    w_rad = f32(ec, n0 * 2 * c)
    b_rad = f32(1, n0 * 2 * c)
    w1 = f32(n0 * 2 * c, n0 * co + nh * va + co)
    w2 = f32(n0 * co, n0 * co)
    fc1m = [f32((l_max + 1 - m) * 2 * c, 2 * (l_max + 1 - m) * co)
            for m in range(1, m_max + 1)]
    fc2m = [f32((l_max + 1 - m) * co, 2 * (l_max + 1 - m) * co)
            for m in range(1, m_max + 1)]
    ln_s = f32(1, nh * va)
    ln_b = f32(1, nh * va)
    adot = f32(1, nh * va)
    m_avg, m_exp, m_expv = ak._expanders(nh, va, co)
    kw_static = dict(l_max=l_max, m_max=m_max, c=c, co=co, nh=nh, va=va,
                     n_grid=n_grid, mxu_bf16=False)

    def f(x, xi, xe, w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot):
        return ak._attn_pipeline(
            x, oh, xi, d, xe, maskf, dropk, w_rad, b_rad, w1, fc1m, w2,
            fc2m, ln_s, ln_b, adot, m_avg, m_exp, m_expv, **kw_static)

    args = (x, xi, xe, w_rad, b_rad, w1, fc1m, w2, fc2m, ln_s, ln_b, adot)
    out, vjp = jax.vjp(f, *args)
    g = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    ref = vjp(g)

    got = ak._attn_pipeline_bwd(
        x, oh, xi, d, xe, maskf, dropk, w_rad, b_rad, w1, fc1m, w2, fc2m,
        ln_s, ln_b, adot, m_avg, m_exp, m_expv, g, **kw_static)
    (gx, gxi, gxe, g_wrad, g_brad, g_w1, g_fc1m, g_w2, g_fc2m,
     g_lns, g_lnb, g_adot) = got
    names_ref = dict(zip(
        ["x", "xi", "xe", "w_rad", "b_rad", "w1", "fc1m", "w2", "fc2m",
         "ln_s", "ln_b", "adot"], ref))
    names_got = dict(x=gx, xi=gxi, xe=gxe, w_rad=g_wrad, b_rad=g_brad,
                     w1=g_w1, fc1m=g_fc1m, w2=g_w2, fc2m=g_fc2m,
                     ln_s=g_lns, ln_b=g_lnb, adot=g_adot)
    for name in names_ref:
        r_l = jax.tree_util.tree_leaves(names_ref[name])
        g_l = jax.tree_util.tree_leaves(names_got[name])
        assert len(r_l) == len(g_l), name
        for rv, gv in zip(r_l, g_l):
            np.testing.assert_allclose(
                np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-6,
                err_msg=name)
