"""Parity tests for the fused QHNet tensor-product kernels.

The kernels (ops/pallas/qhnet_tp.py, interpret mode on CPU) must reproduce
the einsum formulation in models/qhnet.py — weighted_tensor_product for the
conv message and self_tensor_product for the pair block — exactly, for both
values and gradients. A reduced LMAX keeps interpret-mode wall time down
while still covering multi-path accumulation, truncation at l_out_max, and
the a/b/m index plumbing; the full-LMAX path ordering is asserted directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.models import qhnet as Q
from nabladft_tpu.ops.pallas import qhnet_tp as K

LM = 2  # reduced lmax: 14 paths, runs in seconds under interpret mode
B, A, C = 2, 11, 8
S = (LM + 1) ** 2
PATHS = K.tp_paths(LM)
P = len(PATHS)


def test_path_ordering_matches_model():
    assert K.tp_paths(Q.LMAX) == Q._tp_paths(Q.LMAX, Q.LMAX, Q.LMAX)
    # layout sanity at full LMAX
    offs, k_tot = K._cg_layout(Q.LMAX)
    assert len(offs) == len(K.tp_paths(Q.LMAX)) == 65
    assert K.cgsh_matrix(Q.LMAX).shape[0] == (Q.LMAX + 1) ** 2


@pytest.fixture()
def conv_inputs(rng):
    x_list = [
        jnp.asarray(rng.normal(size=(B, A, C, 2 * l + 1)), jnp.float32)
        for l in range(LM + 1)
    ]
    sh_flat = jnp.asarray(rng.normal(size=(B, A, A, S)), jnp.float32)
    adj = jnp.asarray(rng.random((B, A, A)) < 0.6)
    h_r = jnp.asarray(rng.normal(size=(B, A, A, 5)), jnp.float32)
    h_s = jnp.asarray(rng.normal(size=(B, A, A, 7)), jnp.float32)
    w2r = jnp.asarray(rng.normal(size=(5, P * C)), jnp.float32) * 0.1
    b2r = jnp.asarray(rng.normal(size=(P * C,)), jnp.float32) * 0.1
    w2s = jnp.asarray(rng.normal(size=(7, P * C)), jnp.float32) * 0.1
    b2s = jnp.asarray(rng.normal(size=(P * C,)), jnp.float32) * 0.1
    return x_list, sh_flat, adj, h_r, h_s, w2r, b2r, w2s, b2s


def _conv_ref(x_list, sh_flat, adj, h_r, h_s, w2r, b2r, w2s, b2s):
    sh = [sh_flat[..., l * l : (l + 1) * (l + 1)] for l in range(LM + 1)]
    w = jnp.einsum("...h,hk->...k", h_r, w2r) + b2r
    w = w * (jnp.einsum("...h,hk->...k", h_s, w2s) + b2s)
    w = w.reshape(*w.shape[:-1], P, C)
    w = jnp.where(adj[..., None, None], w, 0.0)
    x_j = [jnp.broadcast_to(x[:, None], (B, A, A, C, x.shape[-1])) for x in x_list]
    msgs = Q.weighted_tensor_product(x_j, sh, w, LM)
    agg = [m.sum(axis=2) for m in msgs]
    return Q._list_to_flat(agg)  # [B, A, S, C]


def _conv_pal(x_list, sh_flat, adj, h_r, h_s, w2r, b2r, w2s, b2s):
    a_pad = -(-A // 8) * 8
    x_lat = Q._pad_atoms(jnp.swapaxes(Q._list_to_flat(x_list), 1, 2), (2,), a_pad)
    sh_adj = jnp.where(adj[..., None], sh_flat, 0.0)
    cgsh = Q._pad_atoms(sh_adj @ jnp.asarray(K.cgsh_matrix(LM)), (1, 2), a_pad)
    return K.conv_tp(
        x_lat, cgsh,
        Q._pad_atoms(h_r, (1, 2), a_pad), Q._pad_atoms(h_s, (1, 2), a_pad),
        w2r, b2r, w2s, b2s, LM, True,
    )[:, :A]


def test_conv_tp_forward(conv_inputs):
    o_ref = _conv_ref(*conv_inputs)
    o_pal = _conv_pal(*conv_inputs)
    np.testing.assert_allclose(o_pal, o_ref, rtol=2e-5, atol=2e-5)


def test_conv_tp_grads(conv_inputs):
    x_list, sh_flat, adj, *rest = conv_inputs
    o = _conv_ref(*conv_inputs)
    probe = jnp.cos(jnp.arange(o.size, dtype=jnp.float32)).reshape(o.shape)

    def l_ref(a):
        return jnp.sum(_conv_ref(a[0], sh_flat, adj, *a[1:]) * probe)

    def l_pal(a):
        return jnp.sum(_conv_pal(a[0], sh_flat, adj, *a[1:]) * probe)

    g_ref = jax.grad(l_ref)((x_list, *rest))
    g_pal = jax.grad(l_pal)((x_list, *rest))
    for gr, gp in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(gp, gr, rtol=5e-5, atol=5e-5)


@pytest.fixture()
def pair_inputs(rng):
    node = [
        jnp.asarray(rng.normal(size=(B, A, C, 2 * l + 1)), jnp.float32)
        for l in range(LM + 1)
    ]
    h_r = jnp.asarray(rng.normal(size=(B, A, A, 4)), jnp.float32)
    h_s = jnp.asarray(rng.normal(size=(B, A, A, 6)), jnp.float32)
    w2r = jnp.asarray(rng.normal(size=(4, P * C)), jnp.float32) * 0.1
    b2r = jnp.asarray(rng.normal(size=(P * C,)), jnp.float32) * 0.1
    w2s = jnp.asarray(rng.normal(size=(6, P * C)), jnp.float32) * 0.1
    b2s = jnp.asarray(rng.normal(size=(P * C,)), jnp.float32) * 0.1
    fmask = jnp.asarray(rng.random((B, A, A)) < 0.8)
    return node, fmask, h_r, h_s, w2r, b2r, w2s, b2s


def _pair_ref(node, fmask, h_r, h_s, w2r, b2r, w2s, b2s):
    w = jnp.einsum("...h,hk->...k", h_r, w2r) + b2r
    w = w * (jnp.einsum("...h,hk->...k", h_s, w2s) + b2s)
    w = w.reshape(*w.shape[:-1], P, C)
    w = jnp.where(fmask[..., None, None], w, 0.0)
    pair = Q.self_tensor_product(
        [x[:, :, None] for x in node],
        [x[:, None, :] for x in node],
        LM,
        [w[..., p, :] for p in range(P)],
    )
    return jnp.concatenate(
        [jnp.swapaxes(p_, -1, -2) for p_ in pair], axis=-2
    )  # [B, A, A, S, C]


def _pair_pal(node, fmask, h_r, h_s, w2r, b2r, w2s, b2s):
    a_pad = -(-A // 8) * 8
    node_flat = Q._list_to_flat(node)
    zi = jnp.einsum("basc,sk->bakc", node_flat, jnp.asarray(K.cgz_matrix(LM)))
    x_lat = Q._pad_atoms(jnp.swapaxes(node_flat, 1, 2), (2,), a_pad)
    maskf = fmask.astype(jnp.float32)[..., None]
    fij = K.pair_tp(
        x_lat, Q._pad_atoms(zi, (1,), a_pad), Q._pad_atoms(maskf, (1, 2), a_pad),
        Q._pad_atoms(h_r, (1, 2), a_pad), Q._pad_atoms(h_s, (1, 2), a_pad),
        w2r, b2r, w2s, b2s, LM, True,
    )[:, :A, :, :A]  # [B, A, S, A, C]
    return jnp.transpose(fij, (0, 1, 3, 2, 4))


def test_pair_tp_forward(pair_inputs):
    p_ref = _pair_ref(*pair_inputs)
    p_pal = _pair_pal(*pair_inputs)
    np.testing.assert_allclose(p_pal, p_ref, rtol=2e-5, atol=2e-5)


def test_pair_tp_grads(pair_inputs):
    node, fmask, *rest = pair_inputs

    o = _pair_ref(*pair_inputs)
    probe = jnp.sin(jnp.arange(o.size, dtype=jnp.float32) * 0.01).reshape(o.shape)

    def l_ref(a):
        return jnp.sum(_pair_ref(a[0], fmask, *a[1:]) * probe)

    def l_pal(a):
        return jnp.sum(_pair_pal(a[0], fmask, *a[1:]) * probe)

    g_ref = jax.grad(l_ref)((node, *rest))
    g_pal = jax.grad(l_pal)((node, *rest))
    for gr, gp in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(gp, gr, rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_qhnet_model_pallas_parity(rng):
    """Full-model check at LMAX=4: use_pallas on/off agree for the
    block-space Hamiltonian output and its parameter gradients.

    Marked slow: under CPU interpret mode the LMAX=4 kernels trace to
    ~2600-op XLA graphs whose CPU compile alone takes tens of minutes; the
    op-level tests above cover the same kernels at lmax=2 in seconds, and
    the same on/off comparison runs on real TPU in scripts (see STATUS).
    Run explicitly with: pytest -m slow tests/ops/test_qhnet_tp.py"""
    from nabladft_tpu.data.batch import MolBatch
    from nabladft_tpu.models import create_model

    Bm, Am, O = 2, 6, 64
    z = np.zeros((Bm, Am), np.int32)
    pos = np.zeros((Bm, Am, 3), np.float32)
    node_mask = np.zeros((Bm, Am), bool)
    ham = np.zeros((Bm, O, O), np.float32)
    orb_mask = np.zeros((Bm, O), bool)
    norb_map = {1: 5, 8: 14}
    for b in range(Bm):
        n = 4 + b
        z[b, :n] = [8, 1, 1, 8, 1][:n]
        pos[b, :n] = rng.normal(size=(n, 3)) * 3
        node_mask[b, :n] = True
        no = sum(norb_map[int(x)] for x in z[b, :n])
        h = rng.normal(size=(no, no)).astype(np.float32)
        ham[b, :no, :no] = (h + h.T) / 2
        orb_mask[b, :no] = True
    batch = MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=np.ones(Bm, bool),
        energy=np.zeros(Bm, np.float32), forces=np.zeros((Bm, Am, 3), np.float32),
        mol_id=np.arange(Bm, dtype=np.int32), hamiltonian=ham, orb_mask=orb_mask,
    )
    kwargs = dict(hidden=8, bottle_hidden=4, num_layers=4, start_layer=2,
                  assemble_matrix=False, remat=False)
    m_off = create_model("qhnet", use_pallas=False, **kwargs)
    m_on = create_model("qhnet", use_pallas=True, **kwargs)
    params = m_off.init(jax.random.PRNGKey(0), batch)

    def loss(mdl, p):
        out = mdl.apply(p, batch)
        return jnp.sum(jnp.abs(out["hamiltonian_blocks"])) / 1e3

    l_off, g_off = jax.value_and_grad(lambda p: loss(m_off, p))(params)
    l_on, g_on = jax.value_and_grad(lambda p: loss(m_on, p))(params)
    np.testing.assert_allclose(l_on, l_off, rtol=1e-5)
    for goff, gon in zip(jax.tree_util.tree_leaves(g_off), jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(gon, goff, rtol=1e-4, atol=1e-5)
