"""Parity of the fused SchNet cfconv kernels vs the XLA dense-pair path.

All modes share one parameter tree. Coverage: forward energy, first-order
forces through the fused custom VJP (g_dist folds basis+envelope chains),
and the dual (JVP) op's primal/tangent lanes + parameter cotangents — the
exact graph the engine's surrogate force-gradient pass builds."""

import jax
import jax.numpy as jnp
import numpy as np

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model

KW = dict(hidden=16, n_interactions=2, n_rbf=8, cutoff=5.0,
          max_neighbors=7, remat=False)


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


def _models():
    m_off = create_model("schnet", **KW, use_pallas="off")
    m_fused = create_model("schnet", **KW, use_pallas="fused")
    m_train = create_model("schnet", **KW, use_pallas="train")
    return m_off, m_fused, m_train


def test_fused_forward_and_forces_match_off():
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    m_off, m_fused, _ = _models()
    params = jax.jit(m_off.init)(jax.random.PRNGKey(0), batch)

    e_off = m_off.apply(params, batch)["energy"]
    e_fused = m_fused.apply(params, batch)["energy"]
    np.testing.assert_allclose(np.asarray(e_fused), np.asarray(e_off),
                               rtol=1e-5, atol=1e-6)

    def forces(model, pos):
        def esum(pos):
            out = model.apply(params, batch.replace(pos=pos))
            return out["energy"].sum()

        return -jax.grad(esum)(pos) * batch.node_mask[..., None]

    f_off = forces(m_off, batch.pos)
    f_fused = forces(m_fused, batch.pos)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_off),
                               rtol=2e-4, atol=1e-6)
    # parameter gradients through the fused VJP (first-order energy loss)
    g_off = jax.grad(lambda p: jnp.sum(m_off.apply(p, batch)["energy"] ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.sum(m_fused.apply(p, batch)["energy"] ** 2))(params)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g_fused),
                      jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=1e-6)


def test_train_mode_surrogate_grads_match_off():
    """The surrogate pass: grad wrt params of (energy loss + jvp-based force
    term) built on the train-mode model must equal the pure-XLA
    reverse-over-reverse gradient."""
    rng = np.random.default_rng(1)
    batch = _make_batch(rng)
    m_off, m_fused, m_train = _models()
    params = jax.jit(m_off.init)(jax.random.PRNGKey(0), batch)
    nmask3 = batch.node_mask[..., None]
    w_dir = (rng.normal(size=batch.pos.shape).astype(np.float32) * nmask3)

    def direct(p):
        def esum(pos):
            return m_off.apply(p, batch.replace(pos=pos))["energy"].sum()

        f = -jax.grad(esum)(batch.pos) * nmask3
        return jnp.sum(f * w_dir)  # linear force term: grads match surrogate

    def surrogate(p):
        def e_fn(pos):
            return m_train.apply(p, batch.replace(pos=pos))["energy"].sum()

        _, t = jax.jvp(e_fn, (batch.pos,), (jnp.asarray(w_dir),))
        return -t  # F = -∇E ⇒ Σ w·F = -(jvp of ΣE in direction w)

    g_direct = jax.grad(direct)(params)
    g_surr = jax.grad(surrogate)(params)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g_surr),
                      jax.tree_util.tree_leaves(g_direct)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=5e-3, atol=2e-6)
