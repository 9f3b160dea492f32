"""Scheduler-adjacent optimizer transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nabladft_tpu.train.schedulers import lookahead


def test_lookahead_sync_semantics():
    """After k inner steps the params must equal slow + alpha*(fast - slow)
    with the slow copy updated — the reference lookahead.py:8 semantics."""
    k, alpha = 3, 0.5
    tx = optax.chain(optax.sgd(0.1), lookahead(k=k, alpha=alpha))
    params = {"w": jnp.array([1.0, -2.0])}
    state = tx.init(params)
    grads = {"w": jnp.array([1.0, 1.0])}

    # replicate manually: plain sgd fast weights + periodic pull-back
    fast = np.array([1.0, -2.0])
    slow = fast.copy()
    p = params
    for step in range(1, 7):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
        fast = fast - 0.1
        if step % k == 0:
            fast = slow + alpha * (fast - slow)
            slow = fast.copy()
        np.testing.assert_allclose(np.asarray(p["w"]), fast, rtol=1e-6)


def test_lookahead_is_jittable():
    tx = optax.chain(optax.adam(1e-2), lookahead(k=2, alpha=0.7))
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = {"w": jnp.full((4,), 0.5)}
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(5):
        params, state = step(params, state)
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_trainer_accepts_lookahead(monkeypatch):
    """Engine wiring: lookahead_k > 0 composes into the optimizer chain and
    a train step still runs (tiny SchNet on a synthetic batch)."""
    from nabladft_tpu.data.batch import MolBatch
    from nabladft_tpu.models import create_model
    from nabladft_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    B, A = 4, 8
    node_mask = np.ones((B, A), bool)
    batch = MolBatch(
        z=rng.integers(1, 9, (B, A)).astype(np.int32),
        pos=rng.normal(size=(B, A, 3)).astype(np.float32),
        node_mask=node_mask,
        graph_mask=np.ones((B,), bool),
        energy=rng.normal(size=(B,)).astype(np.float32),
        forces=rng.normal(size=(B, A, 3)).astype(np.float32),
        mol_id=np.arange(B, dtype=np.int32),
    )
    model = create_model("schnet", hidden=16, n_interactions=2, n_rbf=8)
    cfg = TrainerConfig(
        schedule="constant", lr=1e-3, lookahead_k=2, lookahead_alpha=0.5,
        log_every_n_steps=10**9, n_dp=1,
    )
    tr = Trainer(model, cfg)
    tr.init_state(batch)
    s0 = tr.state
    # snapshot BEFORE stepping: the train step donates its input state
    leaf0 = np.asarray(jax.tree_util.tree_leaves(s0.params)[0]).copy()
    s1, m1 = tr._jit_train_step(s0, batch)
    s2, m2 = tr._jit_train_step(s1, batch)
    assert np.isfinite(float(m2["train/total"]))
    # params actually moved
    leaf2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    assert not np.allclose(leaf0, leaf2)
