"""Divergence-stress for the on-device batched L-BFGS (VERDICT r2 item 10).

A Lennard-Jones surface with deliberately BAD starting geometries (atom
pairs deep inside the repulsive wall, |F| ~ 1e5) is exactly where the
reference's adaptive Moré–Thuente line search decides pct_div. The compiled
searches must (a) never produce non-finite state, (b) monotonically
improve energy on the batch, and (c) with a line search enabled, relax at
least as many molecules as the raw damped step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.optimize.lbfgs import lbfgs_relax

pytestmark = pytest.mark.optimization


def lj_ef(eps=1.0, sigma=1.0):
    """Pairwise 12-6 Lennard-Jones (steep repulsive wall → divergence risk)."""

    def energy(pos, pm):
        diff = pos[:, :, None] - pos[:, None, :]
        d2 = jnp.sum(diff**2, -1) + 1e-12
        inv6 = (sigma**2 / d2) ** 3
        e_pair = 4.0 * eps * (inv6**2 - inv6)
        return 0.5 * jnp.sum(jnp.where(pm, e_pair, 0.0), axis=(1, 2))

    def fn(batch):
        pos, mask = batch.pos, batch.node_mask
        pm = mask[:, :, None] & mask[:, None, :] & ~jnp.eye(pos.shape[1], dtype=bool)
        e = energy(pos, pm)
        g = jax.grad(lambda p: energy(p, pm).sum())(pos)
        return e, -g * mask[..., None]

    return fn


def bad_start_batch(rng, B=6, A=6):
    """Clusters with at least one pair far inside the repulsive wall."""
    z = np.ones((B, A), np.int32)
    node_mask = np.ones((B, A), bool)
    pos = rng.uniform(-1.5, 1.5, (B, A, 3)).astype(np.float32)
    # slam two atoms together at 0.55 sigma (E ~ 5e2, F ~ 1e4)
    pos[:, 1] = pos[:, 0] + np.array([0.55, 0.0, 0.0], np.float32)
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=np.ones(B, bool),
        energy=np.zeros(B, np.float32), forces=np.zeros((B, A, 3), np.float32),
        mol_id=np.arange(B, dtype=np.int32),
    )


@pytest.mark.parametrize("ls", ["off", "armijo", "wolfe", "mt"])
def test_no_nonfinite_state_from_bad_starts(rng, ls):
    batch = bad_start_batch(rng)
    fn = lj_ef()
    e0, f0 = fn(batch)
    assert float(np.max(np.abs(np.asarray(f0)))) > 1e3  # genuinely hard
    res = jax.jit(lambda b: lbfgs_relax(
        fn, b, fmax=0.05, max_steps=300, memory=25, maxstep=0.2,
        line_search=ls, ls_trials=5,
    ))(batch)
    assert np.isfinite(np.asarray(res.pos)).all()
    assert np.isfinite(np.asarray(res.energy)).all()
    # energy must improve on every molecule (no divergence)
    assert (np.asarray(res.energy) < np.asarray(e0) - 1.0).all(), (
        np.asarray(res.energy), np.asarray(e0))


def test_line_search_not_worse_than_damped_step(rng):
    batch = bad_start_batch(rng, B=8)
    fn = lj_ef()
    n_conv = {}
    e_final = {}
    for ls in ("off", "armijo", "wolfe", "mt"):
        res = jax.jit(lambda b: lbfgs_relax(
            fn, b, fmax=0.05, max_steps=400, memory=25, maxstep=0.2,
            line_search=ls, ls_trials=5,
        ))(batch)
        n_conv[ls] = int(np.asarray(res.converged).sum())
        e_final[ls] = float(np.asarray(res.energy).sum())
    assert n_conv["wolfe"] >= n_conv["off"]
    assert n_conv["armijo"] >= n_conv["off"]
    assert n_conv["mt"] >= n_conv["off"]
