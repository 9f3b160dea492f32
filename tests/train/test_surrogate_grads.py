"""The forward-over-reverse force gradient must equal the direct one."""

import jax
import numpy as np
import pytest

from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig

from .test_engine import make_toy_batches

pytestmark = pytest.mark.pipeline


@pytest.mark.parametrize("family,kw", [
    ("painn", dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=7)),
    # the surrogate path is model-generic: any derivative_forces model may
    # use it (the dimenetpp/schnet XLA benches train through it)
    ("dimenetpp", dict(hidden=16, num_blocks=2, int_emb_size=8,
                       basis_emb_size=4, out_emb_channels=16,
                       num_spherical=3, num_radial=4, max_neighbors=7,
                       remat=False)),
])
def test_surrogate_matches_direct_grads(family, kw):
    batch = make_toy_batches(np.random.default_rng(0), n_batches=1)[0]
    batch = batch.replace(forces=np.random.default_rng(1).normal(
        size=batch.forces.shape).astype(np.float32))
    model = create_model(family, **kw)
    cfg = TrainerConfig(
        schedule="constant", lr=1e-3, n_dp=1,
        loss_specs={"energy": "l1", "forces": "l2norm"},
        loss_coefs={"energy": 1.0, "forces": 2.0},
    )
    trainer = Trainer(model, cfg)
    trainer.init_state(batch)
    params = trainer.state.params

    g_sur, losses_sur, _ = trainer._surrogate_grads(params, batch, None)

    def loss_fn(p):
        losses, _ = trainer._loss_and_out(p, batch, model)
        return losses["total"]

    g_dir = jax.grad(loss_fn)(params)
    flat_s = jax.tree_util.tree_leaves(g_sur)
    flat_d = jax.tree_util.tree_leaves(g_dir)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)
    assert np.isfinite(float(losses_sur["total"]))
