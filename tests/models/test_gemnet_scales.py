"""GemNet-OC data-fitted scale factors (reference layers/scale_factor.py)."""

import jax
import numpy as np
import pytest

from nabladft_tpu.models import create_model
from nabladft_tpu.models.gemnet_oc import fit_scale_factors

pytestmark = pytest.mark.model

KW = dict(
    num_blocks=2, emb_size_atom=16, emb_size_edge=32, emb_size_trip_in=8,
    emb_size_trip_out=8, emb_size_quad_in=8, emb_size_quad_out=8,
    emb_size_rbf=8, emb_size_cbf=8, emb_size_sbf=8, num_radial=16,
    num_spherical=4, num_spherical_quad=3, max_neighbors=7,
    max_neighbors_qint=4, remat=False,
)


def _batch(rng, B=6, A=9):
    from nabladft_tpu.data.batch import MolBatch

    z = rng.integers(1, 9, (B, A)).astype(np.int32)
    pos = rng.uniform(-3, 3, (B, A, 3)).astype(np.float32)
    return MolBatch(
        z=z, pos=pos, node_mask=np.ones((B, A), bool),
        graph_mask=np.ones((B,), bool), energy=np.zeros(B, np.float32),
        forces=np.zeros((B, A, 3), np.float32), mol_id=np.arange(B, dtype=np.int32),
    )


def test_scale_factors_fit_and_freeze(rng):
    model = create_model("gemnet_oc", **KW)
    batch = _batch(rng)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    assert "scales" in variables
    ones = jax.tree_util.tree_leaves(variables["scales"])
    assert all(float(x) == 1.0 for x in ones)

    fitted = fit_scale_factors(model, variables, [batch, _batch(rng)], rounds=2)
    vals = [float(x) for x in jax.tree_util.tree_leaves(fitted["scales"])]
    assert any(abs(v - 1.0) > 1e-3 for v in vals), vals
    assert all(np.isfinite(v) and v > 0 for v in vals)

    # after fitting, the observed output variance matches the reference
    # variance (ratio ~ 1) for the stats the fit saw
    _, mut = model.apply(fitted, batch, mutable=["scale_stats"])
    stats = jax.tree_util.tree_leaves(mut["scale_stats"])
    ratios = [float(s[1]) / max(float(s[0]), 1e-12) for s in stats]
    ok = [0.2 < r < 5.0 for r in ratios]
    assert sum(ok) >= len(ok) * 3 // 4, ratios

    # forward still works and differs from unfitted (scales applied)
    out_a = model.apply(variables, batch)
    out_b = model.apply(fitted, batch)
    assert not np.allclose(np.asarray(out_a["energy"]), np.asarray(out_b["energy"]))


def test_gemnet_trains_with_frozen_scales(rng):
    from tests.train.test_engine import ToyModule, make_toy_batches
    from nabladft_tpu.train import Trainer, TrainerConfig

    batches = make_toy_batches(np.random.default_rng(3), n_batches=1, B=4, A=8)
    model = create_model("gemnet_oc", **KW)
    cfg = TrainerConfig(
        max_epochs=2, lr=1e-3, schedule="constant", log_every_n_steps=1000,
        loss_specs={"energy": "mse", "forces": "mse"},
        loss_coefs={"energy": 1.0, "forces": 0.1}, n_dp=1,
        scale_fit_batches=1,
    )
    trainer = Trainer(model, cfg)
    trainer.fit(ToyModule(batches))
    fitted_scales = jax.tree_util.tree_leaves(trainer.state.params["scales"])
    # scales were fitted (≠1) and then frozen across optimizer steps
    assert any(abs(float(x) - 1.0) > 1e-3 for x in fitted_scales)
    m = trainer.validate(batches)
    assert np.isfinite(m["val/loss"])
