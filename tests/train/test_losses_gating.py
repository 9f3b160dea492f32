"""PhiSNet max-error loss gating (reference phisnet/training/util.py:37-45):
a target whose batch MAE exceeds its clamp must contribute nothing — value
or gradient — to the training total, so one exploding target cannot poison
the step for the others."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.train.losses import multitask_loss

pytestmark = pytest.mark.pipeline


def _batch(B=4, A=6):
    rng = np.random.default_rng(0)
    return MolBatch(
        z=rng.integers(1, 9, (B, A)).astype(np.int32),
        pos=rng.normal(size=(B, A, 3)).astype(np.float32),
        node_mask=np.ones((B, A), bool),
        graph_mask=np.ones((B,), bool),
        energy=rng.normal(size=(B,)).astype(np.float32),
        forces=rng.normal(size=(B, A, 3)).astype(np.float32) * 0.01,
        mol_id=np.arange(B, dtype=np.int32),
    )


def test_exploding_target_is_gated_out():
    batch = _batch()
    specs = {"energy": "l1", "forces": "l2norm"}
    coefs = {"energy": 1.0, "forces": 1.0}

    def total(scale, max_errors):
        out = {
            # exploding energy head: far above any clamp
            "energy": jnp.asarray(batch.energy) + scale,
            "forces": jnp.asarray(batch.forces) * 0.5,
        }
        return multitask_loss(out, batch, specs, coefs, max_errors=max_errors)

    gated = total(1e6, {"energy": 10.0})
    ungated = total(1e6, None)
    # per-target values still reported un-clamped
    assert float(gated["energy"]) == pytest.approx(float(ungated["energy"]))
    # total excludes the exploding target entirely
    assert float(gated["total"]) == pytest.approx(float(gated["forces"]))
    # sane targets stay gated-in
    ok = total(0.0, {"energy": 10.0})
    assert float(ok["total"]) == pytest.approx(
        float(ok["energy"]) + float(ok["forces"])
    )


def test_gated_target_has_zero_gradient():
    batch = _batch()
    specs = {"energy": "l1", "forces": "l2norm"}
    coefs = {"energy": 1.0, "forces": 1.0}

    def loss(e_param, f_param, max_errors):
        out = {
            "energy": jnp.asarray(batch.energy) + e_param,
            "forces": jnp.asarray(batch.forces) * f_param,
        }
        return multitask_loss(out, batch, specs, coefs, max_errors=max_errors)[
            "total"
        ]

    ge, gf = jax.grad(loss, argnums=(0, 1))(1e6, 0.5, {"energy": 10.0})
    assert float(ge) == 0.0  # exploding target: no gradient flows
    gf_ref = jax.grad(loss, argnums=1)(0.0, 0.5, None)
    assert float(gf) == pytest.approx(float(gf_ref), rel=1e-6)
