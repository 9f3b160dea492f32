"""Engine: overfit a tiny PaiNN on random data, checkpoint round-trip, EMA."""

import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig

pytestmark = pytest.mark.pipeline


class ToyModule:
    """Minimal datamodule over a fixed list of batches."""

    def __init__(self, batches):
        self.batches = batches

    def train_dataloader(self):
        return list(self.batches)

    def val_dataloader(self):
        return list(self.batches)

    test_dataloader = val_dataloader
    predict_dataloader = val_dataloader


def make_toy_batches(rng, n_batches=2, B=8, A=8):
    batches = []
    for _ in range(n_batches):
        z = rng.integers(1, 9, (B, A)).astype(np.int32)
        pos = rng.uniform(-2, 2, (B, A, 3)).astype(np.float32)
        node_mask = np.ones((B, A), bool)
        graph_mask = np.ones((B,), bool)
        # synthetic smooth target: sum of pairwise gaussians
        d = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
        energy = np.exp(-(d**2)).sum((1, 2)).astype(np.float32) * 0.1
        batches.append(
            MolBatch(
                z=z, pos=pos, node_mask=node_mask, graph_mask=graph_mask,
                energy=energy, forces=np.zeros((B, A, 3), np.float32),
                mol_id=np.arange(B, dtype=np.int32),
            )
        )
    return batches


@pytest.fixture(scope="module")
def toy_data():
    return make_toy_batches(np.random.default_rng(0))


def test_overfit_energy(toy_data, tmp_path):
    model = create_model("painn", hidden=32, n_interactions=2, n_rbf=16, max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=30, lr=5e-3, schedule="constant", log_every_n_steps=1000,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0},
        ckpt_dir=str(tmp_path / "ckpt"), save_top_k=1, n_dp=1,
    )
    trainer = Trainer(model, cfg)
    dm = ToyModule(toy_data)
    first = trainer.validate(dm.val_dataloader())
    final = trainer.fit(dm)
    assert final["val/loss"] < first["val/loss"] * 0.2, (first, final)
    # checkpoint exists and restores
    assert trainer.ckpt.last_path().exists()
    state2, step = trainer.ckpt.restore(trainer.state)
    assert step == int(trainer.state.step)
    # predict yields real molecules only
    outs = list(trainer.predict(dm.predict_dataloader()))
    assert outs[0]["energy"].shape == (8,)


def test_ema_and_plateau(toy_data, tmp_path):
    model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=3, lr=1e-3, schedule="plateau", plateau_patience=0,
        ema_decay=0.9, log_every_n_steps=1000,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
    )
    trainer = Trainer(model, cfg)
    trainer.fit(ToyModule(toy_data))
    assert trainer.state.ema_params is not None
    # plateau must have reduced LR at least once with patience=0 over 3 epochs
    from nabladft_tpu.train.state import current_learning_rate

    lr = current_learning_rate(trainer.state.opt_state)
    assert lr is not None and lr <= 1e-3 * (1 + 1e-5)


def test_max_steps_stops(toy_data):
    model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=100, max_steps=3, schedule="constant", log_every_n_steps=1000,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
    )
    trainer = Trainer(model, cfg)
    trainer.fit(ToyModule(toy_data))
    assert int(trainer.state.step) == 3


def test_max_seconds_stops(toy_data):
    """Wall-clock bound (Lightning max_time parity): fit stops promptly and
    still returns epoch-end validation metrics."""
    model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=10**6, max_seconds=2.0, schedule="constant",
        log_every_n_steps=1000,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
    )
    trainer = Trainer(model, cfg)
    import time

    t0 = time.perf_counter()
    final = trainer.fit(ToyModule(toy_data))
    assert time.perf_counter() - t0 < 60
    assert int(trainer.state.step) >= 1
    assert "val/loss" in final


@pytest.mark.parallel
def test_dp_sharding_matches_single_device(toy_data):
    """Same seed, same data: dp=8 must produce the same training result as
    dp=1 (gradient psum correctness)."""
    import jax

    results = {}
    for n_dp in (1, 8):
        model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
        cfg = TrainerConfig(
            max_epochs=2, lr=1e-3, schedule="constant", log_every_n_steps=1000,
            loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=n_dp,
        )
        trainer = Trainer(model, cfg)
        trainer.fit(ToyModule(toy_data))
        results[n_dp] = trainer.validate(toy_data)["val/loss"]
    assert results[1] == pytest.approx(results[8], rel=2e-4), results


def test_dropout_model_train_eval_pair(toy_data):
    """Graphormer trains stochastic, evaluates deterministic."""
    model = create_model(
        "graphormer3d", blocks=1, layers=1, embed_dim=16, ffn_embed_dim=16,
        attention_heads=2, num_kernel=8, deterministic=False,
    )
    eval_model = create_model(
        "graphormer3d", blocks=1, layers=1, embed_dim=16, ffn_embed_dim=16,
        attention_heads=2, num_kernel=8, deterministic=True,
    )
    cfg = TrainerConfig(
        max_epochs=1, lr=1e-3, schedule="constant", log_every_n_steps=1000,
        loss_specs={"energy": "mse", "forces": "mse"},
        loss_coefs={"energy": 1.0, "forces": 0.1}, n_dp=1,
    )
    trainer = Trainer(model, cfg, eval_model=eval_model)
    trainer.fit(ToyModule(toy_data))
    m = trainer.validate(toy_data)
    assert np.isfinite(m["val/loss"])
    # deterministic eval: same batch twice gives identical metrics
    m2 = trainer.validate(toy_data)
    assert m["val/loss"] == m2["val/loss"]


def test_force_grads_impls_agree(toy_data):
    """direct / surrogate / pallas force-gradient paths produce the same
    update (pallas kernels run in interpret mode on CPU)."""
    import jax

    batch = toy_data[0]
    losses = {}
    for impl, pallas in (("direct", "off"), ("surrogate", "off"), ("pallas", "off")):
        model = create_model(
            "painn", hidden=16, n_interactions=2, n_rbf=8, max_neighbors=7,
            use_pallas=pallas,
        )
        cfg = TrainerConfig(
            max_epochs=1, lr=1e-3, schedule="constant", log_every_n_steps=1000,
            loss_specs={"energy": "l1", "forces": "l2norm"},
            loss_coefs={"energy": 1.0, "forces": 1.0}, n_dp=1,
            force_grads=impl,
        )
        trainer = Trainer(model, cfg)
        trainer.init_state(batch)
        state, metrics = trainer._jit_train_step(trainer.state, batch)
        # run a second step so the compared loss reflects the first update
        state, metrics = trainer._jit_train_step(state, batch)
        losses[impl] = float(metrics["train/total"])
    assert losses["direct"] == pytest.approx(losses["surrogate"], rel=1e-4)
    assert losses["direct"] == pytest.approx(losses["pallas"], rel=1e-4)


def test_warmup_scales_first_updates(toy_data):
    """warmup_steps on a constant/plateau schedule ramps the update size
    linearly (engine composes optax.scale_by_schedule after the core
    optimizer): the first step with warmup_steps=10 must move parameters
    ~1/10 as far as the unwarmed first step, and be identity afterwards."""
    import jax
    import jax.numpy as jnp

    batch = toy_data[0]
    deltas = {}
    for w in (0, 10):
        model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
        cfg = TrainerConfig(
            max_epochs=1, lr=1e-3, schedule="constant", warmup_steps=w,
            log_every_n_steps=1000,
            loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
        )
        trainer = Trainer(model, cfg)
        trainer.init_state(batch)
        # the jitted step donates `state` — snapshot params to host first
        p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        state, _ = trainer._jit_train_step(trainer.state, batch)
        leaves0 = jax.tree_util.tree_leaves(p0)
        leaves1 = jax.tree_util.tree_leaves(state.params)
        deltas[w] = float(
            sum(jnp.abs(a - jnp.asarray(b)).sum() for b, a in zip(leaves0, leaves1))
        )
    # first warmed step applies (0+1)/10 of the update
    assert deltas[10] == pytest.approx(deltas[0] * 0.1, rel=1e-3), deltas


def test_restore_best_for_test(toy_data):
    """fit snapshots the best-val params; test() must evaluate those, not
    the final step's (reference protocol: Lightning tests the checkpoint
    best — a late divergence must not poison test metrics)."""
    import jax

    model = create_model("schnet", hidden=16, n_interactions=1, n_rbf=8, max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=5, lr=5e-3, schedule="constant", log_every_n_steps=1000,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
    )
    trainer = Trainer(model, cfg)
    dm = ToyModule(toy_data)
    trainer.fit(dm)
    assert trainer._best_snapshot is not None
    best_step, best_params, _ = trainer._best_snapshot
    # wreck the live params to simulate a post-best divergence
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 100.0, trainer.state.params)
    )
    wrecked = trainer.validate(dm.val_dataloader())["val/loss"]
    metrics = trainer.test(dm.test_dataloader())
    assert metrics["test/loss"] < wrecked
    # restored state now holds the snapshot
    got = jax.tree_util.tree_leaves(trainer.state.params)[0]
    want = jax.tree_util.tree_leaves(best_params)[0]
    assert np.allclose(np.asarray(got), np.asarray(want))
