"""TensorBoard logger: scalar summaries + parameter histograms
(reference parity: PhiSNet legacy tensorboardX summaries, wandb default
logger — SURVEY §2 component 'tensorboard summaries + param histograms')."""

import numpy as np
import pytest

from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig
from nabladft_tpu.train.loggers import MultiLogger, TensorBoardLogger

from tests.train.test_engine import ToyModule, make_toy_batches

pytestmark = pytest.mark.pipeline


def test_tensorboard_scalars_and_histograms(tmp_path):
    data = make_toy_batches(np.random.default_rng(0), n_batches=1)
    model = create_model("painn", hidden=16, n_interactions=1, n_rbf=8,
                         max_neighbors=7)
    cfg = TrainerConfig(
        max_epochs=4, lr=1e-3, schedule="constant",
        log_every_n_steps=1, hist_every_n_steps=2,
        loss_specs={"energy": "mse"}, loss_coefs={"energy": 1.0}, n_dp=1,
    )
    tb_dir = tmp_path / "tb"
    tb = TensorBoardLogger(tb_dir)
    trainer = Trainer(model, cfg, loggers=MultiLogger([tb]))
    tb.log_hyperparams({"model": "painn", "trainer": {"lr": 1e-3}})
    trainer.fit(ToyModule(data))
    tb.finalize()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    # size_guidance 0 = keep every event (the default keeps 1 histogram)
    acc = EventAccumulator(str(tb_dir), size_guidance={"histograms": 0,
                                                       "scalars": 0})
    acc.Reload()
    tags = acc.Tags()
    assert "train/total" in tags["scalars"]
    hist_tags = tags["histograms"]
    assert any(t.startswith("params/") for t in hist_tags), hist_tags
    # histograms fire on the configured cadence
    some = [t for t in hist_tags if "atom_embedding" in t]
    assert some, hist_tags
    events = acc.Histograms(some[0])
    assert {e.step for e in events} == {2, 4}
    # scalar values round-trip as floats
    vals = acc.Scalars("train/total")
    assert all(np.isfinite(v.value) for v in vals)
