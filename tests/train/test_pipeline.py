"""End-to-end pipeline jobs over the reference fixture DB.

Mirrors the reference integration suite (tests/pipeline/test_pipeline.py):
compose a config, run the real `run()` for train/test/predict, assert on
metrics and prediction-DB contents.
"""

import shutil

import numpy as np
import pytest

from nabladft_tpu import pipelines
from nabladft_tpu.config import load_config
from nabladft_tpu.data.ase_codec import AseDatabase

pytestmark = pytest.mark.pipeline


@pytest.fixture()
def base_cfg(energy_db_path, tmp_path):
    local_db = tmp_path / "fixture.db"
    shutil.copy(energy_db_path, local_db)
    return {
        "job_type": "train",
        "name": "test-run",
        "seed": 1,
        "model": {
            "name": "painn",
            "kwargs": dict(hidden=16, n_interactions=2, n_rbf=8, max_neighbors=16),
            "loss_specs": {"energy": "l1", "forces": "l2norm"},
            "loss_coefs": {"energy": 1.0, "forces": 1.0},
        },
        "datamodule": {
            "kind": "energy",
            "source": str(local_db),
            "batch_size": 16,
            "val_fraction": 0.2,
        },
        "trainer": {
            "max_epochs": 2,
            "lr": 1e-3,
            "schedule": "constant",
            "log_every_n_steps": 1000,
        },
        "ckpt_dir": str(tmp_path / "ckpt"),
        "output_dir": str(tmp_path / "out"),
        "log_csv": True,
    }


def test_train_then_test_then_predict(base_cfg, tmp_path):
    metrics = pipelines.run(base_cfg)
    assert "val/loss" in metrics and np.isfinite(metrics["val/loss"])
    assert "val/energy/mae" in metrics and "val/forces/mae" in metrics
    # checkpoint written
    ckpt = tmp_path / "ckpt" / "last.ckpt"
    assert ckpt.exists()

    test_cfg = dict(base_cfg, job_type="test", ckpt_path=str(ckpt))
    tmetrics = pipelines.run(test_cfg)
    assert "test/energy/mae" in tmetrics

    out_db = tmp_path / "preds.db"
    pred_cfg = dict(base_cfg, job_type="predict", ckpt_path=str(ckpt),
                    output_db=str(out_db))
    pipelines.run(pred_cfg)
    db = AseDatabase(out_db)
    assert len(db) == 100
    rec = db.get(1)
    assert "energy_pred" in rec.data and "forces_pred" in rec.data
    assert rec.data["forces_pred"].shape == (rec.natoms, 3)
    # original targets preserved
    assert "energy" in rec.data


def test_cfg_validation():
    with pytest.raises(ValueError):
        pipelines.check_cfg({"job_type": "bogus"})
    with pytest.raises(ValueError):
        pipelines.check_cfg({"job_type": "train", "ckpt_path": "a", "pretrained": "b"})


def test_config_composition(tmp_path):
    cfg = load_config(
        "configs/painn-oc.yaml",
        overrides={"trainer": {"max_epochs": 1}, "dataset_name": "mydb"},
    )
    assert cfg["model"]["name"] == "painn"
    assert cfg["model"]["kwargs"]["hidden"] == 128
    assert cfg["trainer"]["max_epochs"] == 1
    assert cfg["trainer"]["lr"] == 1e-4
    assert cfg["ckpt_dir"] == "checkpoints/painn-oc"  # interpolation
    assert cfg["datamodule"]["source"] == "mydb"  # group interpolation


def test_all_model_configs_instantiate():
    """Every shipped model config must build its model."""
    from pathlib import Path

    import yaml

    from nabladft_tpu.models import create_model

    for f in sorted(Path("configs/model").glob("*.yaml")):
        cfg = yaml.safe_load(f.read_text())
        model = create_model(cfg["name"], **cfg.get("kwargs", {}))
        assert model is not None, f


def test_cli_override_parsing():
    from nabladft_tpu.cli import _parse_overrides

    out = _parse_overrides(
        ["trainer.max_epochs=3", "model.kwargs.hidden=64", "name=run-1",
         "datamodule.bucket_boundaries=[32, 64]", "trainer.lr=1e-3"]
    )
    assert out["trainer"]["max_epochs"] == 3
    assert out["model"]["kwargs"]["hidden"] == 64
    assert out["name"] == "run-1"
    assert out["datamodule"]["bucket_boundaries"] == [32, 64]
    assert out["trainer"]["lr"] == 1e-3
