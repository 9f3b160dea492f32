"""End-to-end Hamiltonian-task pipeline: synthetic DB → QHNet train/test."""

import numpy as np
import pytest

from nabladft_tpu import pipelines
from nabladft_tpu.data.hamiltonian_db import HamiltonianDatabase, HamiltonianRecord

pytestmark = pytest.mark.pipeline

ORBITALS = {1: [0, 0, 1], 6: [0, 0, 0, 1, 1, 2], 8: [0, 0, 0, 1, 1, 2]}
NORB = {z: sum(2 * l + 1 for l in o) for z, o in ORBITALS.items()}


@pytest.fixture()
def ham_db(tmp_path):
    rng = np.random.default_rng(0)
    db = HamiltonianDatabase(tmp_path / "ham.db", create=True)
    for z, orbs in ORBITALS.items():
        db.add_orbitals(z, np.asarray(orbs, np.int32))
    for i in range(8):
        zs = [6] + [1] * int(rng.integers(2, 5)) + ([8] if i % 2 else [])
        n = len(zs)
        no = sum(NORB[z] for z in zs)
        h = rng.normal(size=(no, no)).astype(np.float32)
        db.add(
            HamiltonianRecord(
                z=np.asarray(zs, np.int32),
                pos=rng.normal(size=(n, 3)).astype(np.float32) * 2,
                energy=-float(i),
                forces=rng.normal(size=(n, 3)).astype(np.float32),
                hamiltonian=(h + h.T) / 2,
                overlap=np.eye(no, dtype=np.float32),
                core=(h + h.T) / 4,
                moses_id=i,
                conformer_id=0,
            )
        )
    return tmp_path / "ham.db"


def test_qhnet_pipeline(ham_db, tmp_path):
    cfg = {
        "job_type": "train",
        "name": "qhnet-test",
        "seed": 0,
        "model": {
            "name": "qhnet",
            "kwargs": dict(hidden=8, bottle_hidden=4, num_layers=3, rbf_dim=8,
                           start_layer=1),
            "loss_specs": {"hamiltonian": "rmse_mae"},
            "loss_coefs": {"hamiltonian": 1.0},
        },
        "datamodule": {
            "kind": "hamiltonian",
            "source": str(ham_db),
            "batch_size": 4,
            "val_fraction": 0.25,
            "atom_boundaries": [8],
            "orbital_boundaries": [64],
        },
        "trainer": {
            "max_epochs": 1, "lr": 1e-3, "schedule": "constant",
            "log_every_n_steps": 1000, "ema_decay": 0.99,
        },
        "ckpt_dir": str(tmp_path / "ckpt"),
        "output_dir": str(tmp_path / "out"),
    }
    metrics = pipelines.run(cfg)
    assert "val/hamiltonian/mae" in metrics
    assert np.isfinite(metrics["val/hamiltonian/mae"])

    # predict must be rejected for Hamiltonian models (reference
    # utils/pipelines.py:83-84)
    bad = dict(cfg, job_type="predict", task="hamiltonian")
    with pytest.raises(ValueError):
        pipelines.run(bad)
