"""DB→DB optimization task over the reference optim fixture database."""

import numpy as np
import pytest

from nabladft_tpu.data.ase_codec import AseDatabase
from nabladft_tpu.optimize.metrics import optimization_metrics
from nabladft_tpu.optimize.task import BatchwiseOptimizeTask

from .test_lbfgs import harmonic_ef

pytestmark = pytest.mark.optimization


def test_optimize_task_end_to_end(optim_db_path, tmp_path):
    import shutil

    local = tmp_path / "in.db"
    shutil.copy(optim_db_path, local)
    n_in = len(AseDatabase(local))
    out_db = tmp_path / "out.db"
    task = BatchwiseOptimizeTask(
        input_db=local,
        output_db=out_db,
        calculator=harmonic_ef(k=0.5, r0=2.0),
        batch_size=8,
        fmax=0.05,
        steps=30,
        memory=10,
    )
    stats = task.run()
    assert stats["n_molecules"] == n_in
    out = AseDatabase(out_db)
    assert len(out) == n_in
    rec = out.get(1)
    assert "model_energy" in rec.data and "model_forces" in rec.data
    assert rec.data["model_forces"].shape == (rec.natoms, 3)
    # metadata preserved from the input rows
    src_rec = AseDatabase(local).get(1)
    for key in ("moses_id", "conformation_id"):
        if key in src_rec.key_value_pairs:
            assert rec.key_value_pairs[key] == src_rec.key_value_pairs[key]
    # positions actually moved
    assert not np.allclose(rec.positions, src_rec.positions)


def test_optimization_metrics():
    e_init = np.array([0.0, 0.0, 0.0])
    e_model = np.array([-0.9, -1.2, 5.0])  # third diverged upward
    e_dft = np.array([-1.0, -1.0, -1.0])
    m = optimization_metrics(e_init, e_model, e_dft)
    assert m["pct_div"] == pytest.approx(100.0 / 3)
    assert m["optimization_pct"] == pytest.approx((90.0 + 120.0) / 2)
    assert m["success_pct"] == pytest.approx(0.0)
    m2 = optimization_metrics(e_init, np.array([-1.0005, -1.0, -1.0]), e_dft)
    assert m2["success_pct"] == pytest.approx(100.0)


def test_optimize_task_per_step_trajectories(optim_db_path, tmp_path):
    """trajectory_interval > 0: per-step extxyz frames + wolfe search
    (reference optimizers.py:269-277 per-step dump)."""
    import shutil

    local = tmp_path / "in.db"
    shutil.copy(optim_db_path, local)
    traj = tmp_path / "traj"
    task = BatchwiseOptimizeTask(
        input_db=local,
        output_db=tmp_path / "out.db",
        calculator=harmonic_ef(k=0.5, r0=2.0),
        batch_size=8,
        fmax=0.05,
        steps=20,
        memory=10,
        trajectory_dir=traj,
        trajectory_interval=5,
        line_search="wolfe",
        restart_path=tmp_path / "restart.pkl",
    )
    stats = task.run()
    files = sorted(traj.glob("mol_*.extxyz"))
    assert len(files) == stats["n_molecules"]
    text = files[0].read_text()
    n_frames = text.count("energy=")
    assert n_frames >= 3  # initial + >=2 chunk frames
    assert (tmp_path / "restart.pkl").exists()
