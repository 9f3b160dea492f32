"""Job pipelines: train / test / predict / optimize from one config.

The re-designed equivalent of the reference's nablaDFT/pipelines.py:29-128 +
nablaDFT/utils/pipelines.py: one `run(cfg)` dispatching on
``job_type ∈ {train, test, predict, optimize}``, with config validation,
global seeding, checkpoint restore / pretrained-registry loading, and the
prediction→ASE-db writer (reference utils/pipelines.py:87-113 semantics:
the output database mirrors the input rows plus `energy_pred`/`forces_pred`
in the data blob).
"""

from __future__ import annotations

import logging
import random
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from nabladft_tpu.data import DataModule, EnergyDataset, HamiltonianDataset
from nabladft_tpu.data.ase_codec import AseDatabase
from nabladft_tpu.models import create_model
from nabladft_tpu.train import CSVLogger, MultiLogger, StdoutLogger, Trainer, TrainerConfig

logger = logging.getLogger(__name__)

JOB_TYPES = ("train", "test", "predict", "optimize")


def seed_everything(seed: int) -> None:
    """Python/numpy determinism; JAX randomness is already key-based."""
    random.seed(seed)
    np.random.seed(seed)


def load_envs(path: str = ".env") -> None:
    """Export KEY=VALUE pairs from a .env file (reference loads .env via
    python-dotenv at startup, utils/pipelines.py:44-47 — e.g. WANDB keys)."""
    import os

    p = Path(path)
    if not p.exists():
        return
    for line in p.read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            key, _, value = line.partition("=")
            os.environ.setdefault(key.strip(), value.strip().strip("'\""))


def check_cfg(cfg: Dict[str, Any]) -> None:
    job = cfg.get("job_type")
    if job not in JOB_TYPES:
        raise ValueError(f"job_type must be one of {JOB_TYPES}, got {job!r}")
    if cfg.get("ckpt_path") and cfg.get("pretrained"):
        raise ValueError("ckpt_path and pretrained are mutually exclusive")
    is_ham = (
        cfg.get("task", "energy") == "hamiltonian"
        or cfg.get("datamodule", {}).get("kind") == "hamiltonian"
    )
    if job == "predict" and is_ham:
        raise ValueError("predict job is not supported for Hamiltonian models")


def build_datamodule(cfg: Dict[str, Any]) -> DataModule:
    d = cfg["datamodule"]
    kind = d.get("kind", "energy")
    common = dict(root=d.get("root"), )
    if kind == "energy":
        ds = EnergyDataset(
            d["source"],
            bucket_boundaries=tuple(d.get("bucket_boundaries", (32, 48, 64))),
            **common,
        )
    elif kind == "hamiltonian":
        ds = HamiltonianDataset(
            d["source"],
            atom_boundaries=tuple(d.get("atom_boundaries", (32, 48, 64))),
            orbital_boundaries=tuple(d.get("orbital_boundaries", (256, 384, 512, 640))),
            **common,
        )
    else:
        raise ValueError(f"unknown datamodule kind {kind!r}")
    return DataModule(
        ds,
        batch_size=d.get("batch_size", 32),
        val_fraction=d.get("val_fraction", 0.1),
        seed=cfg.get("seed", 42),
        num_workers=d.get("num_workers", 1),
    )


def build_trainer(cfg: Dict[str, Any], datamodule: Optional[DataModule] = None) -> Trainer:
    m = cfg["model"]
    kwargs = dict(m.get("kwargs", {}))
    # Hamiltonian models read the orbital basis convention from the
    # database's basisset table (reference hamiltonian_dataset.py:173-179)
    if (
        datamodule is not None
        and isinstance(datamodule.dataset, HamiltonianDataset)
        and "orbitals" not in kwargs
        and m["name"].lower() in ("qhnet", "phisnet")
    ):
        db = datamodule.dataset.db
        elements = db.elements()
        if elements:
            kwargs["orbitals"] = {
                int(z): tuple(int(l) for l in db.get_orbitals(z)) for z in elements
            }
    model = create_model(m["name"], **kwargs)
    eval_model = None
    # dropout-carrying models (Graphormer3D, EquiformerV2) train stochastic
    # and evaluate deterministic (reference Lightning train/eval modes)
    if hasattr(type(model), "deterministic") and "deterministic" not in kwargs:
        model = create_model(m["name"], **kwargs, deterministic=False)
        eval_model = create_model(m["name"], **kwargs, deterministic=True)
    t = dict(cfg.get("trainer", {}))
    for k, v in m.get("trainer_overrides", {}).items():
        t.setdefault(k, v)
    t.setdefault("loss_specs", m.get("loss_specs", {"energy": "l1", "forces": "l2norm"}))
    t.setdefault("loss_coefs", m.get("loss_coefs", {"energy": 1.0, "forces": 1.0}))
    if cfg.get("ckpt_dir"):
        t.setdefault("ckpt_dir", cfg["ckpt_dir"])
    tcfg = TrainerConfig(**t)
    loggers = [StdoutLogger()]
    if cfg.get("log_csv", True):
        out_dir = Path(cfg.get("output_dir", "outputs")) / cfg.get("name", m["name"])
        loggers.append(CSVLogger(out_dir / "metrics.csv"))
    if cfg.get("wandb", {}).get("enable"):
        from nabladft_tpu.train.loggers import WandbLogger

        loggers.append(WandbLogger(cfg["wandb"].get("project", "nablaDFT-tpu"),
                                   name=cfg.get("name")))
    if cfg.get("tensorboard", {}).get("enable"):
        from nabladft_tpu.train.loggers import TensorBoardLogger

        out_dir = Path(cfg.get("output_dir", "outputs")) / cfg.get("name", m["name"])
        loggers.append(TensorBoardLogger(out_dir / "tb"))
    return Trainer(model, tcfg, loggers=MultiLogger(loggers), eval_model=eval_model)


def write_predictions_to_db(
    input_db: Path, output_db: Path, predictions
) -> int:
    """Stream input rows to the output db with prediction fields added.

    `predictions` iterates dicts with mol_id / n_atoms / energy / forces
    (Trainer.predict output). Returns row count written.
    """
    src = AseDatabase(input_db)
    out = AseDatabase(output_db, create=True)
    n = 0
    for batch in predictions:
        energies = np.asarray(batch["energy"])
        forces = np.asarray(batch.get("forces")) if "forces" in batch else None
        for i, mol_id in enumerate(np.asarray(batch["mol_id"])):
            rec = src.get(int(mol_id))
            rec.data["energy_pred"] = [float(energies[i])]
            if forces is not None:
                na = int(batch["n_atoms"][i])
                rec.data["forces_pred"] = forces[i][:na].astype(np.float64)
            out.write(rec)
            n += 1
    return n


def run(cfg: Dict[str, Any]) -> Optional[Dict[str, float]]:
    """Entry point. Returns final metrics for train/test jobs."""
    check_cfg(cfg)
    load_envs()
    seed_everything(cfg.get("seed", 42))
    job = cfg["job_type"]

    if job == "optimize":
        from nabladft_tpu.optimize.task import run_optimize_job

        return run_optimize_job(cfg)

    dm = build_datamodule(cfg)
    trainer = build_trainer(cfg, dm)

    ckpt_path = cfg.get("ckpt_path")
    if cfg.get("pretrained"):
        from nabladft_tpu.models.pretrained import get_pretrained_params

        first = next(iter(dm.val_dataloader() if job != "train" else dm.train_dataloader()))
        trainer.init_state(first)
        params = get_pretrained_params(cfg["pretrained"], trainer.model, first)
        trainer.state = trainer.state.replace(params=params)
        ckpt_path = None

    if job == "train":
        try:
            return trainer.fit(dm, ckpt_path=ckpt_path)
        finally:
            trainer.loggers.finalize()  # reference close_loggers parity
    if ckpt_path:
        from flax import serialization

        first = next(iter(dm.test_dataloader()))
        trainer.init_state(first)
        trainer.state = serialization.from_bytes(
            trainer.state, Path(ckpt_path).read_bytes()
        )
    if job == "test":
        metrics = trainer.test(dm.test_dataloader())
        logger.info("test metrics: %s", metrics)
        return metrics
    if job == "predict":
        out_db = Path(cfg.get("output_db", "predictions.db"))
        input_db = Path(cfg["datamodule"]["source"])
        n = write_predictions_to_db(
            input_db, out_db, trainer.predict(dm.predict_dataloader())
        )
        logger.info("wrote %d prediction rows to %s", n, out_db)
        return None
    raise AssertionError(job)
