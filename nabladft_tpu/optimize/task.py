"""Batchwise optimization job: database → on-device relaxation → database.

Mirrors the reference BatchwiseOptimizeTask (optimization/task.py:9-73):
iterate the input ASE database in batches, relax each batch, write relaxed
structures plus the model's final energy/forces into the output database,
preserving moses_id / conformation_id / smiles and storing
``data["model_energy"]`` / ``data["model_forces"]`` exactly like the
reference writer (task.py:56-69).

Unlike the reference (one host↔device round trip per L-BFGS step), each
batch here is one compiled `lax.while_loop` — molecules are grouped into
the framework's standard atom-count buckets so every bucket compiles once.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from nabladft_tpu.data.ase_codec import AseDatabase, AtomsRecord
from nabladft_tpu.data.dataset import EnergyDataset, LoaderConfig, BucketedLoader
from nabladft_tpu.optimize.calculator import BatchwiseCalculator
from nabladft_tpu.optimize.lbfgs import lbfgs_relax

logger = logging.getLogger(__name__)


class BatchwiseOptimizeTask:
    def __init__(
        self,
        input_db: Path,
        output_db: Path,
        calculator: BatchwiseCalculator,
        batch_size: int = 32,
        fmax: float = 0.05,
        steps: int = 500,
        memory: int = 100,
        maxstep: float = 0.2,
        damping: float = 1.0,
        alpha: float = 1.0,
        bucket_boundaries=(32, 48, 64),
        trajectory_dir: Optional[Path] = None,
        trajectory_interval: int = 0,
        restart_path: Optional[Path] = None,
        line_search: str = "off",
    ):
        # trajectory_dir: write per-molecule extxyz trajectories. With
        # trajectory_interval == 0 only endpoints are written (initial +
        # relaxed); with interval N > 0 the compiled loop runs in N-step
        # chunks and every chunk's frame is appended — the reference's
        # per-step dump (optimizers.py:269-277) at a configurable stride.
        # restart_path: pickle of (batch index, solver state) after every
        # chunk/batch; rerunning with the same path resumes mid-run
        # (reference optimizers.py:283-290).
        self.trajectory_dir = Path(trajectory_dir) if trajectory_dir else None
        self.trajectory_interval = int(trajectory_interval)
        self.restart_path = Path(restart_path) if restart_path else None
        self.line_search = line_search
        self.input_db = Path(input_db)
        self.output_db = Path(output_db)
        self.calculator = calculator
        self.batch_size = batch_size
        self.fmax = fmax
        self.steps = steps
        self.kw = dict(
            memory=memory, maxstep=maxstep, damping=damping, alpha=alpha,
            line_search=line_search,
        )
        self.bucket_boundaries = bucket_boundaries
        self._jit_relax = jax.jit(
            lambda batch: lbfgs_relax(
                self.calculator, batch, fmax=self.fmax, max_steps=self.steps, **self.kw
            )
        )

    def _relax_batch(self, batch, batch_index: int):
        """One-shot compiled relax, or chunked with trajectory/restart."""
        if self.trajectory_interval <= 0 and self.restart_path is None:
            return self._jit_relax(batch)
        from nabladft_tpu.optimize.lbfgs import load_state, relax_chunked, save_state

        frames = {}

        def on_chunk(it, st):
            pos = np.asarray(st.pos)
            e = np.asarray(st.energy)
            for slot in range(batch.num_mols):
                if batch.graph_mask[slot]:
                    frames.setdefault(slot, []).append(
                        (pos[slot].copy(), float(e[slot]))
                    )
            if self.restart_path is not None:
                save_state(st, self.restart_path)
                self.restart_path.with_suffix(".meta").write_text(str(batch_index))

        resume = None
        if self.restart_path is not None and self.restart_path.exists():
            meta = self.restart_path.with_suffix(".meta")
            if meta.exists() and int(meta.read_text()) == batch_index:
                resume = load_state(self.restart_path)
        result, _ = relax_chunked(
            self.calculator, batch, fmax=self.fmax, max_steps=self.steps,
            interval=max(self.trajectory_interval, 1) if self.trajectory_interval
            else self.steps,
            on_chunk=on_chunk, resume_state=resume, **self.kw,
        )
        if self.trajectory_dir is not None and self.trajectory_interval > 0:
            from nabladft_tpu.utils.xyz import write_extxyz

            self.trajectory_dir.mkdir(parents=True, exist_ok=True)
            for slot, frs in frames.items():
                mol_id = int(batch.mol_id[slot])
                n = int(batch.node_mask[slot].sum())
                write_extxyz(
                    self.trajectory_dir / f"mol_{mol_id}.extxyz",
                    np.asarray(batch.z[slot][:n]),
                    [f[0][:n] for f in frs],
                    energies=[f[1] for f in frs],
                )
        return result

    def run(self) -> Dict[str, Any]:
        dataset = EnergyDataset(
            str(self.input_db), bucket_boundaries=self.bucket_boundaries
        )
        loader = BucketedLoader(
            dataset,
            config=LoaderConfig(batch_size=self.batch_size, shuffle=False, drop_last=False),
        )
        src = AseDatabase(self.input_db)
        out = AseDatabase(self.output_db, create=True)
        n_done, n_converged, total_steps = 0, 0, 0
        results: Dict[int, AtomsRecord] = {}
        for batch_index, batch in enumerate(loader):
            result = self._relax_batch(batch, batch_index)
            pos = np.asarray(result.pos)
            energy = np.asarray(result.energy)
            forces = np.asarray(result.forces)
            converged = np.asarray(result.converged)
            total_steps += int(result.nsteps)
            for slot in range(batch.num_mols):
                if not batch.graph_mask[slot]:
                    continue
                mol_id = int(batch.mol_id[slot])
                n = int(batch.node_mask[slot].sum())
                rec = src.get(mol_id)
                data = dict(rec.data)
                data["model_energy"] = [float(energy[slot])]
                data["model_forces"] = forces[slot][:n].astype(np.float64)
                results[mol_id] = AtomsRecord(
                    numbers=rec.numbers,
                    positions=pos[slot][:n].astype(np.float64),
                    cell=rec.cell,
                    pbc=rec.pbc,
                    key_value_pairs=rec.key_value_pairs,
                    data=data,
                )
                if self.trajectory_dir is not None and self.trajectory_interval == 0:
                    from nabladft_tpu.utils.xyz import write_extxyz

                    self.trajectory_dir.mkdir(parents=True, exist_ok=True)
                    write_extxyz(
                        self.trajectory_dir / f"mol_{mol_id}.extxyz",
                        rec.numbers,
                        [rec.positions, pos[slot][:n]],
                        energies=[float("nan"), float(energy[slot])],
                    )
                n_done += 1
                n_converged += int(converged[slot])
        # write in input-row order (reference task.py iterates input order)
        for mol_id in sorted(results):
            out.write(results[mol_id])
        stats = {
            "n_molecules": n_done,
            "n_converged": n_converged,
            "converged_fraction": n_converged / max(n_done, 1),
            "total_lbfgs_steps": total_steps,
        }
        logger.info("optimize finished: %s", stats)
        return stats


def run_optimize_job(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Pipeline entry for ``job_type: optimize``."""
    from flax import serialization

    from nabladft_tpu.models import create_model

    m = cfg["model"]
    o = cfg.get("optimize", {})
    kwargs = dict(m.get("kwargs", {}))
    # relaxation only needs first-order forces — use the fused Pallas path
    if (
        m["name"].lower() == "painn"
        and o.get("use_pallas", True)
        and jax.default_backend() == "tpu"
    ):
        kwargs.setdefault("use_pallas", "fused")
    model = create_model(m["name"], **kwargs)
    input_db = Path(cfg["datamodule"]["source"])
    # initialize params from a probe batch, then restore the checkpoint
    dataset = EnergyDataset(
        str(input_db), bucket_boundaries=tuple(o.get("bucket_boundaries", (32, 48, 64)))
    )
    loader = BucketedLoader(dataset, config=LoaderConfig(batch_size=2, shuffle=False))
    probe = next(iter(loader))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), probe)
    ckpt_path = cfg.get("ckpt_path")
    if ckpt_path:
        blob = Path(ckpt_path).read_bytes()
        raw = serialization.msgpack_restore(blob)
        if "params" in raw:  # full TrainState checkpoint: pull params out
            raw = raw["params"]
        variables = serialization.from_state_dict(variables, raw)
    calc = BatchwiseCalculator(
        model,
        variables,
        energy_unit=o.get("energy_unit", "Hartree"),
        position_unit=o.get("position_unit", "Ang"),
    )
    task = BatchwiseOptimizeTask(
        input_db=input_db,
        output_db=Path(cfg.get("output_db", "optimized.db")),
        calculator=calc,
        batch_size=o.get("batch_size", 32),
        fmax=o.get("fmax", 0.05),
        steps=o.get("steps", 500),
        memory=o.get("memory", 100),
        maxstep=o.get("maxstep", 0.2),
        bucket_boundaries=tuple(o.get("bucket_boundaries", (32, 48, 64))),
        trajectory_dir=o.get("trajectory_dir"),
        trajectory_interval=o.get("trajectory_interval", 0),
        restart_path=o.get("restart_path"),
        line_search=o.get("line_search", "off"),
    )
    return task.run()
