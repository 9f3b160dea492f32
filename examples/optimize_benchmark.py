"""Conformational-optimization benchmark: pct / pct_div / success metrics.

The reference reports `optimization pct %`, `pct_div` and `success pct %`
tables per pretrained model (README.md:705-778, paper §5.3) on the
trajectory splits. Offline (zero egress) neither the published checkpoints
nor the relaxed-trajectory splits with DFT minima are reachable, and the
committed 5-molecule fixture DB carries no DFT final energies — so this
driver produces the full metric pipeline with an explicit substitution:

  1. train PaiNN briefly on the committed 100-conformer fixture DB
     (real DFT energy/forces labels);
  2. relax the committed optimization fixture with the benchmark L-BFGS
     settings (fmax=0.05, <=100 steps, strong-Wolfe line search);
  3. relax the same molecules to near-convergence (fmax=5e-4, 1000 steps)
     with the same model and use those energies as the minimum reference.

The resulting pct measures *optimizer quality* — the fraction of the
model's achievable energy gain recovered at benchmark settings — which is
the part of the README benchmark that can be validated without egress.
With egress, swap step 1 for a registry checkpoint and step 3 for the DFT
final energies of the trajectory split and the numbers become directly
comparable to README.md:705-778.

Usage: python examples/optimize_benchmark.py [--epochs 80] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from nabladft_tpu.data.dataset import (
    BucketedLoader,
    EnergyDataset,
    LoaderConfig,
    seeded_random_split,
)
from nabladft_tpu.models import create_model
from nabladft_tpu.optimize.calculator import BatchwiseCalculator
from nabladft_tpu.optimize.lbfgs import lbfgs_relax
from nabladft_tpu.optimize.metrics import optimization_metrics
from nabladft_tpu.train import Trainer, TrainerConfig

FIXTURE_TRAIN_DB = Path("/root/reference/tests/data/raw/test_database.db")
FIXTURE_OPTIM_DB = Path("/root/reference/tests/data/raw/test_optim_database.db")


class SplitModule:
    def __init__(self, dataset, train_idx, val_idx, batch_size):
        self.dataset, self.train_idx, self.val_idx = dataset, train_idx, val_idx
        self.batch_size = batch_size

    def train_dataloader(self):
        return BucketedLoader(self.dataset, self.train_idx,
                              LoaderConfig(batch_size=self.batch_size, shuffle=True))

    def val_dataloader(self):
        return BucketedLoader(self.dataset, self.val_idx,
                              LoaderConfig(batch_size=self.batch_size, shuffle=False))


def train_painn(epochs: int, workdir: Path):
    import shutil

    db = workdir / FIXTURE_TRAIN_DB.name
    if not db.exists():
        shutil.copy(FIXTURE_TRAIN_DB, db)
    ds = EnergyDataset(str(db))
    n = len(ds)
    tr, va, _ = seeded_random_split(n, (0.9, 0.1, 0.0), seed=7)
    model = create_model(
        "painn", hidden=128, n_interactions=6, n_rbf=100, cutoff=5.0,
        max_neighbors=63, envelope="cosine", use_pallas="fused",
        compute_dtype="bfloat16", remat=False,
    )
    cfg = TrainerConfig(
        max_epochs=epochs, lr=5e-4, schedule="cosine",
        warmup_steps=50, total_steps=epochs * max(1, len(tr) // 32),
        loss_specs={"energy": "l1", "forces": "l2norm"},
        loss_coefs={"energy": 1.0, "forces": 30.0},
        force_grads="pallas", log_every_n_steps=200,
    )
    trainer = Trainer(model, cfg)
    trainer.fit(SplitModule(ds, tr, va, 32))
    return model, trainer.state.params


def train_schnet(epochs: int, workdir: Path):
    """Second, architecturally different model for the cross-model
    reference (see main's docstring)."""
    import shutil

    db = workdir / FIXTURE_TRAIN_DB.name
    if not db.exists():
        shutil.copy(FIXTURE_TRAIN_DB, db)
    ds = EnergyDataset(str(db))
    tr, va, _ = seeded_random_split(len(ds), (0.9, 0.1, 0.0), seed=7)
    model = create_model(
        "schnet", hidden=128, n_interactions=6, n_rbf=100, cutoff=5.0,
        max_neighbors=63, use_pallas="fused", compute_dtype="bfloat16",
        remat=False,
    )
    cfg = TrainerConfig(
        max_epochs=epochs, lr=5e-4, schedule="cosine",
        warmup_steps=50, total_steps=epochs * max(1, len(tr) // 32),
        loss_specs={"energy": "l1", "forces": "l2norm"},
        loss_coefs={"energy": 1.0, "forces": 30.0},
        force_grads="pallas", log_every_n_steps=200,
    )
    trainer = Trainer(model, cfg)
    trainer.fit(SplitModule(ds, tr, va, 32))
    return model, trainer.state.params


def main():
    """The committed fixture DB stores NO energies (all 5 rows have
    energy=None — verified), so 'pct vs the input DB's stored energies' is
    not computable; the reference's own integration test only asserts
    relaxed < initial per model (tests/optimization/test_optim_pipelines.py:9-28).
    This driver therefore reports, per relaxing model:

      * the reference-test parity assertion (all relaxed energies strictly
        below initial);
      * self-reference metrics (tight self-relaxation as minimum) — the
        optimizer-quality number of earlier rounds;
      * CROSS-MODEL metrics with per-model energy alignment at the shared
        initial geometry: the external reference is the OTHER
        architecture's tight relaxation drop transported onto this model's
        scale (E_ref = E_A(x_init) - [E_B(x_init) - E_B(x_B*)]). Absolute
        scales of independently trained surfaces are incomparable — the
        drop is the transportable quantity — so pct measures how much of
        the other model's achievable gain this model recovers, which no
        self-relaxation can flatter.
    """
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--fmax", type=float, default=0.05)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workdir", default="/tmp/optbench")
    args = ap.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    models = {}
    models["painn"] = train_painn(args.epochs, workdir)
    models["schnet"] = train_schnet(args.epochs, workdir)
    t_train = time.time() - t0

    # the committed optimization fixture: 5 drug-like conformers
    # (parse_energy_db falls back to a tmp cache for read-only source dirs)
    opt_ds = EnergyDataset(str(FIXTURE_OPTIM_DB))
    loader = BucketedLoader(opt_ds, config=LoaderConfig(batch_size=8, shuffle=False))
    batches = list(loader)

    runs = {}
    for name, (model, params) in models.items():
        calc = BatchwiseCalculator(model, params)
        e_init, e_bench, e_tight, pos_tight, pos0 = [], [], [], [], []
        for batch in batches:
            mask = np.asarray(batch.graph_mask)
            e0 = np.asarray(calc(batch)[0])
            bench = lbfgs_relax(calc, batch, fmax=args.fmax, max_steps=args.steps,
                                line_search="wolfe")
            tight = lbfgs_relax(calc, batch, fmax=5e-4, max_steps=1000,
                                line_search="wolfe")
            e_init.extend(e0[mask].tolist())
            e_bench.extend(np.asarray(bench.energy)[mask].tolist())
            e_tight.extend(np.asarray(tight.energy)[mask].tolist())
            pos_tight.append(np.asarray(tight.pos))
            pos0.append(np.asarray(batch.pos))
        runs[name] = dict(
            calc=calc, e_init=np.asarray(e_init), e_bench=np.asarray(e_bench),
            e_tight=np.asarray(e_tight), pos_tight=pos_tight,
        )

    result = {
        "fmax": args.fmax, "steps": args.steps,
        "train_seconds": round(t_train, 1),
        "reference_note": "fixture optim DB stores no energies (energy=None "
                          "in all 5 rows); external reference = cross-model "
                          "tight minima, matching the reference test's "
                          "relaxed<initial assertion protocol",
    }
    names = list(runs)
    for name in names:
        r = runs[name]
        other = [n for n in names if n != name][0]
        ro = runs[other]
        # reference-test parity: every relaxed energy strictly below initial
        # (tests/optimization/test_optim_pipelines.py:9-28)
        lowered = bool(np.all(r["e_bench"] < r["e_init"]))
        self_m = optimization_metrics(r["e_init"], r["e_bench"], r["e_tight"])
        # cross-model reference with per-model energy alignment at the
        # shared initial geometry: two independently trained surfaces carry
        # arbitrary relative offsets (r4's raw E_A(x_B*) reference put every
        # pct negative -> 100% "diverged"), so the transportable quantity is
        # the relaxation DROP. The reference final energy on THIS model's
        # scale is E_A(x_init) - [E_B(x_init) - E_B(x_B*_tight)]: pct then
        # measures how much of the OTHER architecture's achievable gain this
        # model's benchmark relaxation recovers, and success% compares the
        # two drops at 1 kcal/mol.
        e_ref_aligned = r["e_init"] - (ro["e_init"] - ro["e_tight"])
        cross_m = optimization_metrics(r["e_init"], r["e_bench"], e_ref_aligned)
        # diagnostic (not a pct input): the other model's tight minimum
        # re-evaluated on this surface, as a drop from this model's initial
        # energy — how far downhill B's minimum is on A's surface.
        e_cross = []
        for batch, pt in zip(batches, ro["pos_tight"]):
            mask = np.asarray(batch.graph_mask)
            e = np.asarray(r["calc"](batch.replace(pos=pt))[0])
            e_cross.extend(e[mask].tolist())
        cross_m["other_minimum_drop_on_this_surface"] = float(
            np.mean(r["e_init"] - np.asarray(e_cross))
        )
        # geometric agreement of the two models' tight minima
        disp = [
            float(np.sqrt(((a - b) ** 2).sum(-1)[np.asarray(batch.node_mask)].mean()))
            for batch, a, b in zip(batches, r["pos_tight"], ro["pos_tight"])
        ]
        result[name] = {
            "all_relaxed_below_initial": lowered,
            "self_reference": {k: round(v, 4) for k, v in self_m.items()},
            f"cross_reference_vs_{other}": {
                k: round(v, 4) for k, v in cross_m.items()
            },
            "tight_minima_rmsd_vs_other_A": round(float(np.mean(disp)), 4),
        }
    print(json.dumps(result))
    out = Path(args.out) if args.out else Path(__file__).resolve().parent.parent / "results" / "optimize_benchmark.json"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
