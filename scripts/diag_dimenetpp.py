"""Diagnose the round-3 DimeNet++ fixture divergence (VERDICT r4 item 2).

Trains DimeNet++ exactly as examples/train_accuracy.py does on the
80-molecule fixture split, but logs the full per-validation trajectory
(train loss, grad norm, val MAE, lr) to a JSON file so the divergence
point is visible. Bounded epochs; no checkpoint restore.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from nabladft_tpu.data.dataset import (
    BucketedLoader,
    EnergyDataset,
    LoaderConfig,
    seeded_random_split,
)
from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig

FIXTURE_DB = Path("/root/reference/tests/data/raw/test_database.db")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--grad-clip", type=float, default=None)
    ap.add_argument("--out", default="results/diag_dimenetpp.json")
    args = ap.parse_args()

    import shutil

    local = Path("datasets/fixture")
    local.mkdir(parents=True, exist_ok=True)
    local_db = local / FIXTURE_DB.name
    if not local_db.exists():
        shutil.copy(FIXTURE_DB, local_db)
    ds = EnergyDataset(local_db)
    train_idx, val_idx, test_idx = seeded_random_split(len(ds), [0.8, 0.1, 0.1], seed=7)

    recs = ds.records
    e = recs.energy_all if hasattr(recs, "energy_all") else recs.energy
    na = recs.natoms_all
    per_atom = e / np.maximum(na, 1)
    mean, std = float(per_atom.mean()), float(e.std() / np.sqrt(na.mean()))

    model = create_model("dimenetpp", energy_mean=mean, energy_std=max(std, 1e-6))
    cfg = TrainerConfig(
        max_epochs=args.epochs, lr=args.lr, warmup_steps=100,
        schedule="plateau", plateau_factor=0.8, plateau_patience=30,
        plateau_min_lr=1e-6, stop_at_lr=2e-6, grad_clip=args.grad_clip,
        early_stopping_patience=10**9, log_every_n_steps=10**9,
        loss_specs={"energy": "mse", "forces": "mse"},
        loss_coefs={"energy": 1.0, "forces": 1.0},
        force_grads="direct", monitor="val/loss",
    )
    trainer = Trainer(model, cfg)
    train_loader = BucketedLoader(ds, train_idx, LoaderConfig(batch_size=32, shuffle=True))
    val_loader = BucketedLoader(ds, val_idx, LoaderConfig(batch_size=32))
    test_loader = BucketedLoader(ds, test_idx, LoaderConfig(batch_size=32))

    first = next(iter(train_loader))
    trainer.init_state(first)
    hist = []
    t0 = time.time()
    for epoch in range(args.epochs):
        ep = {"epoch": epoch}
        gsum, lsum, n, skip = 0.0, 0.0, 0, 0.0
        for batch in train_loader:
            trainer.state, m = trainer._jit_train_step(trainer.state, batch)
            gsum += float(m["grad_norm"]); lsum += float(m["train/total"])
            skip += float(m["skipped_nonfinite"]); n += 1
        ep.update(train_loss=lsum / n, grad_norm=gsum / n, skipped=skip)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            val = trainer.validate(val_loader)
            from nabladft_tpu.train.engine import set_learning_rate, current_learning_rate
            new_lr = trainer.plateau.step(val["val/loss"], cfg.lr)
            trainer.state = trainer.state.replace(
                opt_state=set_learning_rate(trainer.state.opt_state, new_lr))
            ep.update(val_loss=val.get("val/loss"),
                      val_e_mae=val.get("val/energy/mae"),
                      val_f_mae=val.get("val/forces/mae"),
                      lr=current_learning_rate(trainer.state.opt_state))
            print(json.dumps(ep), flush=True)
        hist.append(ep)
    test = trainer.test(test_loader)
    out = {"history": hist, "test": test, "wall": time.time() - t0,
           "lr": args.lr, "grad_clip": args.grad_clip}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print("test:", json.dumps(test))


if __name__ == "__main__":
    main()
