"""Accuracy-parity experiment: train the energy zoo on real nablaDFT data.

With network egress this trains on the published `dataset_train_tiny` split
(2k conformers) and evaluates against the README MAE tables
(reference README.md:267-280 SchNet tiny 1.17e-2 Eh / 0.44e-2 Eh/Å;
README.md:312-325 PaiNN tiny 0.82e-2 / 0.37e-2). Without egress (this
environment) it falls back to the reference's committed 100-conformer
fixture DB (real DFT labels, tests/data/raw/test_database.db) with an
80/10/10 split — a learnability datapoint, not split parity; the gap
analysis lives in STATUS.md.

Usage: python examples/train_accuracy.py [--model <any energy model>] [--out FILE]
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
    DataModule,
    EnergyDataset,
    LoaderConfig,
    seeded_random_split,
)
from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig

FIXTURE_DB = Path("/root/reference/tests/data/raw/test_database.db")

MODEL_KW = {
    # config/model/schnet.yaml: 6 interactions, 128 basis, RBF 100, cutoff 5
    "schnet": dict(hidden=128, n_interactions=6, n_rbf=100, cutoff=5.0,
                   max_neighbors=63),
    # config/model/painn.yaml (spk flavor: cosine cutoff)
    "painn": dict(hidden=128, n_interactions=6, n_rbf=100, cutoff=5.0,
                  max_neighbors=63, envelope="cosine", use_pallas="fused",
                  compute_dtype="bfloat16", remat=False),
    # the rest of the energy zoo at reference capacity (configs/model/*)
    "dimenetpp": dict(),
    "graphormer3d": dict(),
    "gemnet_oc": dict(num_blocks=4, emb_size_atom=256, emb_size_edge=512,
                      num_radial=128, num_spherical=7, cutoff=12.0,
                      max_neighbors=30, max_neighbors_qint=8),
    # bf16 like the bench path (tracks fp32 within 5%,
    # tests/models/test_bf16_zoo.py); the fp32 fused path at the fixture's
    # 64-atom bucket hung in compile on the r5 rerun
    "escn": dict(num_layers=8, l_max=6, m_max=2, sphere_channels=128,
                 hidden=256, edge_channels=128, cutoff=8.0, max_neighbors=40,
                 num_sphere_samples=128, compute_dtype="bfloat16"),
    # bf16 compute: the fused path's fp32 force-block backward exceeds
    # VMEM (equiformer_v2._pallas_enabled); bf16 matches the bench path
    # and tracks fp32 within 5% (tests/models/test_bf16_zoo.py)
    "equiformer_v2": dict(num_layers=12, sphere_channels=128,
                          attn_alpha_channels=64, num_heads=8,
                          attn_value_channels=16, ffn_hidden_channels=128,
                          l_max=6, m_max=2, cutoff=12.0, max_neighbors=30,
                          compute_dtype="bfloat16"),
}

# README tiny-split rows: [energy MAE Eh, forces MAE Eh/Å]
# (README.md:224-522; DimeNet++ tiny is published non-converged at 0.43 Eh)
REFERENCE_TINY_MAE = {
    "schnet": [1.17e-2, 0.44e-2],
    "painn": [0.82e-2, 0.37e-2],
    "dimenetpp": [42.84e-2, 1.31e-2],
    "graphormer3d": [1.54e-2, 1.11e-2],
    "gemnet_oc": [2.79e-2, 0.14e-2],
    "escn": [1.87e-2, 0.10e-2],
    "equiformer_v2": [2.81e-2, 0.30e-2],
}


def try_download_tiny(root: Path):
    try:
        ds = EnergyDataset("dataset_train_tiny", root=root)
        test = EnergyDataset("dataset_test_conformations_tiny", root=root)
        return ds, test, "dataset_train_tiny"
    except Exception as e:  # zero-egress environments
        print(f"tiny split unavailable ({type(e).__name__}: {e}); "
              f"falling back to the 100-conformer reference fixture")
        return None, None, None


class SplitModule:
    """Train/val loaders over explicit index arrays."""

    def __init__(self, dataset, train_idx, val_idx, batch_size):
        self.dataset, self.train_idx, self.val_idx = dataset, train_idx, val_idx
        self.batch_size = batch_size

    def train_dataloader(self):
        return BucketedLoader(self.dataset, self.train_idx,
                              LoaderConfig(batch_size=self.batch_size, shuffle=True))

    def val_dataloader(self):
        return BucketedLoader(self.dataset, self.val_idx,
                              LoaderConfig(batch_size=self.batch_size, shuffle=False))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="schnet", choices=sorted(MODEL_KW))
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-epochs", type=int, default=1500)
    # hyperparameter overrides (VERDICT r4 #7: eSCN's 0.127 Eh on the same
    # split/architecture family as EqV2's 0.093 points at the run config,
    # not capacity — these let the queue sweep it without code edits)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--plateau-patience", type=int, default=30)
    ap.add_argument("--early-stop", type=int, default=200)
    ap.add_argument("--energy-coef", type=float, default=1.0)
    ap.add_argument("--force-coef", type=float, default=1.0)
    # wall-clock bound: stop fit after this many seconds but still run
    # test + write the JSON (queue slices on the shared chip — an outer
    # `timeout` leaves no artifact at all, which is how the r5 eSCN rerun
    # burned 3400 s for nothing)
    ap.add_argument("--max-seconds", type=float, default=None)
    # force the XLA path: the eSCN fused kernel is unvalidated at the
    # fixture's 64-atom bucket in fp32 (the r5 rerun hung in compile)
    ap.add_argument("--no-pallas", action="store_true")
    # cross-slice resume: with a ckpt dir, each wall-bounded slice resumes
    # from the previous slice's last checkpoint (optimizer/plateau state
    # included) and tests on the cross-slice best-val params — accuracy
    # runs accumulate across queue slices instead of restarting.
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()

    ds, test_ds, split_name = try_download_tiny(Path("datasets"))
    if ds is None:
        # copy the read-only reference fixture to a workdir so the dataset's
        # sidecar cache never lands in the reference tree
        import shutil

        local = Path("datasets/fixture")
        local.mkdir(parents=True, exist_ok=True)
        local_db = local / FIXTURE_DB.name
        if not local_db.exists():
            shutil.copy(FIXTURE_DB, local_db)
        ds = EnergyDataset(local_db)
        idx = seeded_random_split(len(ds), [0.8, 0.1, 0.1], seed=7)
        train_idx, val_idx, test_idx = idx
        # memory-bound models: gemnet_oc's quadruplets at the fixture's
        # 64-atom bucket need B=16. equiformer_v2 trains at B=32 since the
        # A>48 receiver-cap fix in ops/pallas/eqv2_attn._r_caps (the bwd
        # kernel was 222 KB over the 127 MB scoped-VMEM budget at r=4;
        # verified by scripts/compile_check_eqv2_a64.py on v5e).
        # dimenetpp: the fp32 derivative-forces train step at the fixture's
        # 64-atom bucket needs 17.9 GB at B=32 (64M [32,64,32,256] HLO
        # temps in the reverse-over-reverse pass) — B=16 fits in 15.75 GB
        bs = {"gemnet_oc": 16, "dimenetpp": 16}.get(args.model, 32)
        dm = SplitModule(ds, train_idx, val_idx, batch_size=bs)
        test_loader = BucketedLoader(ds, test_idx, LoaderConfig(batch_size=bs))
        split_name = "fixture-100 (80/10/10)"
        n_train = len(train_idx)
    else:
        dm = DataModule(ds, batch_size=100, val_fraction=0.05)
        test_loader = BucketedLoader(test_ds, None, LoaderConfig(batch_size=100))
        n_train = len(dm.train_idx)

    # per-atom energy standardization from the train rows
    recs = ds.records
    e = recs.energy_all if hasattr(recs, "energy_all") else recs.energy
    na = recs.natoms_all
    per_atom = e / np.maximum(na, 1)
    mean, std = float(per_atom.mean()), float(e.std() / np.sqrt(na.mean()))

    kw = dict(MODEL_KW[args.model])
    if args.no_pallas:
        kw["use_pallas"] = False
    model = create_model(args.model, energy_mean=mean, energy_std=max(std, 1e-6),
                         **kw)
    # dimenetpp: reference lr (config/dimenetplusplus.yaml optimizer.lr
    # 1e-4) + warmup — even with normalized aggregations its init
    # gradients are the zoo's largest
    lr = {"schnet": 1e-4, "painn": 5e-4, "dimenetpp": 1e-4,
          "graphormer3d": 3e-4, "gemnet_oc": 2e-4, "escn": 2e-4,
          "equiformer_v2": 2e-4}[args.model]
    if args.lr is not None:
        lr = args.lr
    cfg = TrainerConfig(
        max_epochs=args.max_epochs, lr=lr,
        warmup_steps=100 if args.model == "dimenetpp" else 0,
        schedule="plateau", plateau_factor=0.8,
        plateau_patience=args.plateau_patience,
        plateau_min_lr=1e-6, stop_at_lr=2e-6,
        early_stopping_patience=args.early_stop, log_every_n_steps=200,
        loss_specs={"energy": "mse", "forces": "mse"},
        loss_coefs={"energy": args.energy_coef, "forces": args.force_coef},
        force_grads="pallas" if args.model == "painn" else "direct",
        monitor="val/loss",
        max_seconds=args.max_seconds,
        ckpt_dir=args.ckpt_dir,
    )
    trainer = Trainer(model, cfg)
    resume_path = None
    if args.ckpt_dir:
        lp = trainer.ckpt.last_path()
        if lp is not None and lp.exists():
            resume_path = str(lp)
            print(f"resuming from {resume_path}", flush=True)
    t0 = time.time()
    trainer.fit(dm, ckpt_path=resume_path)
    wall = time.time() - t0
    if args.ckpt_dir:
        # test on the CROSS-slice best (the ckpt index spans slices; the
        # in-memory best snapshot only covers this one)
        bp = trainer.ckpt.best_path()
        if bp is not None and bp.exists():
            trainer.state, _ = trainer.ckpt.restore(trainer.state, bp)
            trainer.cfg.restore_best_for_test = False
    test = trainer.test(test_loader)
    result = {
        "model": args.model,
        "split": split_name,
        "n_train": int(n_train),
        "test_energy_mae_eh": test.get("test/energy/mae"),
        "test_forces_mae_eh_per_a": test.get("test/forces/mae"),
        "wall_seconds": round(wall, 1),
        "reference_tiny_mae": REFERENCE_TINY_MAE[args.model],
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
