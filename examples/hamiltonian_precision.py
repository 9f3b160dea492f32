"""Hamiltonian-precision trainability: overfit QHNet / PhiSNet into the
1e-4 Eh decade (VERDICT r2 item 3).

The published targets are H-MAE ~1e-4 Eh (PhiSNet 1.9e-4, QHNet 9.8e-4 on
the test splits — reference README.md:524-656). Split parity needs egress;
what IS demonstrable offline is that the models can train into that
precision decade at all. This script overfits a small set of REAL fixture
geometries with physically-scaled, rotation-COVARIANT targets:

  * S from analytic overlaps of single-exponent solid-harmonic Gaussians
    (s/p shells; closed-form s-s, s-p, p-p integrals) — entries O(0.01-1),
    exactly the symmetry structure of a real overlap matrix;
  * H from an extended-Hückel model H_uv = 0.5·K·(h_u + h_v)·S_uv with
    per-shell energies down to -11 Eh (carbon 1s scale);
  * core (PhiSNet) = the same with a different K.

Covariance matters: a non-covariant synthetic target would put a floor on
the achievable MAE of an equivariant model; these targets are functions of
geometry with the same transformation law as the real matrices.

Usage: python examples/hamiltonian_precision.py --model {qhnet,phisnet}
       [--n-mols 8] [--max-steps 30000] [--target 1e-4] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ANGSTROM_TO_BOHR = 1.8897259886

# single-exponent shells per element: (l, exponent, h_shell [Eh])
SHELLS = {
    1: [(0, 1.30, -0.50), (0, 0.30, -0.20), (1, 1.00, -0.15)],
    6: [(0, 70.0, -11.0), (0, 2.20, -0.90), (0, 0.50, -0.35),
        (1, 1.80, -0.45), (1, 0.45, -0.20)],
    7: [(0, 95.0, -15.0), (0, 2.80, -1.10), (0, 0.65, -0.45),
        (1, 2.30, -0.55), (1, 0.55, -0.25)],
    8: [(0, 125.0, -20.0), (0, 3.40, -1.30), (0, 0.80, -0.55),
        (1, 2.90, -0.65), (1, 0.70, -0.30)],
    16: [(0, 400.0, -88.0), (0, 12.0, -8.0), (0, 1.2, -0.9),
         (1, 6.0, -1.1), (1, 0.7, -0.35)],
    17: [(0, 450.0, -100.0), (0, 14.0, -9.0), (0, 1.4, -1.0),
         (1, 7.0, -1.2), (1, 0.8, -0.40)],
    9: [(0, 160.0, -26.0), (0, 4.2, -1.6), (0, 1.0, -0.7),
        (1, 3.6, -0.8), (1, 0.9, -0.4)],
}
ORBITALS = {z: tuple(l for (l, _, _) in sh) for z, sh in SHELLS.items()}
K_EHT_H = 1.75
K_EHT_CORE = 1.20

# real-SH m-order for l=1 is (y, z, x) = cartesian (1, 2, 0)
_P_PERM = (1, 2, 0)


def _shell_overlap(la, lb, a, b, R):
    """Overlap block [2la+1, 2lb+1] of unit-norm single-Gaussian shells."""
    p = a + b
    mu = a * b / p
    r2 = float(R @ R)
    ss = (np.pi / p) ** 1.5 * np.exp(-mu * r2)
    if la == 0 and lb == 0:
        blk = np.array([[ss]])
        na = nb = (np.pi / (2 * a)) ** 0.75 * (np.pi / (2 * b)) ** 0.75 / 1.0
        # normalize via self-overlap at R=0
        n_a = (np.pi / (2 * a)) ** 1.5
        n_b = (np.pi / (2 * b)) ** 1.5
        return blk / np.sqrt(n_a * n_b)
    if la == 0 and lb == 1:
        cart = (a / p) * (-R) * ss  # <s_A | p_B,i>, R = B - A
        n_a = (np.pi / (2 * a)) ** 1.5
        n_b = (np.pi / (2 * b)) ** 1.5 / (4 * b)
        blk = cart[None, :] / np.sqrt(n_a * n_b)
        return blk[:, _P_PERM]
    if la == 1 and lb == 0:
        return _shell_overlap(0, 1, b, a, -R).T
    # p-p
    cart = (np.eye(3) / (2 * p) - (a * b / p**2) * np.outer(R, R)) * ss
    n_a = (np.pi / (2 * a)) ** 1.5 / (4 * a)
    n_b = (np.pi / (2 * b)) ** 1.5 / (4 * b)
    blk = cart / np.sqrt(n_a * n_b)
    return blk[np.ix_(_P_PERM, _P_PERM)]


def make_targets(z, pos_bohr):
    """(S, H, Hcore) full matrices for one molecule (numpy, fp64)."""
    shells = []
    for ai, zi in enumerate(z):
        for (l, expo, h) in SHELLS[int(zi)]:
            shells.append((ai, l, expo, h))
    offs = []
    o = 0
    for (_, l, _, _) in shells:
        offs.append(o)
        o += 2 * l + 1
    n = o
    S = np.zeros((n, n))
    H = np.zeros((n, n))
    C = np.zeros((n, n))
    for i, (ai, la, ea, ha) in enumerate(shells):
        for j, (aj, lb, eb, hb) in enumerate(shells):
            if j < i:
                continue
            R = pos_bohr[aj] - pos_bohr[ai]
            blk = _shell_overlap(la, lb, ea, eb, R)
            sl_i = slice(offs[i], offs[i] + 2 * la + 1)
            sl_j = slice(offs[j], offs[j] + 2 * lb + 1)
            S[sl_i, sl_j] = blk
            S[sl_j, sl_i] = blk.T
            hh = 0.5 * (ha + hb)
            H[sl_i, sl_j] = K_EHT_H * hh * blk
            H[sl_j, sl_i] = K_EHT_H * hh * blk.T
            C[sl_i, sl_j] = K_EHT_CORE * hh * blk
            C[sl_j, sl_i] = K_EHT_CORE * hh * blk.T
    # diagonal shells: S self-overlap is exactly 1 per orbital by the
    # normalization; H diagonal = K*h (the EHT convention uses plain h)
    for i, (ai, la, ea, ha) in enumerate(shells):
        for m in range(2 * la + 1):
            H[offs[i] + m, offs[i] + m] = ha
            C[offs[i] + m, offs[i] + m] = ha
    return S, H, C


def build_batches(n_mols, batch_size, seed=3):
    """Real fixture geometries -> padded MolBatch list with targets."""
    import shutil

    from nabladft_tpu.data.batch import MolBatch
    from nabladft_tpu.data.dataset import EnergyDataset

    fixture = Path("/root/reference/tests/data/raw/test_database.db")
    local = Path("datasets/fixture")
    local.mkdir(parents=True, exist_ok=True)
    db = local / fixture.name
    if not db.exists():
        shutil.copy(fixture, db)
    ds = EnergyDataset(db)
    mols = []
    for i in range(n_mols):
        zr, posr, _, _ = ds.records.slice(i)
        z = np.asarray(zr)
        pos = np.asarray(posr, np.float64) * ANGSTROM_TO_BOHR
        keep = np.isin(z, list(SHELLS))
        z, pos = z[keep], pos[keep]
        S, H, C = make_targets(z, pos)
        mols.append((z, pos, S, H, C))
    a_max = max(len(m[0]) for m in mols)
    o_max = max(m[2].shape[0] for m in mols)
    o_max = int(np.ceil(o_max / 8) * 8)
    batches = []
    for s in range(0, n_mols, batch_size):
        chunk = mols[s : s + batch_size]
        B = len(chunk)
        z = np.zeros((B, a_max), np.int32)
        pos = np.zeros((B, a_max, 3), np.float32)
        nm = np.zeros((B, a_max), bool)
        om = np.zeros((B, o_max), bool)
        Sb = np.zeros((B, o_max, o_max), np.float32)
        Hb = np.zeros((B, o_max, o_max), np.float32)
        Cb = np.zeros((B, o_max, o_max), np.float32)
        for b, (zz, pp, S, H, C) in enumerate(chunk):
            n, o = len(zz), S.shape[0]
            z[b, :n], pos[b, :n], nm[b, :n], om[b, :o] = zz, pp, True, True
            Sb[b, :o, :o], Hb[b, :o, :o], Cb[b, :o, :o] = S, H, C
        batches.append(MolBatch(
            z=z, pos=pos, node_mask=nm, graph_mask=np.ones(B, bool),
            energy=np.zeros(B, np.float32),
            forces=np.zeros((B, a_max, 3), np.float32),
            mol_id=np.arange(s, s + B, dtype=np.int32),
            hamiltonian=Hb, overlap=Sb, core=Cb, orb_mask=om,
        ))
    return batches


class ListModule:
    def __init__(self, batches):
        self.batches = batches

    def train_dataloader(self):
        return list(self.batches)

    val_dataloader = train_dataloader


def matrix_mae(pred, tgt, om, gm):
    pm = om[:, :, None] & om[:, None, :] & gm[:, None, None]
    diff = np.where(pm, np.asarray(pred) - np.asarray(tgt), 0.0)
    return float(np.abs(diff).sum() / pm.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qhnet", choices=["qhnet", "phisnet"])
    ap.add_argument("--n-mols", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=30000)
    ap.add_argument("--target", type=float, default=1e-4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument(
        "--schedule", default="plateau", choices=["plateau", "cosine"],
        help="cosine decays to ~0 over --max-steps (global step, so it "
             "composes with the chunked fit and --state resume); the r3 "
             "QHNet plateau run stalled at 1.10e-4 vs the 1e-4 target — "
             "a terminal decay squeezes the last fraction",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--state", default=None,
        help="msgpack path for periodic TrainState snapshots; if the file "
             "exists the run RESUMES from it (long precision runs survive "
             "session interruptions)",
    )
    args = ap.parse_args()

    from nabladft_tpu.models import create_model
    from nabladft_tpu.train import Trainer, TrainerConfig

    batches = build_batches(args.n_mols, args.batch_size)
    if args.model == "qhnet":
        model = create_model("qhnet", orbitals=ORBITALS, assemble_matrix=False,
                             remat=False)
        specs = {"hamiltonian": "rmse_mae"}
        coefs = {"hamiltonian": 1.0}
        eval_model = create_model("qhnet", orbitals=ORBITALS,
                                  assemble_matrix=True, remat=False)
    else:
        model = create_model("phisnet", orbitals=ORBITALS)
        specs = {"hamiltonian": "rmse_mae", "overlap": "rmse_mae",
                 "core": "rmse_mae"}
        coefs = {"hamiltonian": 1.0, "overlap": 1.0, "core": 1.0}
        eval_model = model

    n_batches = max(1, args.n_mols // args.batch_size)
    cfg = TrainerConfig(
        max_epochs=args.max_steps // n_batches, max_steps=args.max_steps,
        lr=args.lr, optimizer="amsgrad",
        schedule=args.schedule, total_steps=args.max_steps,
        warmup_steps=100 if args.schedule == "cosine" else 0,
        plateau_factor=0.7, plateau_patience=60,
        plateau_min_lr=1e-6, grad_clip=10.0,
        ema_decay=0.999, eval_with_ema=True,
        log_every_n_steps=500, loss_specs=specs, loss_coefs=coefs,
        val_every_n_steps=None,
    )
    trainer = Trainer(model, cfg, eval_model=eval_model)
    dm = ListModule(batches)
    t0 = time.time()
    curve = []

    # chunked fit with early stop at the target precision
    chunk_epochs = max(1, min(400 // n_batches, cfg.max_epochs))
    total_epochs = 0
    best = float("inf")
    state_path = Path(args.state) if args.state else None
    if state_path and state_path.exists():
        import flax.serialization

        trainer.init_state(batches[0])
        trainer.state = flax.serialization.from_bytes(
            trainer.state, state_path.read_bytes()
        )
        side = json.loads(state_path.with_suffix(".json").read_text())
        total_epochs = side["total_epochs"]
        curve = side["curve"]
        t0 = time.time() - side["wall_s"]
        trainer._restore_aux(side.get("aux"))
        best = min((c["h_mae"] for c in curve), default=float("inf"))
        print(f"resumed at {total_epochs} epochs, best {best:.3e}", flush=True)
    while total_epochs < cfg.max_epochs:
        # fit() continues from the existing TrainState; max_epochs is
        # per-call (max_steps must NOT leak in: fit stops the whole run
        # once the cumulative state.step crosses it)
        trainer.cfg = TrainerConfig(
            **{**cfg.__dict__, "max_epochs": chunk_epochs, "max_steps": None}
        )
        trainer.fit(dm)
        total_epochs += chunk_epochs
        # eval on the training set (overfit target)
        maes = []
        params = trainer._eval_params(trainer.state)
        for b in batches:
            out = eval_model.apply(params, b)
            maes.append(matrix_mae(out["hamiltonian"], b.hamiltonian,
                                   b.orb_mask, b.graph_mask))
        h_mae = float(np.mean(maes))
        best = min(best, h_mae)
        curve.append({"epochs": total_epochs, "h_mae": h_mae,
                      "wall_s": round(time.time() - t0, 1)})
        print(json.dumps(curve[-1]), flush=True)
        if state_path:
            import flax.serialization

            state_path.write_bytes(
                flax.serialization.to_bytes(trainer.state)
            )
            state_path.with_suffix(".json").write_text(json.dumps({
                "total_epochs": total_epochs, "curve": curve,
                "wall_s": round(time.time() - t0, 1),
                "aux": trainer._ckpt_aux(),
            }))
        if args.out:
            # partial result every chunk: an interrupted run still leaves
            # committed evidence of the curve reached so far
            Path(args.out).write_text(json.dumps({
                "model": args.model, "partial": True,
                "n_mols": args.n_mols,
                "o_max": int(batches[0].hamiltonian.shape[-1]),
                "h_mae_eh": best, "target_h_mae_eh": args.target,
                "reached_target": best <= args.target, "curve": curve,
                "wall_seconds": round(time.time() - t0, 1),
                "reference_published": {"qhnet_test_tiny": 9.8e-4,
                                        "phisnet_test_tiny": 1.9e-4},
            }, indent=1))
        if h_mae <= args.target:
            break

    result = {
        "model": args.model,
        "task": "overfit precision (synthetic covariant EHT targets on "
                "fixture geometries)",
        "n_mols": args.n_mols,
        "o_max": int(batches[0].hamiltonian.shape[-1]),
        "h_mae_eh": best,
        "target_h_mae_eh": args.target,
        "reached_target": best <= args.target,
        "curve": curve,
        "wall_seconds": round(time.time() - t0, 1),
        "reference_published": {"qhnet_test_tiny": 9.8e-4,
                                "phisnet_test_tiny": 1.9e-4},
    }
    if args.model == "phisnet":
        maes_s = []
        params = trainer._eval_params(trainer.state)
        for b in batches:
            out = eval_model.apply(params, b)
            maes_s.append(matrix_mae(out["overlap"], b.overlap,
                                     b.orb_mask, b.graph_mask))
        result["s_mae"] = float(np.mean(maes_s))
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
