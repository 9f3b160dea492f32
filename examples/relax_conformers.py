"""Example: batched conformational optimization (db → db), MD, vibrations.

The analog of the reference's optimize job + PYGAseInterface examples:
relax every molecule of an ASE database with on-device batched L-BFGS,
then run a short MD trajectory and a normal-mode analysis on one batch.

    python examples/relax_conformers.py --input test.db --ckpt last.ckpt
"""

import argparse
import logging

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="input ASE database")
    parser.add_argument("--output", default="relaxed.db")
    parser.add_argument("--ckpt", default=None, help="trained PaiNN checkpoint")
    parser.add_argument("--fmax", type=float, default=0.05)
    parser.add_argument("--steps", type=int, default=500)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = {
        "job_type": "optimize",
        "model": {"name": "painn", "kwargs": {}},
        "datamodule": {"source": args.input},
        "optimize": {"fmax": args.fmax, "steps": args.steps, "batch_size": 32},
        "ckpt_path": args.ckpt,
        "output_db": args.output,
    }
    from nabladft_tpu.pipelines import run

    stats = run(cfg)
    print("relaxation stats:", stats)

    # bonus: MD + vibrations on the first relaxed batch
    from nabladft_tpu.data import BucketedLoader, EnergyDataset
    from nabladft_tpu.data.dataset import LoaderConfig
    from nabladft_tpu.models import create_model, forward
    from nabladft_tpu.optimize.md import normal_modes, run_md

    ds = EnergyDataset(args.output)
    batch = next(iter(BucketedLoader(ds, config=LoaderConfig(batch_size=8))))
    model = create_model("painn")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def ef(b):
        out = forward(model, params, b)
        return out["energy"], out["forces"]

    final, traj = run_md(ef, batch, n_steps=100, dt_fs=0.5, temperature_K=300.0)
    print("MD final temperature [K]:", traj["final_temperature"][:3])
    freqs, _ = normal_modes(ef, batch)
    print("first molecule mode frequencies:", np.sort(np.abs(freqs[0]))[-5:])


if __name__ == "__main__":
    main()
