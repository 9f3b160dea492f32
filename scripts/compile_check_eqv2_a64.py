"""Compile-check the EqV2 fused train step at the A=64 fixture bucket.

Repro of the round-3 scoped-VMEM OOM (outputs/tpu_queue/acc_eqv2.log:
force_block backward exceeded the 127M limit by 222 KB at B=32/A=64).
AOT-compiles the train step only — no data, runs in minutes.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bench import ZOO_BENCH
from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.train import Trainer, TrainerConfig


def make_batch(B=32, A=64, rng=None):
    rng = rng or np.random.default_rng(0)
    z = np.zeros((B, A), np.int32)
    pos = np.zeros((B, A, 3), np.float32)
    node_mask = np.zeros((B, A), bool)
    for i in range(B):
        n = int(rng.integers(50, A + 1))
        z[i, :n] = rng.integers(1, 17, n)
        pos[i, :n] = rng.uniform(-5, 5, (n, 3))
        node_mask[i, :n] = True
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=np.ones((B,), bool),
        energy=rng.normal(size=(B,)).astype(np.float32),
        forces=(rng.normal(size=(B, A, 3)) * node_mask[..., None]).astype(np.float32),
        mol_id=np.arange(B, dtype=np.int32),
    )


def main():
    spec = ZOO_BENCH["equiformer_v2"]
    model = create_model("equiformer_v2", **spec["kwargs"])
    cfg = TrainerConfig(
        schedule="constant", lr=1e-4, log_every_n_steps=10**9,
        loss_specs={"energy": "l1", "forces": "l2norm"},
        loss_coefs={"energy": 1.0, "forces": 1.0},
        force_grads="direct",
    )
    trainer = Trainer(model, cfg)
    batch = make_batch()
    trainer.init_state(batch)
    state, metrics = trainer._jit_train_step(trainer.state, batch)
    print("eqv2 A=64 train step: ok, loss =", float(metrics["train/total"]))


if __name__ == "__main__":
    main()
