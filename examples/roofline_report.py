"""Speed-of-light (roofline) accounting for every bench row.

For each model at its bench shape this reports, from ONE process on the
attached chip:

  * flops / bytes — XLA cost analysis of the optimized train step
    (Pallas kernels carry analytic pl.CostEstimate flops);
  * peak_tflops / hbm_gbps — the chip's dense-matmul and read+write
    elementwise ceilings, measured in the SAME process (the tunneled
    device delivers a fluctuating fraction of a physical chip, so
    nominal tables would over/understate the ceiling arbitrarily);
  * ideal_ms = max(flops/peak, bytes/bandwidth) — the step's
    speed-of-light on the chip as currently delivered;
  * sol_frac = ideal_ms / actual_ms — how close the implementation is
    to that ceiling (1.0 = at the roofline).

The per-model rows land in results/roofline.json. Like bench.run_all,
--all runs each model in a subprocess so one OOM cannot poison the rest.

Usage:
  python examples/roofline_report.py --all [--out results/roofline.json]
  python examples/roofline_report.py --model dimenetpp
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ALL_MODELS = [
    "painn", "schnet", "graphormer3d", "dimenetpp", "gemnet_oc",
    "escn", "equiformer_v2", "qhnet", "phisnet",
]

# The headline PaiNN row is not in bench.ZOO_BENCH (bench.main hardcodes
# it); mirror that config here so the roofline covers all 9 rows.
PAINN_SPEC = dict(
    batch=256,
    force_grads="pallas",
    kwargs=dict(
        hidden=128, n_interactions=6, n_rbf=100, cutoff=5.0,
        max_neighbors=40, compute_dtype="bfloat16", remat=False,
        use_pallas="fused",
    ),
)


def report(name: str) -> dict:
    import jax  # noqa: F401 — device init
    import numpy as np

    import bench
    from nabladft_tpu.models import create_model
    from nabladft_tpu.train import Trainer, TrainerConfig
    from nabladft_tpu.train.profiling import (
        compiled_bytes,
        compiled_flops,
        measured_hbm_bandwidth,
        measured_peak_flops,
    )

    if name in ("qhnet", "phisnet"):
        batch = bench.make_ham_batch(
            np.random.default_rng(0), with_overlap_core=(name == "phisnet")
        )
        if name == "qhnet":
            model = create_model("qhnet", assemble_matrix=False, remat=False)
            specs = {"hamiltonian": "rmse_mae"}
        else:
            model = create_model("phisnet")
            specs = {"hamiltonian": "rmse_mae", "overlap": "rmse_mae",
                     "core": "rmse_mae"}
        cfg = TrainerConfig(
            schedule="constant", lr=1e-3, log_every_n_steps=10**9,
            ema_decay=0.99, loss_specs=specs,
            loss_coefs={k: 1.0 for k in specs},
        )
        mm_dtype = "float32"  # Hamiltonian models train fp32 (see bench_ham)
        bsz = batch.z.shape[0]
    else:
        spec = bench.ZOO_BENCH[name] if name != "painn" else PAINN_SPEC
        model = create_model(name, **spec["kwargs"])
        cfg = TrainerConfig(
            schedule="constant", lr=1e-4, log_every_n_steps=10**9,
            loss_specs={"energy": "l1", "forces": "l2norm"},
            loss_coefs={"energy": 1.0, "forces": 1.0},
            force_grads=spec.get("force_grads", "direct"),
        )
        mm_dtype = "bfloat16"
        bsz = spec["batch"]
        batch = bench.make_batch(np.random.default_rng(0), batch_size=bsz)

    trainer = Trainer(model, cfg)
    trainer.init_state(batch)
    state = trainer.state
    flops = compiled_flops(trainer._jit_train_step, state, batch)
    nbytes = compiled_bytes(trainer._jit_train_step, state, batch)
    for _ in range(3):
        state, metrics = trainer._jit_train_step(state, batch)
    float(metrics["train/total"])
    step_s, _ = bench._timed_steps(trainer, state, batch)

    peak = measured_peak_flops(mm_dtype)
    bw = measured_hbm_bandwidth()
    row = {
        "model": name,
        "batch": bsz,
        "step_ms": round(step_s * 1e3, 2),
        "flops_g": round(flops / 1e9, 1) if flops else None,
        "bytes_gb": round(nbytes / 1e9, 3) if nbytes else None,
        "peak_tflops": round(peak / 1e12, 1),
        "mm_dtype": mm_dtype,
        "hbm_gbps": round(bw / 1e9, 1),
    }
    if flops and nbytes:
        t_flop = flops / peak
        t_mem = nbytes / bw
        ideal = max(t_flop, t_mem)
        row.update(
            t_flop_ms=round(t_flop * 1e3, 2),
            t_mem_ms=round(t_mem * 1e3, 2),
            ideal_ms=round(ideal * 1e3, 2),
            bound="compute" if t_flop >= t_mem else "memory",
            sol_frac=round(ideal / step_s, 3),
            # XLA cost analysis counts operand+result bytes of every HLO
            # op BEFORE fusion folds intermediates into registers/VMEM, so
            # bytes_gb overstates true HBM traffic for elementwise-heavy
            # steps; sol_frac > 1 means exactly that. The FLOP ceiling has
            # no such slack (pallas kernels carry analytic CostEstimates),
            # so sol_frac_flop = t_flop/step is the dependable
            # how-far-from-the-MXU-roof number.
            sol_frac_flop=round(t_flop / step_s, 3),
        )
        if row["sol_frac"] > 1.0:
            row["note"] = (
                "bytes overcounted (pre-fusion XLA accounting): memory "
                "bound not inferable; use sol_frac_flop"
            )
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, choices=ALL_MODELS)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="results/roofline.json")
    ap.add_argument("--merge", default=None, metavar="JSON",
                    help="with --model: replace that model's row in an "
                         "existing --all output file instead of printing")
    args = ap.parse_args()

    if args.model:
        t0 = time.perf_counter()
        row = report(args.model)
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(row), flush=True)
        if args.merge:
            path = Path(args.merge)
            rows = json.loads(path.read_text()) if path.exists() else []
            rows = [r for r in rows if r.get("model") != args.model]
            rows.append(row)
            order = {m: i for i, m in enumerate(ALL_MODELS)}
            rows.sort(key=lambda r: order.get(r.get("model"), 99))
            path.write_text(json.dumps(rows, indent=1))
        return

    rows = []
    for name in ALL_MODELS:
        t0 = time.perf_counter()
        res = subprocess.run(
            [sys.executable, __file__, "--model", name],
            capture_output=True, text=True, timeout=1800,
        )
        line = None
        for ln in (res.stdout or "").splitlines():
            if ln.startswith("{"):
                line = ln
        if line:
            row = json.loads(line)
        else:
            row = {"model": name,
                   "error": (res.stderr or "no output")[-300:]}
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
