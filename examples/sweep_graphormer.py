"""Graphormer3D step-time sweep (VERDICT r4 #10: 18.8% MFU at 3.92x).

The model is pure dense attention; the r5 hypotheses are structural:

  * remat=True (model default) recomputes all 24 weight-shared layers in
    the backward, but the activations at B=128/A=48/D=512 are ~6 MB per
    layer — the recompute buys nothing. remat_off drops the extra
    forward.
  * the gbf->attention-bias chain ([B,A,A,128] lattices) and the force
    head ran fp32; they now follow compute_dtype (models/graphormer3d.py)
    — the sweep's `base` already includes that change, so compare its
    absolute step time against the r5 bench row (82.2 ms).
  * batch scaling amortizes the per-step fixed cost.

Usage: python examples/sweep_graphormer.py [--tiny]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from profile_step import _bench_pieces, _record, _time_step
import profile_step


def main():
    if "--tiny" in sys.argv:
        profile_step.TINY = True
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench

    spec, b128 = _bench_pieces("graphormer3d")
    out = {}
    _record(out, "base", lambda: _time_step("graphormer3d", spec, b128))
    _record(out, "remat_off", lambda: _time_step(
        "graphormer3d", spec, b128, {"remat": False}))
    if profile_step.TINY:
        sizes = [4]
    else:
        sizes = [192, 256]
    for bs in sizes:
        bN = bench.make_batch(np.random.default_rng(0), batch_size=bs)
        sN = {**spec, "batch": bs}
        _record(out, f"remat_off_b{bs}",
                lambda sN=sN, bN=bN: _time_step(
                    "graphormer3d", sN, bN, {"remat": False}))
    print(json.dumps({"model": "graphormer3d_sweep", "step_s": out}),
          flush=True)


if __name__ == "__main__":
    main()
