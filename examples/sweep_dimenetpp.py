"""DimeNet++ train-step config sweep (round-4 perf: 0.87x -> >=1x anchor).

The r4g ablation localized the cost: energy-only 54.7 ms vs 146.5 ms full
at B=32 — the force-MAE second-order backward is ~63% of the step, and
knocking the triplet einsums' *data* out (zeros, FLOPs kept) changes
nothing. The remaining hypotheses are layout/AD-structure, not FLOPs:

  * the compact layout's per-block gathers (take_along_axis for agg,
    rev_flat for the back-triplet) become scatter-adds under
    reverse-over-reverse — TPU scatters serialize;
  * the dense layout (compact=False) has ZERO gathers at ~1.5x the
    matmul FLOPs (a good trade at 14% MFU);
  * remat=True shrinks the double-reverse temp set (HBM-bound step);
  * B=64 doubles arithmetic intensity (needs remat to fit 16 GB).

This sweep times a real train step across that matrix, crash-proof and
incremental (one JSON line per variant as it lands).

Usage: python examples/sweep_dimenetpp.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from profile_step import _bench_pieces, _record, _time_step


def main():
    import bench
    import profile_step

    if "--tiny" in sys.argv:  # CPU smoke test of the sweep mechanics
        profile_step.TINY = True
    spec, b32 = _bench_pieces("dimenetpp")
    if profile_step.TINY:
        b64 = bench.make_batch(np.random.default_rng(0), batch_size=4)
        s64 = {**spec, "batch": 4}
    else:
        b64 = bench.make_batch(np.random.default_rng(0), batch_size=64)
        s64 = {**spec, "batch": 64}
    out = {}

    # baseline: reproduces the bench row (compact=True, remat=False)
    _record(out, "compact_b32", lambda: _time_step("dimenetpp", spec, b32))
    # dense layout: no gathers anywhere -> no scatters in the 2nd-order bwd
    _record(out, "dense_b32", lambda: _time_step(
        "dimenetpp", spec, b32, {"compact": False}))
    # remat: trade recompute for the double-reverse temp set
    _record(out, "compact_b32_remat", lambda: _time_step(
        "dimenetpp", spec, b32, {"remat": True}))
    _record(out, "dense_b32_remat", lambda: _time_step(
        "dimenetpp", spec, b32, {"compact": False, "remat": True}))
    # surrogate force grads (reverse + reverse-over-JVP instead of
    # reverse-over-reverse); r3 measured ~= direct, re-check on the winner
    _record(out, "compact_b32_surrogate", lambda: _time_step(
        "dimenetpp", {**spec, "force_grads": "surrogate"}, b32))
    _record(out, "dense_b32_surrogate", lambda: _time_step(
        "dimenetpp", {**spec, "force_grads": "surrogate"}, b32,
        {"compact": False}))
    # batch scaling (per-conformer time is what the bench row divides by)
    _record(out, "compact_b64_remat", lambda: _time_step(
        "dimenetpp", s64, b64, {"remat": True}))
    _record(out, "dense_b64_remat", lambda: _time_step(
        "dimenetpp", s64, b64, {"compact": False, "remat": True}))

    import json

    print(json.dumps({"model": "dimenetpp_sweep", "step_s": out}), flush=True)


if __name__ == "__main__":
    main()
