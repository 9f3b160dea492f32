"""Time gather_mode="onehot" (scatter-free compact gathers) at bench shapes."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
from profile_step import _bench_pieces, _record, _time_step


def main():
    import bench

    spec, b32 = _bench_pieces("dimenetpp")
    out = {}
    _record(out, "onehot_b32", lambda: _time_step(
        "dimenetpp", spec, b32, {"gather_mode": "onehot"}))
    for bs in (24, 16, 8):
        bN = bench.make_batch(np.random.default_rng(0), batch_size=bs)
        _record(out, f"onehot_b{bs}", lambda bs=bs, bN=bN: _time_step(
            "dimenetpp", {**spec, "batch": bs}, bN, {"gather_mode": "onehot"}))
    print(json.dumps({"model": "dimenetpp_onehot", "step_s": out}), flush=True)


if __name__ == "__main__":
    main()
