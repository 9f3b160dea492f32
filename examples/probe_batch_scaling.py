"""Batch-scaling probe for GemNet-OC and SchNet bench rows.

The r5 DimeNet++/Graphormer3D sweeps showed the dense-lattice models'
step time is super-linear in B on this chip, so conf/s peaks BELOW the
historical bench batch. This times the two remaining non-roofline rows
(gemnet_oc 36% of ceiling, schnet 60%) across batch sizes to pick the
conf/s-optimal shipping batch. One JSON line per variant as it lands
(crash-proof under the spool timeout).

Usage: python examples/probe_batch_scaling.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from profile_step import _bench_pieces, _record, _time_step


def main():
    import bench

    out = {}
    for name, sizes in (("gemnet_oc", (48, 24, 16)), ("schnet", (384, 192, 128))):
        spec, _ = _bench_pieces(name)
        for bs in sizes:
            bN = bench.make_batch(np.random.default_rng(0), batch_size=bs)
            _record(out, f"{name}_b{bs}", lambda spec=spec, bs=bs, bN=bN: _time_step(
                name, {**spec, "batch": bs}, bN))
    print(json.dumps({"model": "batch_scaling", "step_s": out}), flush=True)


if __name__ == "__main__":
    main()
