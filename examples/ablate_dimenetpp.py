"""DimeNet++ subsystem-REMOVAL timing ablation (round 5).

The r4/r5 probes established: energy-only step 56 ms / full 146 ms at
B=32 bf16, remat_basis changes nothing, and even the first-order step
runs ~10% MFU — so the time is in lattice/elementwise subsystems, not
GEMM FLOPs and not basis residual storage. The r4 knockouts zeroed DATA
(FLOPs kept) and were inconclusive by design; these remove the OPS (the
math is wrong; only times are compared):

  no_corr       back-triplet exclusion term deleted (the per-l corr loop
                builds 7 [B,A,K,E] tensors + S/Rt chains per block)
  no_qloop      the per-l q_parts loop replaced by one dense [Q,E]
                contraction of qm (same macro shape, no l-slicing)
  no_gathers    the compact layout's per-block take_along_axis + reverse
                -edge gather replaced by plain slices (keeps shapes)
  no_triplet    the whole triplet path replaced by a Dense on x_kj
  sh_l3         num_spherical 7 -> 4: shrinks every basis lattice
                (G: R*49 -> R*16) AND the sph-harm recursion depth

Usage: python examples/ablate_dimenetpp.py [--tiny]
"""

from __future__ import annotations

import contextlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from profile_step import _bench_pieces, _record, _time_step
import profile_step


@contextlib.contextmanager
def _patched(obj, attr, fn):
    orig = getattr(obj, attr)
    setattr(obj, attr, fn)
    try:
        yield
    finally:
        setattr(obj, attr, orig)


def main():
    if "--tiny" in sys.argv:
        profile_step.TINY = True
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from nabladft_tpu.models import dimenetpp as m

    spec, b32 = _bench_pieces("dimenetpp")
    out = {}
    _record(out, "full", lambda: _time_step("dimenetpp", spec, b32))

    inter_orig = m.InteractionPPBlock.__call__

    # --- no_corr: drop the back-triplet exclusion entirely ---------------
    def call_no_corr(self, mm, rbf, feats, adj):
        f2 = dict(feats)
        # zero-size signal: monkeypatch inside the block is messy; instead
        # patch the S tensor to None and let a patched loop skip it — we
        # patch the whole __call__ body via the source-level toggles below.
        return inter_orig(self, mm, rbf, f2, adj)

    # source-level toggles are cleaner: the block reads these module flags
    for key in ("ABLATE_NO_CORR", "ABLATE_NO_QLOOP", "ABLATE_NO_GATHERS",
                "ABLATE_NO_TRIPLET"):
        if not hasattr(m, key):
            setattr(m, key, False)

    with _patched(m, "ABLATE_NO_CORR", True):
        _record(out, "no_corr", lambda: _time_step("dimenetpp", spec, b32))
    with _patched(m, "ABLATE_NO_QLOOP", True):
        _record(out, "no_qloop", lambda: _time_step("dimenetpp", spec, b32))
    with _patched(m, "ABLATE_NO_GATHERS", True):
        _record(out, "no_gathers", lambda: _time_step("dimenetpp", spec, b32))
    with _patched(m, "ABLATE_NO_TRIPLET", True):
        _record(out, "no_triplet", lambda: _time_step("dimenetpp", spec, b32))
    _record(out, "sh_l3", lambda: _time_step(
        "dimenetpp", spec, b32, {"num_spherical": 4}))

    # downward batch scaling: B=48 measured 1.71x the B=32 step (060 run)
    # — superlinear, so the per-conformer optimum may sit BELOW 32
    import bench
    import numpy as np

    sizes = [2] if profile_step.TINY else [16, 24]
    for bs in sizes:
        bN = bench.make_batch(np.random.default_rng(0), batch_size=bs)
        _record(out, f"full_b{bs}",
                lambda bs=bs, bN=bN: _time_step(
                    "dimenetpp", {**spec, "batch": bs}, bN))

    print(json.dumps({"model": "dimenetpp_ablate", "step_s": out}),
          flush=True)


if __name__ == "__main__":
    main()
