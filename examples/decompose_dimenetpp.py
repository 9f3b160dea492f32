"""DimeNet++ step-time decomposition (round-5: 0.88x -> >=1x anchor).

The r4 ablations established the force-MAE second-order backward is ~63%
of the 146 ms step, but kept FLOPs, so they never attributed the time to
a *subsystem*. This probe splits the step along the AD structure instead:

  fwd            pure inference (no AD)
  fwd_forces     energy + forces = one reverse pass through the basis
  energy_step    first-order param grads, energy loss only (no force loss)
  full           the bench row (reverse-over-reverse force loss)
  blocks_passthrough  InteractionPPBlock -> identity: the H=256 GEMM
                 stack AND the triplet einsums vanish (basis feats get
                 DCE'd except the rbf path) — what's left is graph
                 construction + output blocks + head at every AD order
  *_remat_basis  same, with the pos->basis graph checkpointed
                 (models/dimenetpp.py remat_basis): its hundreds of small
                 [B,A,*] intermediates stop being stored residuals of the
                 two reverse passes
  b48/b64        batch scaling (amortizes per-step fixed cost)

Usage: python examples/decompose_dimenetpp.py [--tiny]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from profile_step import _bench_pieces, _record, _time_step
import profile_step


def _time_fn(fn, *args, n=8, repeats=3):
    import jax

    def _sync(out):
        # host materialization, NOT block_until_ready: under the axon
        # tunnel block_until_ready returns before the remote compute
        # drains (profile_step._time_step uses float() for the same
        # reason) — the r5 first capture read 0.2 ms "forward" times.
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)

    jfn = jax.jit(fn)
    _sync(jfn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times))


def _fwd_pieces(name, spec, batch, kwargs_override=None):
    from nabladft_tpu.models import create_model

    import jax

    kwargs = dict(spec["kwargs"])
    if kwargs_override:
        kwargs.update(kwargs_override)
    model = create_model(name, **kwargs)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params


def main():
    if "--tiny" in sys.argv:
        profile_step.TINY = True
        # CPU smoke: the axon sitecustomize registers the TPU backend
        # before user code; the env var alone does not stick — force it.
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench
    import jax

    only_ad = "--only-ad" in sys.argv  # rerun of the pure-AD variants
    spec, b32 = _bench_pieces("dimenetpp")
    out = {}

    # --- AD-order split -------------------------------------------------
    model, params = _fwd_pieces("dimenetpp", spec, b32)

    def fwd(p, batch):
        return model.apply(p, batch)["energy"].sum()

    def fwd_forces(p, batch):
        e, f = jax.value_and_grad(
            lambda pos: model.apply(
                p, batch.replace(pos=pos))["energy"].sum())(batch.pos)
        return e, f

    _record(out, "fwd", lambda: _time_fn(fwd, params, b32))
    _record(out, "fwd_forces", lambda: _time_fn(fwd_forces, params, b32))
    if not only_ad:
        _record(out, "energy_step",
                lambda: _time_step("dimenetpp", spec, b32, energy_only=True))
        _record(out, "full", lambda: _time_step("dimenetpp", spec, b32))

    # --- remat of the pos->basis graph ----------------------------------
    rb = {"remat_basis": True}
    model_rb, params_rb = _fwd_pieces("dimenetpp", spec, b32, rb)

    def fwd_forces_rb(p, batch):
        e, f = jax.value_and_grad(
            lambda pos: model_rb.apply(
                p, batch.replace(pos=pos))["energy"].sum())(batch.pos)
        return e, f

    _record(out, "fwd_forces_remat_basis",
            lambda: _time_fn(fwd_forces_rb, params_rb, b32))
    if only_ad:
        print(json.dumps({"model": "dimenetpp_decompose_ad", "step_s": out}),
              flush=True)
        return
    _record(out, "full_remat_basis",
            lambda: _time_step("dimenetpp", spec, b32, rb))
    _record(out, "energy_step_remat_basis",
            lambda: _time_step("dimenetpp", spec, b32, rb, energy_only=True))

    # --- blocks passthrough: what the blocks (GEMMs + triplets) cost ----
    from nabladft_tpu.models import dimenetpp as m

    import contextlib

    @contextlib.contextmanager
    def _blocks_identity():
        orig = m.InteractionPPBlock.__call__

        def ident(self, mm, rbf, feats, adj):
            orig(self, mm, rbf, feats, adj)  # keep params in the tree
            return mm

        m.InteractionPPBlock.__call__ = ident
        try:
            yield
        finally:
            m.InteractionPPBlock.__call__ = orig

    with _blocks_identity():
        _record(out, "full_blocks_passthrough",
                lambda: _time_step("dimenetpp", spec, b32))

    # --- batch scaling ---------------------------------------------------
    if profile_step.TINY:
        sizes = [4]
    else:
        sizes = [48, 64]
    for bs in sizes:
        bN = bench.make_batch(np.random.default_rng(0), batch_size=bs)
        sN = {**spec, "batch": bs}
        _record(out, f"full_b{bs}_remat_basis",
                lambda sN=sN, bN=bN: _time_step("dimenetpp", sN, bN, rb))
        _record(out, f"full_b{bs}",
                lambda sN=sN, bN=bN: _time_step("dimenetpp", sN, bN))

    print(json.dumps({"model": "dimenetpp_decompose", "step_s": out}),
          flush=True)


if __name__ == "__main__":
    main()
