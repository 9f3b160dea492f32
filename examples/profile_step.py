"""Step-time ablation profiler for the perf-laggard zoo models.

Times a real train step under component knockouts so kernel work targets
where the time actually goes (VERDICT r2 next-items 1 & 9). Knockouts are
module-level monkeypatches applied before init/jit, so each variant is a
self-consistent compiled program:

  * equiformer_v2: full | no_ffn (GridFFN -> 0) | no_attn (attention -> 0)
    | norms_only (both -> 0) | layers_k (k blocks instead of 12)
  * escn:          full | layers_k
  * gemnet_oc:     full | blocks_k

Zeroed components keep their parameters (init runs patched but the tree is
unchanged in structure where possible); we only compare *times*, never
outputs. Each variant reports median-of-3 step time at the bench batch.

Usage: python examples/profile_step.py --model equiformer_v2
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


TINY = False  # --tiny: CPU smoke test of the ablation mechanics

_TINY_KW = {
    "equiformer_v2": dict(num_layers=2, sphere_channels=8, attn_alpha_channels=4,
                          num_heads=2, attn_value_channels=2, ffn_hidden_channels=8,
                          l_max=2, m_max=1, max_neighbors=4, use_pallas=False),
    "escn": dict(num_layers=2, l_max=2, m_max=1, sphere_channels=8, hidden=8,
                 edge_channels=8, max_neighbors=4, num_sphere_samples=8,
                 use_pallas=False),
    "gemnet_oc": dict(num_blocks=2, emb_size_atom=8, emb_size_edge=8,
                      num_radial=8, num_spherical=3, max_neighbors=4,
                      max_neighbors_qint=2),
    "dimenetpp": dict(num_blocks=2, hidden=16, int_emb_size=8,
                      basis_emb_size=4, out_emb_channels=8, num_spherical=3,
                      num_radial=4, max_neighbors=4),
    "graphormer3d": dict(blocks=1, layers=1, embed_dim=16, ffn_embed_dim=16,
                         attention_heads=2, num_kernel=8),
}


def _bench_pieces(name):
    import bench

    spec = bench.ZOO_BENCH[name]
    if TINY:
        spec = {**spec, "batch": 2, "kwargs": _TINY_KW[name]}
    batch = bench.make_batch(np.random.default_rng(0), batch_size=spec["batch"])
    return spec, batch


def _time_step(name, spec, batch, kwargs_override=None, n=8, repeats=3,
               energy_only=False):
    from nabladft_tpu.models import create_model
    from nabladft_tpu.train import Trainer, TrainerConfig

    kwargs = dict(spec["kwargs"])
    if kwargs_override:
        kwargs.update(kwargs_override)
    model = create_model(name, **kwargs)
    specs = ({"energy": "l1"} if energy_only
             else {"energy": "l1", "forces": "l2norm"})
    cfg = TrainerConfig(
        schedule="constant", lr=1e-4, log_every_n_steps=10**9,
        loss_specs=specs,
        loss_coefs={k: 1.0 for k in specs},
        force_grads=spec.get("force_grads", "direct"),
    )
    trainer = Trainer(model, cfg)
    trainer.init_state(batch)
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._jit_train_step(state, batch)
    float(metrics["train/total"])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = trainer._jit_train_step(state, batch)
        float(metrics["train/total"])
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times))


def _record(out, key, thunk):
    """Run one ablation variant; never die (a single variant's OOM must
    not lose the others' timings — the r4 profile crash cost a full TPU
    profile run), and print each result as it lands."""
    try:
        out[key] = thunk()
    except Exception as e:  # noqa: BLE001 — report and continue
        out[key] = "error: " + " ".join(str(e).split())[:200]
    print(json.dumps({key: out[key]}), flush=True)


@contextlib.contextmanager
def _patched(obj, attr, fn):
    orig = getattr(obj, attr)
    setattr(obj, attr, fn)
    try:
        yield
    finally:
        setattr(obj, attr, orig)


def profile_equiformer_v2():
    from nabladft_tpu.models import equiformer_v2 as m

    spec, batch = _bench_pieces("equiformer_v2")
    out = {}
    _record(out, "full_12", lambda: _time_step("equiformer_v2", spec, batch))
    _record(out, "layers_6", lambda: _time_step(
        "equiformer_v2", spec, batch, {"num_layers": 6}))

    # knockouts must spare the model heads: energy_ffn IS a GridFFN and
    # force_block IS a SO2GraphAttention (equiformer_v2.py:489,495-506) —
    # zeroing those would misattribute head cost to the blocks and change
    # the force-loss backward being timed
    _HEADS = ("energy_ffn", "force_block")
    ffn_orig = m.GridFFN.__call__

    def ffn_zero(self, x):
        if self.name in _HEADS:
            return ffn_orig(self, x)
        return x * 0.0

    with _patched(m.GridFFN, "__call__", ffn_zero):
        _record(out, "no_ffn",
                lambda: _time_step("equiformer_v2", spec, batch))

    attn_orig = {
        m.PallasSO2GraphAttention: m.PallasSO2GraphAttention.__call__,
        m.SO2GraphAttention: m.SO2GraphAttention.__call__,
    }

    def attn_zero(self, x, *a, **k):
        if self.name in _HEADS:
            return attn_orig[type(self)](self, x, *a, **k)
        return x * 0.0

    with _patched(m.PallasSO2GraphAttention, "__call__", attn_zero), \
         _patched(m.SO2GraphAttention, "__call__", attn_zero):
        _record(out, "no_attn",
                lambda: _time_step("equiformer_v2", spec, batch))
    with _patched(m.GridFFN, "__call__", ffn_zero), \
         _patched(m.PallasSO2GraphAttention, "__call__", attn_zero), \
         _patched(m.SO2GraphAttention, "__call__", attn_zero):
        _record(out, "norms_and_heads_only",
                lambda: _time_step("equiformer_v2", spec, batch))
    return out


def profile_escn():
    spec, batch = _bench_pieces("escn")
    out = {}
    _record(out, "full_8", lambda: _time_step("escn", spec, batch))
    _record(out, "layers_4",
            lambda: _time_step("escn", spec, batch, {"num_layers": 4}))
    from nabladft_tpu.models import escn as m

    def tail_zero(x, x_message, to_g, from_g, c, dtype):
        return x_message * 0.0

    with _patched(m, "_sphere_mlp_tail", tail_zero):
        _record(out, "no_sphere_mlp",
                lambda: _time_step("escn", spec, batch))
    return out


def profile_gemnet_oc():
    spec, batch = _bench_pieces("gemnet_oc")
    out = {}
    _record(out, "full_4", lambda: _time_step("gemnet_oc", spec, batch))
    _record(out, "blocks_2", lambda: _time_step(
        "gemnet_oc", spec, batch, {"num_blocks": 2}))
    _record(out, "no_qint", lambda: _time_step(
        "gemnet_oc", spec, batch, {"quad_interaction": False}))
    return out


def profile_dimenetpp():
    from nabladft_tpu.models import dimenetpp as m

    spec, batch = _bench_pieces("dimenetpp")
    out = {}
    _record(out, "full_6", lambda: _time_step("dimenetpp", spec, batch))
    _record(out, "blocks_3",
            lambda: _time_step("dimenetpp", spec, batch, {"num_blocks": 3}))
    # energy-only loss: isolates the cost of the force-MAE second-order
    # backward (reverse-over-reverse) vs the first-order energy path
    _record(out, "energy_only_loss",
            lambda: _time_step("dimenetpp", spec, batch, energy_only=True))

    # knockout the triplet aggregation (addition-theorem einsums): replace
    # agg with a plain linear image of x_kj so shapes/params are unchanged
    inter_orig = m.InteractionPPBlock.__call__

    def no_triplet(self, mm, rbf, feats, adj):
        import jax.numpy as jnp

        # zero only the float basis tensors; idx/rev_flat/rev_valid are
        # integer/bool gather operands and must stay valid indices
        zero = {
            k: v * 0.0 if jnp.issubdtype(v.dtype, jnp.floating) else v
            for k, v in feats.items()
        }
        return inter_orig(self, mm, rbf, zero, adj)

    with _patched(m.InteractionPPBlock, "__call__", no_triplet):
        _record(out, "zero_basis_feats",
                lambda: _time_step("dimenetpp", spec, batch))

    res_orig = m.ResidualLayer.__call__

    def res_id(self, x):
        return res_orig(self, x) * 0.0 + x

    with _patched(m.ResidualLayer, "__call__", res_id):
        _record(out, "residuals_passthrough",
                lambda: _time_step("dimenetpp", spec, batch))

    import bench

    batch64 = bench.make_batch(np.random.default_rng(0), batch_size=64)
    # B=64 with remat=False needs 16.2 GB HBM (r4 profile OOM) — remat
    # trades recompute for the double-reverse temps; worthwhile iff the
    # B=32 step is bandwidth- not FLOP-bound
    _record(out, "batch_64_remat", lambda: _time_step(
        "dimenetpp", {**spec, "batch": 64}, batch64, {"remat": True}))
    _record(out, "batch_32_remat",
            lambda: _time_step("dimenetpp", spec, batch, {"remat": True}))
    return out


PROFILES = {
    "equiformer_v2": profile_equiformer_v2,
    "escn": profile_escn,
    "gemnet_oc": profile_gemnet_oc,
    "dimenetpp": profile_dimenetpp,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="equiformer_v2", choices=sorted(PROFILES))
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        global TINY
        TINY = True
    res = PROFILES[args.model]()
    res = {k: round(v * 1e3, 1) for k, v in res.items()}
    print(json.dumps({"model": args.model, "step_ms": res}))


if __name__ == "__main__":
    main()
