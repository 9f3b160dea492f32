"""Isolated TPU timings for DimeNet++'s candidate hot ops at bench shape.

VERDICT r3 #2: dimenetpp is the only zoo model under its anchor (0.775x,
19.8% MFU). This times each structural piece of the interaction block —
the triplet k-contraction in its current order (`qm`: G-first) vs the
reassociated order (`w12_first`: radial×w12 before the k-contraction,
5x fewer FLOPs at smaller matmul M), the dense triplet-closing einsum,
and the per-edge H=256 Dense stack — fwd and grad, so the reorder decision
is made on measurements instead of padded-FLOP guesses.

Usage: python examples/microbench_dimenetpp.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, A, K, H, E, L1, R = 32, 48, 32, 256, 64, 7, 6
Q = R * L1 * L1  # 294
S = L1 * L1  # 49
DT = jnp.bfloat16


def timed(fn, *args, reps=10):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps * 1e3


def qm_orig(g, x, w12):
    qm = jnp.einsum("bjkq,bjke->bjqe", g, x)
    parts = []
    for l in range(L1):
        sl = qm[:, :, R * l * l : R * (l + 1) * (l + 1), :]
        sl = sl.reshape(*sl.shape[:2], 2 * l + 1, R, E)
        parts.append(jnp.einsum("bjmne,ne->bjme", sl, w12[l * R:(l + 1) * R]))
    return jnp.concatenate(parts, axis=2)


def w12_first_loop(y, rad, x, w12):
    parts = []
    for l in range(L1):
        rw = jnp.einsum("bjkn,ne->bjke", rad[..., l * R:(l + 1) * R],
                        w12[l * R:(l + 1) * R])
        parts.append(jnp.einsum(
            "bjkm,bjke->bjme", y[..., l * l:(l + 1) * (l + 1)], rw * x))
    return jnp.concatenate(parts, axis=2)


def w12_first_stacked(y, rad, x, w12bd, pad_idx, pad_valid, out_idx):
    rw = (rad @ w12bd).reshape(B, A, K, L1, E)
    cx = jnp.swapaxes(rw * x[..., None, :], 2, 3)        # [B,A,L,K,E]
    ys = jnp.take(y, pad_idx.reshape(-1), axis=-1).reshape(B, A, K, L1, 2 * L1 - 1)
    ys = jnp.swapaxes(ys * pad_valid, 2, 3)              # [B,A,L,K,13]
    qs = jnp.einsum("bjlkm,bjlke->bjlme", ys, cx)        # [B,A,L,13,E]
    return qs.reshape(B, A, -1, E)[:, :, out_idx, :]     # [B,A,49,E]


def agg_dense(yc_d, q):
    return jnp.einsum("bijq,bjqe->bije", yc_d, q)


def edge_stack(m, ws):
    for w in ws:
        m = jax.nn.silu(m @ w)
    return m


def main():
    global B, A, K, H
    if "--smoke" in sys.argv:  # CPU mechanics check at tiny shapes
        B, A, K, H = 2, 8, 4, 16
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(B, A, K, Q)), DT)
    x = jnp.asarray(rng.normal(size=(B, A, K, E)), DT)
    y = jnp.asarray(rng.normal(size=(B, A, K, S)), DT)
    rad = jnp.asarray(rng.normal(size=(B, A, K, L1 * R)), DT)
    w12 = jnp.asarray(rng.normal(size=(L1 * R, E)), DT)
    yc_d = jnp.asarray(rng.normal(size=(B, A, A, S)), DT)
    q = jnp.asarray(rng.normal(size=(B, A, S, E)), DT)
    m = jnp.asarray(rng.normal(size=(B, A, K, H)), DT)
    ws = [jnp.asarray(rng.normal(size=(H, H)) * 0.06, DT) for _ in range(9)]

    w12bd = np.zeros((L1 * R, L1 * E), np.float32)
    for l in range(L1):
        w12bd[l * R:(l + 1) * R, l * E:(l + 1) * E] = np.asarray(
            w12[l * R:(l + 1) * R], np.float32)
    w12bd = jnp.asarray(w12bd, DT)
    pad_idx = np.zeros((L1, 2 * L1 - 1), np.int32)
    pad_valid = np.zeros((L1, 2 * L1 - 1), np.float32)
    for l in range(L1):
        for mm in range(2 * l + 1):
            pad_idx[l, mm] = l * l + mm
            pad_valid[l, mm] = 1.0
    pad_valid = jnp.asarray(pad_valid, DT)  # broadcasts over [B,A,K,·,·]
    out_idx = np.concatenate(
        [l * (2 * L1 - 1) + np.arange(2 * l + 1) for l in range(L1)]
    ).astype(np.int32)

    res = {}
    res["qm_orig_fwd"] = timed(lambda a, b, c: qm_orig(a, b, c), g, x, w12)
    res["w12_loop_fwd"] = timed(w12_first_loop, y, rad, x, w12)
    res["w12_stacked_fwd"] = timed(
        partial(w12_first_stacked, pad_idx=jnp.asarray(pad_idx),
                pad_valid=pad_valid, out_idx=jnp.asarray(out_idx)),
        y, rad, x, w12bd)
    res["agg_dense_fwd"] = timed(agg_dense, yc_d, q)
    res["edge_stack9_fwd"] = timed(edge_stack, m, ws)

    def gsum(fn):
        return lambda *a: jax.grad(
            lambda *aa: jnp.sum(fn(*aa).astype(jnp.float32)))(*a)

    res["qm_orig_grad"] = timed(gsum(qm_orig), g, x, w12)
    res["w12_loop_grad"] = timed(gsum(w12_first_loop), y, rad, x, w12)
    res["agg_dense_grad"] = timed(gsum(agg_dense), yc_d, q)
    res["edge_stack9_grad"] = timed(gsum(edge_stack), m, ws)

    # numeric parity of the reorder lives in
    # tests/models/test_dimenetpp_compact.py (exact reassociation)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
