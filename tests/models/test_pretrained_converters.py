"""Golden-parity tests for the torch→flax checkpoint converters.

The environment has no schnetpack/torch_geometric (zero egress), so true
reference execution is impossible; instead these tests implement
schnetpack's SchNet and PaiNN forward semantics as FUNCTIONAL TORCH code
reading a state dict with schnetpack's exact parameter names
(generated deterministically), and assert the converted flax model
reproduces the torch energies to float32 precision. This pins both the
name mapping and the channel-order permutations of
models/pretrained.py (reference restore path: model_registry.py:91-147).
"""

import math

import jax
import numpy as np
import pytest
import torch

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.models.pretrained import convert_state_dict

pytestmark = pytest.mark.model

F = 16  # atom basis
R = 8  # rbf
L = 2  # interactions
CUTOFF = 5.0


def ssp(x):
    return torch.nn.functional.softplus(x) - math.log(2.0)


def mk_batch(rng, B=3, A=10):
    z = rng.integers(1, 9, (B, A)).astype(np.int32)
    pos = rng.uniform(-3, 3, (B, A, 3)).astype(np.float32)
    node_mask = np.ones((B, A), bool)
    node_mask[2, 7:] = False
    z[~node_mask] = 0
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=np.ones(B, bool),
        energy=None, forces=None, mol_id=np.arange(B, dtype=np.int32),
    )


def pair_terms(pos, node_mask):
    """Dense in-cutoff pair mask, distances, units (torch)."""
    pos = torch.asarray(pos)
    nm = torch.asarray(node_mask)
    diff = pos[:, None, :, :] - pos[:, :, None, :]  # [B,A,A,3] = pos_j - pos_i
    dist = diff.norm(dim=-1)
    eye = torch.eye(pos.shape[1], dtype=torch.bool)
    adj = nm[:, :, None] & nm[:, None, :] & ~eye & (dist < CUTOFF)
    unit = torch.where(adj[..., None], diff / dist.clamp(min=1e-10)[..., None],
                       torch.zeros(()))
    return adj, torch.where(adj, dist, torch.zeros(())), unit


def gaussian_rbf(dist):
    centers = torch.linspace(0.0, CUTOFF, R)
    width = centers[1] - centers[0]
    return torch.exp(-0.5 / width**2 * (dist[..., None] - centers) ** 2)


def cosine_cutoff(dist):
    x = 0.5 * (torch.cos(math.pi * dist / CUTOFF) + 1.0)
    return torch.where(dist < CUTOFF, x, torch.zeros(()))


def lin(state, name, x, bias=True):
    y = x @ state[name + ".weight"].T
    return y + state[name + ".bias"] if bias else y


def rand_state(rng, shapes):
    return {
        k: torch.asarray(rng.normal(size=s).astype(np.float32)) * 0.3
        for k, s in shapes.items()
    }


# ---------------------------------------------------------------------------
# SchNet
# ---------------------------------------------------------------------------


def schnet_state(rng):
    pre = "model.representation."
    shapes = {pre + "embedding.weight": (100, F)}
    for i in range(L):
        b = f"{pre}interactions.{i}."
        shapes.update({
            b + "filter_network.0.weight": (F, R), b + "filter_network.0.bias": (F,),
            b + "filter_network.1.weight": (F, F), b + "filter_network.1.bias": (F,),
            b + "in2f.weight": (F, F),
            b + "f2out.0.weight": (F, F), b + "f2out.0.bias": (F,),
            b + "f2out.1.weight": (F, F), b + "f2out.1.bias": (F,),
        })
    out = "model.output_modules.0.outnet."
    shapes.update({
        out + "0.weight": (F // 2, F), out + "0.bias": (F // 2,),
        out + "1.weight": (1, F // 2), out + "1.bias": (1,),
    })
    return rand_state(rng, shapes)


def schnet_torch_forward(state, batch):
    """schnetpack SchNet semantics (representation.SchNet + Atomwise)."""
    pre = "model.representation."
    adj, dist, _ = pair_terms(batch.pos, batch.node_mask)
    rbf = gaussian_rbf(dist)
    fcut = cosine_cutoff(dist)
    x = state[pre + "embedding.weight"][torch.asarray(np.asarray(batch.z), dtype=torch.long)]
    for i in range(L):
        b = f"{pre}interactions.{i}."
        w = ssp(lin(state, b + "filter_network.0", rbf))
        w = lin(state, b + "filter_network.1", w) * fcut[..., None]
        xin = lin(state, b + "in2f", x, bias=False)
        msg = torch.where(adj[..., None], w * xin[:, None, :, :], torch.zeros(())).sum(2)
        h = ssp(lin(state, b + "f2out.0", msg))
        x = x + lin(state, b + "f2out.1", h)
    out = "model.output_modules.0.outnet."
    e = lin(state, out + "1", ssp(lin(state, out + "0", x)))[..., 0]
    e = e * torch.asarray(batch.node_mask)
    return e.sum(-1)


def test_schnet_converter_golden(rng):
    batch = mk_batch(rng)
    state = schnet_state(np.random.default_rng(11))
    golden = schnet_torch_forward(state, batch).numpy()

    model = create_model("schnet", hidden=F, n_interactions=L, n_rbf=R,
                         cutoff=CUTOFF, max_neighbors=63)
    np_state = {k: v.numpy() for k, v in state.items()}
    params = convert_state_dict("schnet", np_state, model, batch)
    ours = np.asarray(model.apply(params, batch)["energy"])
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# PaiNN
# ---------------------------------------------------------------------------


def painn_state(rng):
    pre = "model.representation."
    shapes = {
        pre + "embedding.weight": (100, F),
        pre + "filter_net.weight": (L * 3 * F, R),
        pre + "filter_net.bias": (L * 3 * F,),
    }
    for i in range(L):
        b = f"{pre}interactions.{i}."
        shapes.update({
            b + "interatomic_context_net.0.weight": (F, F),
            b + "interatomic_context_net.0.bias": (F,),
            b + "interatomic_context_net.1.weight": (3 * F, F),
            b + "interatomic_context_net.1.bias": (3 * F,),
        })
        u = f"{pre}mixing.{i}."
        shapes.update({
            u + "mu_channel_mix.weight": (2 * F, F),
            u + "intraatomic_context_net.0.weight": (F, 2 * F),
            u + "intraatomic_context_net.0.bias": (F,),
            u + "intraatomic_context_net.1.weight": (3 * F, F),
            u + "intraatomic_context_net.1.bias": (3 * F,),
        })
    out = "model.output_modules.0.outnet."
    shapes.update({
        out + "0.weight": (F // 2, F), out + "0.bias": (F // 2,),
        out + "1.weight": (1, F // 2), out + "1.bias": (1,),
    })
    return rand_state(rng, shapes)


def painn_torch_forward(state, batch):
    """schnetpack PaiNN semantics (representation.PaiNN: directed messages
    with shared filter net, gated equivariant mixing; Atomwise head)."""
    pre = "model.representation."
    adj, dist, unit = pair_terms(batch.pos, batch.node_mask)
    w_all = lin(state, pre + "filter_net", gaussian_rbf(dist))
    w_all = w_all * cosine_cutoff(dist)[..., None]  # [B,A,A,L*3F]
    q = state[pre + "embedding.weight"][torch.asarray(np.asarray(batch.z), dtype=torch.long)]
    mu = torch.zeros((*q.shape[:2], 3, F))
    for i in range(L):
        b = f"{pre}interactions.{i}."
        phi = lin(state, b + "interatomic_context_net.1",
                  torch.nn.functional.silu(lin(state, b + "interatomic_context_net.0", q)))
        wij = torch.where(
            adj[..., None], w_all[..., i * 3 * F : (i + 1) * 3 * F], torch.zeros(())
        )
        x = wij * phi[:, None, :, :]  # [B,A(i),A(j),3F]
        dq, dmuR, dmumu = torch.split(x, F, dim=-1)
        q = q + dq.sum(2)
        dmu = dmuR[:, :, :, None, :] * unit[..., None] + dmumu[:, :, :, None, :] * mu[:, None]
        mu = mu + dmu.sum(2)
        u = f"{pre}mixing.{i}."
        mu_mix = mu @ state[u + "mu_channel_mix.weight"].T  # [B,A,3,2F]
        mu_V, mu_W = torch.split(mu_mix, F, dim=-1)
        mu_Vn = torch.sqrt((mu_V**2).sum(-2) + 1e-8)
        ctx = torch.cat([q, mu_Vn], dim=-1)
        xg = lin(state, u + "intraatomic_context_net.1",
                 torch.nn.functional.silu(lin(state, u + "intraatomic_context_net.0", ctx)))
        dq_i, dmu_i, dqmu_i = torch.split(xg, F, dim=-1)
        mu = mu + dmu_i[:, :, None, :] * mu_W
        q = q + dq_i + dqmu_i * (mu_V * mu_W).sum(-2)
    out = "model.output_modules.0.outnet."
    e = lin(state, out + "1", ssp(lin(state, out + "0", q)))[..., 0]
    return (e * torch.asarray(batch.node_mask)).sum(-1)


def test_painn_converter_golden(rng):
    batch = mk_batch(rng)
    state = painn_state(np.random.default_rng(13))
    golden = painn_torch_forward(state, batch).numpy()

    model = create_model("painn", hidden=F, n_interactions=L, n_rbf=R,
                         cutoff=CUTOFF, max_neighbors=63, envelope="cosine",
                         remat=False)
    np_state = {k: v.numpy() for k, v in state.items()}
    params = convert_state_dict("painn", np_state, model, batch)
    ours = np.asarray(model.apply(params, batch)["energy"])
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)
