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


# ---------------------------------------------------------------------------
# DimeNet++ (torch_geometric DimeNetPlusPlus inside DimeNetPlusPlusPotential;
# state keys as the reference registry rebuilds them, model_registry.py:143)
# ---------------------------------------------------------------------------

DPP = dict(hidden=16, num_blocks=2, int_emb_size=8, basis_emb_size=4,
           out_emb_channels=16, num_spherical=3, num_radial=4,
           num_before_skip=1, num_after_skip=2, num_output_layers=2,
           node_latent_dim=8, cutoff=CUTOFF, max_neighbors=16)


def dimenetpp_state(rng):
    H, E, BE, OE = DPP["hidden"], DPP["int_emb_size"], DPP["basis_emb_size"], DPP["out_emb_channels"]
    S, R_, D = DPP["num_spherical"], DPP["num_radial"], DPP["node_latent_dim"]
    shapes = {
        "net.emb.emb.weight": (95, H),
        "net.emb.lin_rbf.weight": (H, R_), "net.emb.lin_rbf.bias": (H,),
        "net.emb.lin.weight": (H, 3 * H), "net.emb.lin.bias": (H,),
    }
    for i in range(DPP["num_blocks"] + 1):
        b = f"net.output_blocks.{i}."
        shapes.update({
            b + "lin_rbf.weight": (H, R_), b + "lin_up.weight": (OE, H),
            b + "lin.weight": (D, OE),
        })
        for k in range(DPP["num_output_layers"]):
            shapes.update({b + f"lins.{k}.weight": (OE, OE), b + f"lins.{k}.bias": (OE,)})
    for i in range(DPP["num_blocks"]):
        b = f"net.interaction_blocks.{i}."
        shapes.update({
            b + "lin_ji.weight": (H, H), b + "lin_ji.bias": (H,),
            b + "lin_kj.weight": (H, H), b + "lin_kj.bias": (H,),
            b + "lin_rbf1.weight": (BE, R_), b + "lin_rbf2.weight": (H, BE),
            b + "lin_sbf1.weight": (BE, S * R_), b + "lin_sbf2.weight": (E, BE),
            b + "lin_down.weight": (E, H), b + "lin_up.weight": (H, E),
            b + "lin.weight": (H, H), b + "lin.bias": (H,),
        })
        for k in range(DPP["num_before_skip"]):
            shapes.update({b + f"layers_before_skip.{k}.lin1.weight": (H, H),
                           b + f"layers_before_skip.{k}.lin1.bias": (H,),
                           b + f"layers_before_skip.{k}.lin2.weight": (H, H),
                           b + f"layers_before_skip.{k}.lin2.bias": (H,)})
        for k in range(DPP["num_after_skip"]):
            shapes.update({b + f"layers_after_skip.{k}.lin1.weight": (H, H),
                           b + f"layers_after_skip.{k}.lin1.bias": (H,),
                           b + f"layers_after_skip.{k}.lin2.weight": (H, H),
                           b + f"layers_after_skip.{k}.lin2.bias": (H,)})
    shapes.update({
        "regr_or_cls_nn.0.weight": (D, D), "regr_or_cls_nn.0.bias": (D,),
        "regr_or_cls_nn.2.weight": (D // 2, D), "regr_or_cls_nn.2.bias": (D // 2,),
        "regr_or_cls_nn.4.weight": (D // 2, D // 2), "regr_or_cls_nn.4.bias": (D // 2,),
        "regr_or_cls_nn.6.weight": (1, D // 2), "regr_or_cls_nn.6.bias": (1,),
    })
    state = rand_state(rng, shapes)
    state["net.rbf.freq"] = torch.asarray(
        (np.arange(1, R_ + 1) * np.pi + rng.normal(size=R_) * 0.1).astype(np.float32)
    )  # trained (non-nπ) frequencies must convert too
    return state


def _tg_envelope(x, p=5):
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2.0)
    c = -p * (p + 1) / 2.0
    xs = x.clamp(min=1e-8)
    u = 1.0 / xs + a * x ** (p - 1) + b * x**p + c * x ** (p + 1)
    return torch.where(x < 1.0, u, torch.zeros(()))


def _tg_sbf(d, cos_angle, trip_mask):
    """torch SphericalBasisLayer: normalized j_l at bessel zeros × Y_l0."""
    from nabladft_tpu.ops.spherical import spherical_bessel_zeros

    S, R_ = DPP["num_spherical"], DPP["num_radial"]
    zeros = torch.asarray(np.asarray(spherical_bessel_zeros(S - 1, R_), np.float32))
    x = (d / CUTOFF).clamp(min=1e-8)

    def jl(t, l):  # spherical bessel by recursion
        t = t.clamp(min=1e-6)
        j = [torch.sin(t) / t, torch.sin(t) / t**2 - torch.cos(t) / t]
        for ll in range(2, l + 1):
            j.append((2 * ll - 1) / t * j[ll - 1] - j[ll - 2])
        return j[l]

    # legendre P_l(cos)
    p0 = torch.ones_like(cos_angle)
    p1 = cos_angle
    pls = [p0, p1]
    for ll in range(2, S):
        pls.append(((2 * ll - 1) * cos_angle * pls[ll - 1] - (ll - 1) * pls[ll - 2]) / ll)
    env = _tg_envelope(d / CUTOFF)
    out = []
    for l in range(S):
        norm = math.sqrt(2.0) / np.abs(np.asarray(jl(zeros[l], l + 1)))
        y = math.sqrt((2 * l + 1) / (4 * math.pi)) * pls[l]
        for n in range(R_):
            out.append(env * float(norm[n]) * jl(zeros[l, n] * x, l) * y)
    sbf = torch.stack(out, dim=-1)
    return torch.where(torch.asarray(np.asarray(trip_mask))[..., None], sbf,
                       torch.zeros(()))


def dimenetpp_torch_forward(state, batch):
    """Dense-formulation functional-torch DimeNetPlusPlus + Potential head."""
    H = DPP["hidden"]
    adj, dist, unit = pair_terms(batch.pos, batch.node_mask)
    B, A = dist.shape[:2]
    x_sc = (dist / CUTOFF)
    freq = state["net.rbf.freq"]
    rbf = _tg_envelope(x_sc)[..., None] * torch.sin(freq * x_sc.clamp(min=1e-8)[..., None])
    rbf = torch.where(adj[..., None], rbf, torch.zeros(()))

    # triplets (k -> j -> i) on the dense lattice [B, i, j, k]
    v_ji = -unit  # [B,i,j]: direction j->i
    u_jk = unit[:, None, :, :, :].expand(B, A, A, A, 3)  # [B,i,j,k] dir j->k
    cos = (v_ji[:, :, :, None, :] * u_jk).sum(-1).clamp(-1.0, 1.0)
    eye = torch.eye(A, dtype=torch.bool)
    trip = adj[:, :, :, None] & adj[:, None, :, :] & ~eye[None, :, None, :]
    d_kj = dist[:, None, :, :].expand(B, A, A, A)
    sbf = _tg_sbf(d_kj, cos, trip)

    emb = state["net.emb.emb.weight"]
    x = emb[torch.asarray(np.asarray(batch.z), dtype=torch.long).clamp(max=94)]
    rbf_e = swish_t(lin(state, "net.emb.lin_rbf", rbf))
    m = swish_t(lin(state, "net.emb.lin", torch.cat(
        [x[:, :, None, :].expand(B, A, A, H), x[:, None, :, :].expand(B, A, A, H), rbf_e], dim=-1)))
    m = torch.where(adj[..., None], m, torch.zeros(()))

    def output_block(i, m):
        b = f"net.output_blocks.{i}."
        g = lin(state, b + "lin_rbf", rbf, bias=False) * m
        node = torch.where(adj[..., None], g, torch.zeros(())).sum(2)
        node = lin(state, b + "lin_up", node, bias=False)
        for k in range(DPP["num_output_layers"]):
            node = swish_t(lin(state, b + f"lins.{k}", node))
        return lin(state, b + "lin", node, bias=False)

    P = output_block(0, m)
    for i in range(DPP["num_blocks"]):
        b = f"net.interaction_blocks.{i}."
        x_ji = swish_t(lin(state, b + "lin_ji", m))
        x_kj = swish_t(lin(state, b + "lin_kj", m))
        x_kj = x_kj * lin(state, b + "lin_rbf2",
                          lin(state, b + "lin_rbf1", rbf, bias=False), bias=False)
        x_kj = swish_t(lin(state, b + "lin_down", x_kj, bias=False))
        sbf_w = lin(state, b + "lin_sbf2",
                    lin(state, b + "lin_sbf1", sbf, bias=False), bias=False)
        # gather edge (k->j) messages for each (j->i): t[b,i,j,k] = x_kj[b,j,k]
        t = x_kj[:, None, :, :, :].expand(B, A, A, A, x_kj.shape[-1])
        aggt = torch.where(trip[..., None], t * sbf_w, torch.zeros(())).sum(3)
        x_kj2 = swish_t(lin(state, b + "lin_up", aggt, bias=False))
        h = x_ji + x_kj2
        for k in range(DPP["num_before_skip"]):
            bb = b + f"layers_before_skip.{k}."
            h = h + swish_t(lin(state, bb + "lin2", swish_t(lin(state, bb + "lin1", h))))
        h = swish_t(lin(state, b + "lin", h)) + m
        for k in range(DPP["num_after_skip"]):
            bb = b + f"layers_after_skip.{k}."
            h = h + swish_t(lin(state, bb + "lin2", swish_t(lin(state, bb + "lin1", h))))
        m = torch.where(adj[..., None], h, torch.zeros(()))
        P = P + output_block(i + 1, m)

    latent = (P * torch.asarray(batch.node_mask)[..., None]).sum(1)
    h = latent
    for idx in (0, 2, 4):
        h = swish_t(lin(state, f"regr_or_cls_nn.{idx}", h))
    return lin(state, "regr_or_cls_nn.6", h)[..., 0]


def swish_t(x):
    return x * torch.sigmoid(x)


def test_dimenetpp_converter_golden(rng):
    batch = mk_batch(rng, B=3, A=8)
    state = dimenetpp_state(np.random.default_rng(13))
    golden = dimenetpp_torch_forward(state, batch).numpy()

    model = create_model("dimenetpp", **DPP)
    np_state = {k: v.numpy() for k, v in state.items()}
    params = convert_state_dict("dimenetpp", np_state, model, batch)
    ours = np.asarray(model.apply(params, batch)["energy"])
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Graphormer3D (graphormer/graphormer_3d.py:227-321; registry-rebuilt keys)
# ---------------------------------------------------------------------------

G3D = dict(embed_dim=16, ffn_embed_dim=32, attention_heads=4, layers=2,
           blocks=2, num_kernel=8, atom_types=64)


def graphormer_state(rng):
    E, FF, K = G3D["embed_dim"], G3D["ffn_embed_dim"], G3D["num_kernel"]
    H = G3D["attention_heads"]
    shapes = {
        "atom_encoder.weight": (64, E), "tag_encoder.weight": (3, E),
        "gbf.means.weight": (1, K), "gbf.stds.weight": (1, K),
        "gbf.mul.weight": (64 * 64, 1), "gbf.bias.weight": (64 * 64, 1),
        "edge_proj.weight": (E, K), "edge_proj.bias": (E,),
        "bias_proj.layer1.weight": (K, K), "bias_proj.layer1.bias": (K,),
        "bias_proj.layer2.weight": (H, K), "bias_proj.layer2.bias": (H,),
        "final_ln.weight": (E,), "final_ln.bias": (E,),
        "energy_proj.layer1.weight": (E, E), "energy_proj.layer1.bias": (E,),
        "energy_proj.layer2.weight": (1, E), "energy_proj.layer2.bias": (1,),
        "energy_agg_factor.weight": (3, 1),
    }
    for i in range(G3D["layers"]):
        b = f"layers.{i}."
        shapes.update({
            b + "self_attn.in_proj.weight": (3 * E, E), b + "self_attn.in_proj.bias": (3 * E,),
            b + "self_attn.out_proj.weight": (E, E), b + "self_attn.out_proj.bias": (E,),
            b + "fc1.weight": (FF, E), b + "fc1.bias": (FF,),
            b + "fc2.weight": (E, FF), b + "fc2.bias": (E,),
            b + "self_attn_layer_norm.weight": (E,), b + "self_attn_layer_norm.bias": (E,),
            b + "final_layer_norm.weight": (E,), b + "final_layer_norm.bias": (E,),
        })
    for name in ("q_proj", "k_proj", "v_proj"):
        shapes[f"node_proj.{name}.weight"] = (E, E)
        shapes[f"node_proj.{name}.bias"] = (E,)
    for name in ("force_proj1", "force_proj2", "force_proj3"):
        shapes[f"node_proj.{name}.weight"] = (1, E)
        shapes[f"node_proj.{name}.bias"] = (1,)
    state = rand_state(rng, shapes)
    # LayerNorm weights ~1, biases ~0 keep activations sane
    for k in list(state):
        if "layer_norm" in k or k.startswith("final_ln"):
            state[k] = torch.ones_like(state[k]) if k.endswith("weight") else torch.zeros_like(state[k])
    state["gbf.stds.weight"] = state["gbf.stds.weight"].abs() + 0.5
    return state


def graphormer_torch_forward(state, batch):
    """Functional-torch Graphormer3D (eval mode, no dropout)."""
    E, H, K = G3D["embed_dim"], G3D["attention_heads"], G3D["num_kernel"]
    dh = E // H
    atoms = torch.asarray(np.where(batch.node_mask, batch.z, 0)).long()
    pos = torch.asarray(batch.pos)
    tags = torch.asarray(batch.node_mask.astype(np.int64))
    padding = atoms.eq(0)
    delta = pos.unsqueeze(1) - pos.unsqueeze(2)  # [b,i,j] = pos_j - pos_i
    dist = delta.norm(dim=-1)
    delta = delta / (dist.unsqueeze(-1) + 1e-5)
    edge_type = atoms.unsqueeze(2) * 64 + atoms.unsqueeze(1)

    mul = state["gbf.mul.weight"][edge_type][..., 0]
    bias = state["gbf.bias.weight"][edge_type][..., 0]
    x_g = (mul * dist + bias).unsqueeze(-1).expand(*dist.shape, K)
    mean = state["gbf.means.weight"].view(-1)
    std = state["gbf.stds.weight"].view(-1).abs() + 1e-5
    pi = 3.14159
    gbf = torch.exp(-0.5 * ((x_g - mean) / std) ** 2) / ((2 * pi) ** 0.5 * std)
    edge_features = gbf.masked_fill(padding.unsqueeze(1).unsqueeze(-1), 0.0)

    x = (state["tag_encoder.weight"][tags] + state["atom_encoder.weight"][atoms]
         + lin(state, "edge_proj", edge_features.sum(dim=-2)))

    attn_bias = lin(state, "bias_proj.layer2",
                    torch.nn.functional.gelu(lin(state, "bias_proj.layer1", gbf)))
    attn_bias = attn_bias.permute(0, 3, 1, 2).contiguous()
    attn_bias = attn_bias.masked_fill(padding.unsqueeze(1).unsqueeze(2), float("-inf"))

    def ln(x, name):
        mu = x.mean(-1, keepdim=True)
        var = ((x - mu) ** 2).mean(-1, keepdim=True)
        xh = (x - mu) / torch.sqrt(var + 1e-6)
        return xh * state[name + ".weight"] + state[name + ".bias"]

    for _ in range(G3D["blocks"]):
        for i in range(G3D["layers"]):
            b = f"layers.{i}."
            res = x
            h = ln(x, b + "self_attn_layer_norm")
            qkv = lin(state, b + "self_attn.in_proj", h)
            q, k, v = qkv.chunk(3, dim=-1)
            B, A = q.shape[:2]
            q = q.view(B, A, H, dh).transpose(1, 2) * dh**-0.5
            k = k.view(B, A, H, dh).transpose(1, 2)
            v = v.view(B, A, H, dh).transpose(1, 2)
            w = q @ k.transpose(-1, -2) + attn_bias
            pr = torch.softmax(w, dim=-1)
            att = (pr @ v).transpose(1, 2).reshape(B, A, E)
            x = res + lin(state, b + "self_attn.out_proj", att)
            res = x
            h = ln(x, b + "final_layer_norm")
            h = torch.nn.functional.gelu(lin(state, b + "fc1", h))
            x = res + lin(state, b + "fc2", h)
    x = ln(x, "final_ln")

    eng = lin(state, "energy_proj.layer2",
              torch.nn.functional.gelu(lin(state, "energy_proj.layer1", x)))
    eng = (eng * state["energy_agg_factor.weight"][tags]).flatten(-2)
    out_mask = (tags > 0)
    energy = (eng * out_mask).sum(dim=-1)

    # NodeTaskHead
    B, A = x.shape[:2]
    q = lin(state, "node_proj.q_proj", x).view(B, A, H, dh).transpose(1, 2) * dh**-0.5
    k = lin(state, "node_proj.k_proj", x).view(B, A, H, dh).transpose(1, 2)
    v = lin(state, "node_proj.v_proj", x).view(B, A, H, dh).transpose(1, 2)
    attn = q @ k.transpose(-1, -2)
    pr = torch.softmax(attn + attn_bias, dim=-1)
    rot = pr.unsqueeze(-1) * delta.unsqueeze(1)  # [B,H,i,j,3]
    rot = rot.permute(0, 1, 4, 2, 3)
    f = rot @ v.unsqueeze(2)  # [B,H,3,A,dh]
    f = f.permute(0, 3, 2, 1, 4).contiguous().view(B, A, 3, E)
    f1 = lin(state, "node_proj.force_proj1", f[:, :, 0, :])
    f2 = lin(state, "node_proj.force_proj2", f[:, :, 1, :])
    f3 = lin(state, "node_proj.force_proj3", f[:, :, 2, :])
    forces = torch.cat([f1, f2, f3], dim=-1) * out_mask.unsqueeze(-1)
    return energy, forces


def test_graphormer3d_converter_golden(rng):
    batch = mk_batch(rng, B=3, A=8)
    state = graphormer_state(np.random.default_rng(17))
    golden_e, golden_f = graphormer_torch_forward(state, batch)

    model = create_model("graphormer3d", **G3D)
    np_state = {k: v.numpy() for k, v in state.items()}
    params = convert_state_dict("graphormer3d", np_state, model, batch)
    out = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out["energy"]), golden_e.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["forces"]), golden_f.numpy(),
                               rtol=2e-4, atol=2e-5)
