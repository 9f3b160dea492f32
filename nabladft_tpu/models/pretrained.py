"""Pretrained-model registry: download + torch→flax weight conversion.

The analog of the reference's ModelRegistry
(nablaDFT/model_registry.py:16-150): resolve '<Model>_<split>' names to
checkpoint URLs (42 published checkpoints, links/models_checkpoints.json),
download with ETag validation, and restore weights into a framework model.

Published checkpoints are PyTorch state dicts, so restoring them here means
a structural conversion. Converters are registered per family; they map
torch parameter names/layouts onto the flax parameter tree. Covered (7/9):
SchNet, PaiNN, DimeNet++, Graphormer3D, eSCN, EquiformerV2, QHNet (the
eSCN/EqV2/QHNet conversions are verbatim — our table-free real-SH basis
proves to be exactly e3nn's under a fixed axis relabel, see convert_escn
and convert_qhnet; EqV2 checkpoints need `m_share_rad=False`, QHNet
checkpoints `ref_compat=True`).

Convertibility verdict on the remaining two families:

* GemNet-OC — NOT convertible without rebuilding the reference module
  graph. The reference (gemnet/gemnet_oc.py, 4891 LoC) threads ~40
  ResidualLayer stacks and shared-basis MLPs whose parameters have no
  counterpart in our 476-LoC factored design; since round 4 the triplet
  contraction is additionally re-parameterized (the Legendre
  addition-theorem pair factorization replaced the explicit cbf lattice,
  models/gemnet_oc.py), so even the basis projections no longer map
  weight-for-weight. A converter would amount to re-implementing the
  reference architecture alongside ours. Re-train instead (the trainer
  fits its frozen ScaleFactors from data at fit start).

* PhiSNet — NOT convertible for the same reason: our 278-LoC rebuild
  keeps the reference's data flow (env-independent overlap branch,
  module-accumulated output features) but re-designs the modules
  themselves — compact scalar-gated ResidualStacks and QHNet's shared CG
  Expansion replace the reference's per-L SphericalLinear /
  modular_block / pair_mixing residual towers
  (phisnet/nn/neural_network.py:222-435, nn/modules/) — so the
  reference's per-block weights have no shape-compatible destination.
  Re-train (results/acc_phisnet.json shows the rebuild reaching the
  published tiny-split H-MAE, 1.58e-4 <= 1.9e-4 Eh).

Note torch Linear stores weight as [out, in]; flax Dense as [in, out].
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict

import numpy as np

from nabladft_tpu.data.registry import checkpoint_registry

logger = logging.getLogger(__name__)

_CONVERTERS: Dict[str, Callable] = {}


def register_converter(family: str):
    def deco(fn):
        _CONVERTERS[family.lower()] = fn
        return fn

    return deco


def convertible_families():
    return sorted(_CONVERTERS)


def load_torch_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Load a torch/lightning checkpoint into numpy arrays (CPU torch)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out,in] -> flax kernel [in,out]."""
    return np.ascontiguousarray(w.T)


def _fill(params: Dict, dotted: str, value: np.ndarray) -> None:
    node = params
    parts = dotted.split("/")
    for p in parts[:-1]:
        node = node[p]
    target = node[parts[-1]]
    if tuple(target.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {dotted}: {target.shape} vs {value.shape}"
        )
    node[parts[-1]] = value.astype(np.asarray(target).dtype)


@register_converter("schnet")
def convert_schnet(state: Dict[str, np.ndarray], params: Dict) -> Dict:
    """schnetpack SchNet (reference config/model/schnet.yaml composition) →
    models.schnet.SchNet. Key prefixes follow schnetpack's
    NeuralNetworkPotential: representation.* / output_modules.0.*"""
    p = params["params"]
    pre = "model.representation."
    _fill(p, "atom_embedding/embedding", state[pre + "embedding.weight"])
    n_keys = len([k for k in state if k.startswith(pre + "interactions")])
    for i in range(n_keys // 9):  # 9 tensors per schnetpack SchNetInteraction
        b = f"{pre}interactions.{i}."
        # filter MLP lives as raw arrays (shared XLA/Pallas layout)
        _fill(p, f"filter_{i}_w1", _t(state[b + "filter_network.0.weight"]))
        _fill(p, f"filter_{i}_b1", state[b + "filter_network.0.bias"][None, :])
        _fill(p, f"filter_{i}_w2", _t(state[b + "filter_network.1.weight"]))
        _fill(p, f"filter_{i}_b2", state[b + "filter_network.1.bias"][None, :])
        _fill(p, f"in2f_{i}/kernel", _t(state[b + "in2f.weight"]))
        _fill(p, f"f2out_{i}_0/kernel", _t(state[b + "f2out.0.weight"]))
        _fill(p, f"f2out_{i}_0/bias", state[b + "f2out.0.bias"])
        _fill(p, f"f2out_{i}_1/kernel", _t(state[b + "f2out.1.weight"]))
        _fill(p, f"f2out_{i}_1/bias", state[b + "f2out.1.bias"])
    out_pre = "model.output_modules.0.outnet."
    _fill(p, "atomwise/Dense_0/kernel", _t(state[out_pre + "0.weight"]))
    _fill(p, "atomwise/Dense_0/bias", state[out_pre + "0.bias"])
    _fill(p, "atomwise/Dense_1/kernel", _t(state[out_pre + "1.weight"]))
    _fill(p, "atomwise/Dense_1/bias", state[out_pre + "1.bias"])
    return params


def _perm_msg(cols: np.ndarray, f: int, axis: int = -1) -> np.ndarray:
    """schnetpack message channels (dq, dmuR·û, dmumu·μ_j) → framework
    channels (ds, v-term, û-term): [0:F | 2F:3F | F:2F]."""
    parts = np.split(cols, 3, axis=axis)
    return np.concatenate([parts[0], parts[2], parts[1]], axis=axis)


def _perm_upd(cols: np.ndarray, f: int, axis: int = -1) -> np.ndarray:
    """schnetpack mixing gates (dq, dmu, dqmu) → framework (a_vv, a_sv,
    a_ss) = (dmu, dqmu, dq)."""
    parts = np.split(cols, 3, axis=axis)
    return np.concatenate([parts[1], parts[2], parts[0]], axis=axis)


@register_converter("painn")
def convert_painn(state: Dict[str, np.ndarray], params: Dict) -> Dict:
    """schnetpack PaiNN → models.painn.PaiNN. The dense-pair formulation
    keeps identical parameter shapes; channel ORDER differs: the framework's
    message splits are (scalar, μ_j-term, û-term) vs schnetpack's
    (dq, dmuR·û, dmumu·μ_j), and its update gates are (a_vv, a_sv, a_ss)
    vs schnetpack's (dq, dmu, dqmu) — hence the column permutations.
    Verified against a functional-torch schnetpack forward in
    tests/models/test_pretrained_converters.py."""
    p = params["params"]
    pre = "model.representation."
    _fill(p, "atom_embedding/embedding", state[pre + "embedding.weight"])
    n_layers = len({k.split(".")[3] for k in state if k.startswith(pre + "interactions")})
    f = state[pre + "embedding.weight"].shape[1]
    # shared filter net: one Dense(n_rbf -> n_layers*3F); slice per layer
    fw = _t(state[pre + "filter_net.weight"])  # [R, L*3F]
    fb = state[pre + "filter_net.bias"]
    for i in range(n_layers):
        li = f"layer_{i}"
        b = f"{pre}interactions.{i}."
        # intra-atom phi MLP; last layer's 3F outputs permuted to our order
        _fill(p, f"{li}/message/MLP_0/Dense_0/kernel", _t(state[b + "interatomic_context_net.0.weight"]))
        _fill(p, f"{li}/message/MLP_0/Dense_0/bias", state[b + "interatomic_context_net.0.bias"])
        _fill(p, f"{li}/message/MLP_0/Dense_1/kernel", _perm_msg(_t(state[b + "interatomic_context_net.1.weight"]), f))
        _fill(p, f"{li}/message/MLP_0/Dense_1/bias", _perm_msg(state[b + "interatomic_context_net.1.bias"], f))
        sl = fw[:, i * 3 * f : (i + 1) * 3 * f]
        _fill(p, f"{li}/message/filter_kernel", _perm_msg(sl, f))
        _fill(p, f"{li}/message/filter_bias", _perm_msg(fb[i * 3 * f : (i + 1) * 3 * f], f))
        u = f"{pre}mixing.{i}."
        mix = _t(state[u + "mu_channel_mix.weight"])  # [F, 2F] = (mu_V | mu_W)
        _fill(p, f"{li}/update/Dense_0/kernel", mix[:, f:])   # u  <- mu_W
        _fill(p, f"{li}/update/Dense_1/kernel", mix[:, :f])   # vv <- mu_V
        _fill(p, f"{li}/update/MLP_0/Dense_0/kernel", _t(state[u + "intraatomic_context_net.0.weight"]))
        _fill(p, f"{li}/update/MLP_0/Dense_0/bias", state[u + "intraatomic_context_net.0.bias"])
        _fill(p, f"{li}/update/MLP_0/Dense_1/kernel", _perm_upd(_t(state[u + "intraatomic_context_net.1.weight"]), f))
        _fill(p, f"{li}/update/MLP_0/Dense_1/bias", _perm_upd(state[u + "intraatomic_context_net.1.bias"], f))
    out_pre = "model.output_modules.0.outnet."
    _fill(p, "energy_head/Dense_0/kernel", _t(state[out_pre + "0.weight"]))
    _fill(p, "energy_head/Dense_0/bias", state[out_pre + "0.bias"])
    _fill(p, "energy_head/Dense_1/kernel", _t(state[out_pre + "1.weight"]))
    _fill(p, "energy_head/Dense_1/bias", state[out_pre + "1.bias"])
    return params


@register_converter("dimenetpp")
def convert_dimenetpp(state: Dict[str, np.ndarray], params: Dict, model=None) -> Dict:
    """Reference DimeNet++ (torch_geometric DimeNetPlusPlus wrapped by
    DimeNetPlusPlusPotential, dimenetplusplus.py:22-116) → models.dimenetpp.
    Keys follow the reference registry's rebuilt state dict
    (model_registry.py:143-148 strips the Lightning 'net.' level):
    'net.<tg module>' + 'regr_or_cls_nn.<head>'. The basis functions match
    torch_geometric verbatim (ops/radial.dimenet_bessel_rbf,
    ops/spherical.dimenet_spherical_basis), so weights copy unscaled —
    EXCEPT the three kernels that absorb the model's static aggregation
    normalizers (InteractionPPBlock.agg_norm / OutputPPBlock.agg_norm /
    DimeNetPP.atom_norm): the TPU model divides each aggregated sum by a
    constant for trainability, and multiplying the immediately-following
    linear kernel by the same constant reproduces the torch function
    exactly (golden-tested)."""
    from nabladft_tpu.models.dimenetpp import DimeNetPP

    ref = model if model is not None else DimeNetPP
    k_norm = float(ref.max_neighbors)
    a_norm = float(ref.atom_norm)
    p = params["params"]
    pre = "net."
    _fill(p, "rbf_freq", state[pre + "rbf.freq"])
    emb = state[pre + "emb.emb.weight"]  # tg Embedding(95, H)
    tgt = p["atom_embedding"]["embedding"]
    padded = np.zeros_like(np.asarray(tgt))
    padded[: emb.shape[0]] = emb
    _fill(p, "atom_embedding/embedding", padded)
    _fill(p, "rbf_embed/kernel", _t(state[pre + "emb.lin_rbf.weight"]))
    _fill(p, "rbf_embed/bias", state[pre + "emb.lin_rbf.bias"])
    _fill(p, "edge_embed/kernel", _t(state[pre + "emb.lin.weight"]))
    _fill(p, "edge_embed/bias", state[pre + "emb.lin.bias"])

    n_out = len([k for k in state if ".lin_up.weight" in k and "output_blocks" in k])
    for i in range(n_out):
        b = f"{pre}output_blocks.{i}."
        o = f"output_{i}"
        _fill(p, f"{o}/lin_rbf/kernel", _t(state[b + "lin_rbf.weight"]))
        _fill(p, f"{o}/lin_up/kernel", k_norm * _t(state[b + "lin_up.weight"]))
        k = 0
        while b + f"lins.{k}.weight" in state:
            _fill(p, f"{o}/lin_{k}/kernel", _t(state[b + f"lins.{k}.weight"]))
            _fill(p, f"{o}/lin_{k}/bias", state[b + f"lins.{k}.bias"])
            k += 1
        _fill(p, f"{o}/lin_out/kernel", _t(state[b + "lin.weight"]))

    n_int = len([k for k in state if ".lin_ji.weight" in k])
    for i in range(n_int):
        b = f"{pre}interaction_blocks.{i}."
        t = f"interaction_{i}"
        _fill(p, f"{t}/lin_ji/kernel", _t(state[b + "lin_ji.weight"]))
        _fill(p, f"{t}/lin_ji/bias", state[b + "lin_ji.bias"])
        _fill(p, f"{t}/lin_kj/kernel", _t(state[b + "lin_kj.weight"]))
        _fill(p, f"{t}/lin_kj/bias", state[b + "lin_kj.bias"])
        _fill(p, f"{t}/rbf1/kernel", _t(state[b + "lin_rbf1.weight"]))
        _fill(p, f"{t}/rbf2/kernel", _t(state[b + "lin_rbf2.weight"]))
        _fill(p, f"{t}/sbf1_kernel", _t(state[b + "lin_sbf1.weight"]))
        _fill(p, f"{t}/sbf2_kernel", _t(state[b + "lin_sbf2.weight"]))
        _fill(p, f"{t}/down/kernel", _t(state[b + "lin_down.weight"]))
        _fill(p, f"{t}/up/kernel", k_norm * _t(state[b + "lin_up.weight"]))
        _fill(p, f"{t}/skip/kernel", _t(state[b + "lin.weight"]))
        _fill(p, f"{t}/skip/bias", state[b + "lin.bias"])
        for group, tgt_g in (("layers_before_skip", "before_skip"),
                             ("layers_after_skip", "after_skip")):
            k = 0
            while b + f"{group}.{k}.lin1.weight" in state:
                _fill(p, f"{t}/{tgt_g}_{k}/Dense_0/kernel",
                      _t(state[b + f"{group}.{k}.lin1.weight"]))
                _fill(p, f"{t}/{tgt_g}_{k}/Dense_0/bias",
                      state[b + f"{group}.{k}.lin1.bias"])
                _fill(p, f"{t}/{tgt_g}_{k}/Dense_1/kernel",
                      _t(state[b + f"{group}.{k}.lin2.weight"]))
                _fill(p, f"{t}/{tgt_g}_{k}/Dense_1/bias",
                      state[b + f"{group}.{k}.lin2.bias"])
                k += 1

    # graph-latent head: nn.Sequential(Linear, Swish)×3 + Linear → indices
    # 0, 2, 4, 6 (dimenetplusplus.py:85-93)
    for j, idx in enumerate((0, 2, 4, 6)):
        w = _t(state[f"regr_or_cls_nn.{idx}.weight"])
        if j == 0:
            w = a_norm * w  # absorb the atom-sum normalizer
        _fill(p, f"Dense_{j}/kernel", w)
        _fill(p, f"Dense_{j}/bias", state[f"regr_or_cls_nn.{idx}.bias"])
    return params


@register_converter("graphormer3d")
def convert_graphormer3d(state: Dict[str, np.ndarray], params: Dict) -> Dict:
    """Reference Graphormer3D (graphormer/graphormer_3d.py:227-321) →
    models.graphormer3d. Keys are the registry-rebuilt module paths
    (Lightning 'net.' stripped, model_registry.py:143-148)."""
    p = params["params"]
    _fill(p, "atom_encoder/embedding", state["atom_encoder.weight"])
    _fill(p, "tag_encoder/embedding", state["tag_encoder.weight"])
    _fill(p, "gbf/means", state["gbf.means.weight"][0])
    _fill(p, "gbf/stds", state["gbf.stds.weight"][0])
    _fill(p, "gbf/Embed_0/embedding", state["gbf.mul.weight"])
    _fill(p, "gbf/Embed_1/embedding", state["gbf.bias.weight"])
    _fill(p, "edge_proj/kernel", _t(state["edge_proj.weight"]))
    _fill(p, "edge_proj/bias", state["edge_proj.bias"])
    _fill(p, "bias_proj_0/kernel", _t(state["bias_proj.layer1.weight"]))
    _fill(p, "bias_proj_0/bias", state["bias_proj.layer1.bias"])
    _fill(p, "bias_proj_1/kernel", _t(state["bias_proj.layer2.weight"]))
    _fill(p, "bias_proj_1/bias", state["bias_proj.layer2.bias"])
    n_layers = len([k for k in state if k.endswith(".self_attn.in_proj.weight")])
    for i in range(n_layers):
        b = f"layers.{i}."
        t = f"layer_{i}"
        _fill(p, f"{t}/Dense_0/kernel", _t(state[b + "self_attn.in_proj.weight"]))
        _fill(p, f"{t}/Dense_0/bias", state[b + "self_attn.in_proj.bias"])
        _fill(p, f"{t}/Dense_1/kernel", _t(state[b + "self_attn.out_proj.weight"]))
        _fill(p, f"{t}/Dense_1/bias", state[b + "self_attn.out_proj.bias"])
        _fill(p, f"{t}/Dense_2/kernel", _t(state[b + "fc1.weight"]))
        _fill(p, f"{t}/Dense_2/bias", state[b + "fc1.bias"])
        _fill(p, f"{t}/Dense_3/kernel", _t(state[b + "fc2.weight"]))
        _fill(p, f"{t}/Dense_3/bias", state[b + "fc2.bias"])
        _fill(p, f"{t}/LayerNorm_0/scale", state[b + "self_attn_layer_norm.weight"])
        _fill(p, f"{t}/LayerNorm_0/bias", state[b + "self_attn_layer_norm.bias"])
        _fill(p, f"{t}/LayerNorm_1/scale", state[b + "final_layer_norm.weight"])
        _fill(p, f"{t}/LayerNorm_1/bias", state[b + "final_layer_norm.bias"])
    _fill(p, "final_ln/scale", state["final_ln.weight"])
    _fill(p, "final_ln/bias", state["final_ln.bias"])
    _fill(p, "energy_proj_0/kernel", _t(state["energy_proj.layer1.weight"]))
    _fill(p, "energy_proj_0/bias", state["energy_proj.layer1.bias"])
    _fill(p, "energy_proj_1/kernel", _t(state["energy_proj.layer2.weight"]))
    _fill(p, "energy_proj_1/bias", state["energy_proj.layer2.bias"])
    _fill(p, "energy_agg_factor/embedding", state["energy_agg_factor.weight"])
    fh = "force_head"
    for j, name in enumerate(("q_proj", "k_proj", "v_proj", "force_proj1",
                              "force_proj2", "force_proj3")):
        _fill(p, f"{fh}/Dense_{j}/kernel", _t(state[f"node_proj.{name}.weight"]))
        _fill(p, f"{fh}/Dense_{j}/bias", state[f"node_proj.{name}.bias"])
    return params


def _fill_rows(params: Dict, dotted: str, value: np.ndarray) -> None:
    """_fill for embedding tables whose element-count rows may differ:
    copies min(rows) and leaves the rest at init (reference tables carry
    max_num_elements=90+ rows; the TPU models default to 65)."""
    node = params
    parts = dotted.split("/")
    for p in parts[:-1]:
        node = node[p]
    target = np.asarray(node[parts[-1]])
    if target.shape[1:] != value.shape[1:]:
        raise ValueError(
            f"shape mismatch at {dotted}: {target.shape} vs {value.shape}"
        )
    out = target.copy()
    r = min(target.shape[0], value.shape[0])
    out[:r] = value[:r]
    node[parts[-1]] = out.astype(target.dtype)


@register_converter("escn")
def convert_escn(state: Dict[str, np.ndarray], params: Dict, model=None) -> Dict:
    """Reference eSCN (escn/escn.py:36-491) → models.escn.ESCN (XLA layout).

    Verbatim weight copy — no permutations or sign fixups. The two models'
    edge-frame coefficient stacks are IDENTICAL once the per-edge alignment
    gauges are matched: our recursion-built real-SH basis is e3nn's composed
    with the fixed cyclic axis relabel G:(x,y,z)→(y,z,x), i.e.
    D_ours(G) · W == I exactly for every l ≤ 11, where W is the basis
    intertwiner pinned against the reference's Jd.pt tables
    (tests/models/test_pretrained_escn.py::test_basis_transport_identity).
    Given that, the reference's m-primary coefficient grouping
    (escn/so3.py:70-110) is exactly our static m-major storage order, so
    every SO(2) weight maps 1:1.

    Gauge note: the reference aligns edges to ŷ with a RANDOM per-forward
    gauge (escn.py:449-452 uses a random reference vector); ours aligns to
    ẑ deterministically. SO(2) convolutions are exactly gauge-invariant;
    the truncated-grid activation is gauge-invariant up to its own aliasing
    — noise the reference itself accepts by randomizing the gauge.
    Remaining (quadrature-level) redesign deltas: Gauss-Legendre×uniform
    grid vs e3nn soft-grid; Fibonacci sphere samples vs CalcSpherePoints.

    Keys: registry-rebuilt module paths (the Lightning level stripped,
    model_registry.py:143-148)."""
    if not any(k.startswith("sphere_embedding") for k in state):
        for pre in ("net.", "model.", "module."):
            if any(k == pre + "sphere_embedding.weight" for k in state):
                state = {k[len(pre):]: v for k, v in state.items() if k.startswith(pre)}
                break
    p = params["params"]
    _fill_rows(p, "sphere_embedding/embedding", state["sphere_embedding.weight"])

    n_layers = len({k.split(".")[1] for k in state if k.startswith("layer_blocks.")})
    # mmax from the so2_conv module count of layer 0
    m_max = len({k.split(".")[5] for k in state
                 if k.startswith("layer_blocks.0.message_block.so2_block_source.so2_conv.")})
    for i in range(n_layers):
        t = f"layer_{i}"
        mb = f"layer_blocks.{i}.message_block."
        eb = mb + "edge_block."
        _fill(p, f"{t}/edge_block/fc_dist/kernel", _t(state[eb + "fc1_dist.weight"]))
        _fill(p, f"{t}/edge_block/fc_dist/bias", state[eb + "fc1_dist.bias"])
        _fill_rows(p, f"{t}/edge_block/src_embed/embedding", state[eb + "source_embedding.weight"])
        _fill_rows(p, f"{t}/edge_block/dst_embed/embedding", state[eb + "target_embedding.weight"])
        _fill(p, f"{t}/edge_block/fc_edge/kernel", _t(state[eb + "fc1_edge_attr.weight"]))
        _fill(p, f"{t}/edge_block/fc_edge/bias", state[eb + "fc1_edge_attr.bias"])
        for src, dst in (("so2_block_source", "so2_source"), ("so2_block_target", "so2_target")):
            sb = mb + src + "."
            _fill(p, f"{t}/{dst}/fc_dist0/kernel", _t(state[sb + "fc1_dist0.weight"]))
            _fill(p, f"{t}/{dst}/fc_dist0/bias", state[sb + "fc1_dist0.bias"])
            _fill(p, f"{t}/{dst}/fc1_m0/kernel", _t(state[sb + "fc1_m0.weight"]))
            _fill(p, f"{t}/{dst}/fc2_m0/kernel", _t(state[sb + "fc2_m0.weight"]))
            for m in range(1, m_max + 1):
                c = f"{sb}so2_conv.{m - 1}."
                mt = f"{t}/{dst}/so2_m{m}"
                _fill(p, f"{mt}/fc_dist/kernel", _t(state[c + "fc1_dist.weight"]))
                _fill(p, f"{mt}/fc_dist/bias", state[c + "fc1_dist.bias"])
                for w in ("fc1_r", "fc2_r", "fc1_i", "fc2_i"):
                    _fill(p, f"{mt}/{w}/kernel", _t(state[c + w + ".weight"]))
        lb = f"layer_blocks.{i}."
        for w in ("fc1_sphere", "fc2_sphere", "fc3_sphere"):
            _fill(p, f"{t}/{w}/kernel", _t(state[lb + w + ".weight"]))

    for blk, ours in (("energy_block", "energy"), ("force_block", "force")):
        _fill(p, f"{ours}_fc1/kernel", _t(state[f"{blk}.fc1.weight"]))
        _fill(p, f"{ours}_fc1/bias", state[f"{blk}.fc1.bias"])
        _fill(p, f"{ours}_fc2/kernel", _t(state[f"{blk}.fc2.weight"]))
        _fill(p, f"{ours}_fc2/bias", state[f"{blk}.fc2.bias"])
        _fill(p, f"{ours}_fc3/kernel", _t(state[f"{blk}.fc3.weight"]))
    return params


def _trunc_rescale(l_max: int, m_max: int) -> np.ndarray:
    """Per-l factor sqrt((2l+1)/(2M+1)) for l > M, else 1 — the reference's
    rotate_inv_rescale (so3.py:143-167) applied after every truncated
    rotate-back. Our model's rotate-back is the plain Wigner transpose, so
    the factor is absorbed into the weights that consume the rotated-back
    rows (per-l linear maps), keeping the hot path rescale-free."""
    return np.asarray([
        np.sqrt((2 * l + 1) / (2 * m_max + 1)) if l > m_max else 1.0
        for l in range(l_max + 1)
    ])


def _fill_radial_fn(p, prefix_ours, prefix_torch, state, n_layers=3,
                    out_row_scale=None):
    """Reference RadialFunction (radial_function.py): net indices are
    Linear(0), LN(1), SiLU(2), Linear(3), LN(4), SiLU(5), ..., Linear(last).
    Ours: lin_{i} / ln_{i}. `out_row_scale`: per-output-feature factor
    folded into the LAST Linear (weight rows + bias)."""
    for i in range(n_layers):
        tidx = 3 * i
        w = _t(state[f"{prefix_torch}.net.{tidx}.weight"])
        b = state[f"{prefix_torch}.net.{tidx}.bias"]
        if out_row_scale is not None and i == n_layers - 1:
            w = w * out_row_scale[None, :]
            b = b * out_row_scale
        _fill(p, f"{prefix_ours}/lin_{i}/kernel", w)
        _fill(p, f"{prefix_ours}/lin_{i}/bias", b)
        if i < n_layers - 1:
            _fill(p, f"{prefix_ours}/ln_{i}/scale",
                  state[f"{prefix_torch}.net.{tidx + 1}.weight"])
            _fill(p, f"{prefix_ours}/ln_{i}/bias",
                  state[f"{prefix_torch}.net.{tidx + 1}.bias"])


def _fill_norm_sh(p, prefix_ours, prefix_torch, state):
    """'layer_norm_sh' (layer_norm.py:117-215): l=0 LayerNorm + per-(l>0,
    channel) affine weight."""
    _fill(p, f"{prefix_ours}/ln0/scale", state[f"{prefix_torch}.norm_l0.weight"])
    _fill(p, f"{prefix_ours}/ln0/bias", state[f"{prefix_torch}.norm_l0.bias"])
    _fill(p, f"{prefix_ours}/affine_weight", state[f"{prefix_torch}.affine_weight"])


def _fill_so3_linear(p, prefix_ours, prefix_torch, state):
    """SO3_LinearV2 (so3.py:603-641): weight [L+1, out, in] -> [L+1, in, out]."""
    _fill(p, f"{prefix_ours}/weight",
          np.ascontiguousarray(state[f"{prefix_torch}.weight"].transpose(0, 2, 1)))
    _fill(p, f"{prefix_ours}/bias", state[f"{prefix_torch}.bias"])


def _fill_ref_ffn(p, prefix_ours, prefix_torch, state):
    """Reference FeedForwardNetwork w/ grid MLP + separable S2
    (transformer_block.py:328-455)."""
    _fill(p, f"{prefix_ours}/scalar_mlp/kernel",
          _t(state[f"{prefix_torch}.scalar_mlp.0.weight"]))
    _fill(p, f"{prefix_ours}/scalar_mlp/bias",
          state[f"{prefix_torch}.scalar_mlp.0.bias"])
    _fill_so3_linear(p, f"{prefix_ours}/so3_linear_1",
                     f"{prefix_torch}.so3_linear_1", state)
    for i, tidx in enumerate((0, 2, 4)):
        _fill(p, f"{prefix_ours}/grid_{i}/kernel",
              _t(state[f"{prefix_torch}.grid_mlp.{tidx}.weight"]))
    _fill_so3_linear(p, f"{prefix_ours}/so3_linear_2",
                     f"{prefix_torch}.so3_linear_2", state)


def _fill_eqv2_attention(p, ours, torch_pfx, state, model):
    """SO2EquivariantGraphAttention (transformer_block.py:22-326) with
    use_m_share_rad=False and per-block atom-edge embeddings."""
    L, M = model.l_max, model.m_max
    h, va = model.num_heads, model.attn_alpha_channels
    vc = model.attn_value_channels
    hid = model.attn_hidden_channels or h * vc

    _fill(p, f"{ours}/source_embedding/embedding",
          state[f"{torch_pfx}.source_embedding.weight"])
    _fill(p, f"{ours}/target_embedding/embedding",
          state[f"{torch_pfx}.target_embedding.weight"])
    _fill_radial_fn(p, f"{ours}/so2_conv_1/rad_func",
                    f"{torch_pfx}.so2_conv_1.rad_func", state)

    # fc_m0 out-feature order: torch = [extra (h·va then gating hid),
    # per-l (L+1)·out] (so2_ops.py:172-186, extra narrow'd at offset 0);
    # ours = [per-l, extra] — permute columns of the transposed kernel.
    def fc_m0(conv, out_c, extra_n):
        w = _t(state[f"{torch_pfx}.{conv}.fc_m0.weight"])  # [in, out]
        b = state[f"{torch_pfx}.{conv}.fc_m0.bias"]
        perm = np.concatenate([
            np.arange(extra_n, extra_n + (L + 1) * out_c),
            np.arange(0, extra_n),
        ])
        _fill(p, f"{ours}/{conv}/fc_m0/kernel", w[:, perm])
        _fill(p, f"{ours}/{conv}/fc_m0/bias", b[perm])

    fc_m0("so2_conv_1", hid, h * va + hid)
    fc_m0("so2_conv_2", h * vc, 0)
    for conv, out_c in (("so2_conv_1", hid), ("so2_conv_2", h * vc)):
        for m in range(1, M + 1):
            n_l = L + 1 - m
            w = state[f"{torch_pfx}.{conv}.so2_m_conv.{m - 1}.fc.weight"]
            _fill(p, f"{ours}/{conv}/fc_r_m{m}/kernel", _t(w[: n_l * out_c]))
            _fill(p, f"{ours}/{conv}/fc_i_m{m}/kernel", _t(w[n_l * out_c :]))

    _fill(p, f"{ours}/alpha_norm/scale", state[f"{torch_pfx}.alpha_norm.weight"])
    _fill(p, f"{ours}/alpha_norm/bias", state[f"{torch_pfx}.alpha_norm.bias"])
    _fill(p, f"{ours}/alpha_dot", state[f"{torch_pfx}.alpha_dot"])

    pw = state[f"{torch_pfx}.proj.weight"]  # [L+1, out, in]
    resc = _trunc_rescale(L, M)  # rotate_inv rescale folded into proj
    for l in range(L + 1):
        _fill(p, f"{ours}/proj_l{l}/kernel", _t(pw[l]) * resc[l])
    _fill(p, f"{ours}/proj_l0/bias", state[f"{torch_pfx}.proj.bias"])


@register_converter("equiformer_v2")
def convert_equiformer_v2(state: Dict[str, np.ndarray], params: Dict,
                          model=None) -> Dict:
    """EquiformerV2_OC20 (equiformer_v2_oc20.py:46) -> our m_share_rad=False
    (reference-compatible) variant. The shipped config leaves
    use_m_share_rad=False — per-m RadialFunction MLPs inside every
    SO2_Convolution — and share_atom_edge_embedding=false — per-block
    source/target embeddings; both are first-class model flags now
    (models/equiformer_v2.py). The verbatim-weight-copy argument is the
    eSCN one (test_pretrained_escn.test_basis_transport_identity): our
    basis is e3nn's under the fixed axis relabel, so edge-frame coefficient
    stacks are identical and every SO(2)/per-l weight maps 1:1.

    Requires a model built with m_share_rad=False, num_distance_basis=600,
    basis_width_scalar=2.0, attn_hidden_channels=64 (reference
    attn_hidden_channels)."""
    if getattr(model, "m_share_rad", True):
        raise ValueError(
            "equiformer_v2 checkpoints need the reference-compatible "
            "variant: create_model('equiformer_v2', m_share_rad=False, "
            "num_distance_basis=600, attn_hidden_channels=64, ...)"
        )
    p = params["params"] if "params" in params else params
    _fill(p, "sphere_embedding/embedding", state["sphere_embedding.weight"])
    _fill(p, "edge_degree_source_embedding/embedding",
          state["edge_degree_embedding.source_embedding.weight"])
    _fill(p, "edge_degree_target_embedding/embedding",
          state["edge_degree_embedding.target_embedding.weight"])
    # edge-degree output rows are the m=0 coefficients of every l; the
    # reference's rotate-back rescales l>M rows (so3.py:143-167) — fold it
    # into the RadialFunction's last Linear (row layout: l-major × C)
    deg_scale = np.repeat(_trunc_rescale(model.l_max, model.m_max),
                          model.sphere_channels)
    _fill_radial_fn(p, "edge_degree_rad", "edge_degree_embedding.rad_func",
                    state, out_row_scale=deg_scale)
    for i in range(model.num_layers):
        t = f"block_{i}"
        b = f"blocks.{i}"
        _fill_norm_sh(p, f"{t}/norm_1", f"{b}.norm_1", state)
        _fill_eqv2_attention(p, f"{t}/ga", f"{b}.ga", state, model)
        _fill_norm_sh(p, f"{t}/norm_2", f"{b}.norm_2", state)
        _fill_ref_ffn(p, f"{t}/ffn", f"{b}.ffn", state)
    _fill_norm_sh(p, "norm_final", "norm", state)
    _fill_ref_ffn(p, "energy_block", "energy_block", state)
    _fill_eqv2_attention(p, "force_block", "force_block", state, model)
    return params


def _e3nn_linear_fill(p, ours: str, torch_pfx: str, state, c_in: int,
                      c_out: int, n_l: int = 5) -> None:
    """e3nn o3.Linear (uniform multiplicity per l) -> IrrepsLinear.

    Flat weight = per-l [c_in, c_out] blocks in l order; forward divides by
    sqrt(fan_in) (path_normalization="element"), folded into the kernel.
    Flat bias covers the 0e outputs only."""
    w = state[f"{torch_pfx}.weight"].reshape(n_l, c_in, c_out)
    for l in range(n_l):
        _fill(p, f"{ours}/l{l}/kernel", w[l] / np.sqrt(c_in))
    _fill(p, f"{ours}/l0/bias", state[f"{torch_pfx}.bias"])


def _norm_gate_fill(p, ours: str, torch_pfx: str, state) -> None:
    """Reference NormGate.fc (plain Linear+SiLU+Linear, layers.py:123-148)
    -> our NormGate.gate_mlp (MLP)."""
    _fill(p, f"{ours}/gate_mlp/Dense_0/kernel", _t(state[f"{torch_pfx}.fc.0.weight"]))
    _fill(p, f"{ours}/gate_mlp/Dense_0/bias", state[f"{torch_pfx}.fc.0.bias"])
    _fill(p, f"{ours}/gate_mlp/Dense_1/kernel", _t(state[f"{torch_pfx}.fc.2.weight"]))
    _fill(p, f"{ours}/gate_mlp/Dense_1/bias", state[f"{torch_pfx}.fc.2.bias"])


def _qhnet_s0_rows(w_ref_in: np.ndarray, c: int, n_l: int, layer0: bool) -> np.ndarray:
    """Map the reference's invariant-input layout onto ours.

    Reference ConvLayer s0 = [dst_scalars | dst_scalars | ip_{l>0}]
    (layers.py:239-259 — BOTH scalar blocks are edge_dst); ours is
    [i(=dst) | j(=src) | ip_{l=0} | ip_{l>0}]. So our dst rows take the SUM
    of the reference's two scalar blocks, our src and ip_l0 rows are zero.
    With `layer0` the reference input is just the two scalar blocks.
    For PairNet (dst|src|ip_{l>0}, distinct blocks) use _qhnet_s0_rows_pair."""
    out = np.zeros(((n_l + 2) * c, w_ref_in.shape[1]), w_ref_in.dtype)
    out[0:c] = w_ref_in[0:c] + w_ref_in[c : 2 * c]
    if not layer0:
        out[3 * c :] = w_ref_in[2 * c :]
    return out


def _qhnet_s0_rows_pair(w_ref_in: np.ndarray, c: int, n_l: int) -> np.ndarray:
    out = np.zeros(((n_l + 2) * c, w_ref_in.shape[1]), w_ref_in.dtype)
    out[0:c] = w_ref_in[0:c]          # dst scalars
    out[c : 2 * c] = w_ref_in[c : 2 * c]  # src scalars
    out[3 * c :] = w_ref_in[2 * c :]  # ip l>=1 (ours keeps ip l=0 rows: zero)
    return out


@register_converter("qhnet")
def convert_qhnet(state: Dict[str, np.ndarray], params: Dict, model=None) -> Dict:
    """Reference QHNet (qhnet/qhnet.py:24-343, layers.py) -> models.qhnet.QHNet
    built with ``ref_compat=True``.

    The conversion is exact (no architecture approximation) because of one
    measured identity: our recursion real-SH basis equals e3nn's evaluated
    at the cyclically permuted argument — Y_e3nn(v[[1,2,0]]) == Y_ours(v)
    for every l — and the reference feeds exactly that permutation to
    o3.spherical_harmonics (qhnet.py:267). Reference features therefore
    live in OUR basis verbatim; every e3nn wigner-3j is elementwise
    proportional to our so3.real_cg (ops/e3nn_compat.w3j_cg_ratio), and
    conversion reduces to name/layout mapping plus per-path scalar folds:

      * e3nn TensorProduct normalization x reference path weights
        (e3nn_compat.qhnet_conv_tp / qhnet_uuu_tp coefficients),
      * the w3j/real_cg ratio mu = +-1/sqrt(2*l3+1) per path,
      * sqrt(2*l2+1) per conv path (reference SH are "component"-normalized,
        ours Y_l0(z)=1) and (-1)^l2 (our dense-graph diff is pos_j - pos_i,
        the reference's edge_vec is pos_dst - pos_src = the negative),
      * a (l1,l2)-swap path permutation with sign sigma = (-1)^(l1+l2+l3)
        for PairNet (reference tp_node_pair(node[src], node[dst]); ours
        contracts (dst, src)),
      * e3nn FullyConnectedNet folds (W/sqrt(fan_in) per layer, no biases,
        normalize2mom-scaled ShiftedSoftPlus) into our plain Dense MLPs,
      * our exponential-Bernstein basis index runs REVERSED vs the
        reference's (ours b_k ~ e^{kx}, reference ~ e^{(K-1-k)x}): the rbf
        MLP input rows flip,
      * Expansion weight columns permuted from the reference's
        (l_in, lo1, lo2) instruction order (layers.py:648-655) to our
        (lo1, lo2, l_in) loop order, scaled by mu (and mu/cb for biases:
        the reference divides bias by mul_in inside the w3j contraction,
        ours adds bias after the /cb).

    Requires ``create_model('qhnet', ref_compat=True, ...)`` — the flag
    reproduces the reference residual topology (no layer-0 skip, outer
    skip for layers >= 1) and feeds fc_ii/fc_ij from the static embedding.

    Golden-tested against a functional fp64 torch reference QHNet
    (tests/models/test_pretrained_qhnet.py), including Expansion weights
    and the per-element orbital masks.
    """
    from nabladft_tpu.models.qhnet import (
        LMAX, OrbitalLayout, _tp_paths, expansion_weight_counts,
    )
    from nabladft_tpu.ops import e3nn_compat as ec

    if model is None or not getattr(model, "ref_compat", False):
        raise ValueError(
            "qhnet checkpoints need the reference-compatible wiring: "
            "create_model('qhnet', ref_compat=True, ...)"
        )
    if not any(k.startswith("node_embedding") for k in state):
        for pre in ("net.", "model.", "module."):
            if any(k == pre + "node_embedding.weight" for k in state):
                state = {k[len(pre):]: v for k, v in state.items() if k.startswith(pre)}
                break
    p = params["params"]
    c = model.hidden
    cb = model.bottle_hidden
    rbf_dim = model.rbf_dim
    n_l = LMAX + 1
    ours_paths = list(_tp_paths(LMAX, LMAX, LMAX))
    c_ssp = ec.ssp_norm_const()

    _fill_rows(p, "node_embedding/embedding", state["node_embedding.weight"])
    _fill(p, "rbf/gamma", state["distance_expansion._alpha"])

    def fcn2(prefix, hidden, col_scale):
        """e3nn FullyConnectedNet [d0, hidden, numel] -> (k0, k1) for our
        GateMLPSplit: layer weights are [h_in, h_out], forward divides by
        sqrt(h_in), hidden activation is normalize2mom(ssp); rbf input
        rows are flipped (basis index reversal). col_scale: [n_ref_paths]
        per-path factors; returns k1 with our 65-path column layout."""
        w0 = state[f"{prefix}.0.weight"][::-1] / np.sqrt(rbf_dim)
        w1 = state[f"{prefix}.1.weight"] * (c_ssp / np.sqrt(hidden))
        k1 = np.zeros((hidden, len(ours_paths) * c), w1.dtype)
        for p_ref, (dst_block, scale) in enumerate(col_scale):
            k1[:, dst_block * c : (dst_block + 1) * c] = (
                w1[:, p_ref * c : (p_ref + 1) * c] * scale
            )
        return w0, k1

    for i in range(model.num_layers):
        t = f"conv_{i}"
        r = f"e3_gnn_layer.{i}.conv"
        spec = ec.qhnet_conv_tp(LMAX, layer0=(i == 0))
        col_scale = []
        for p_ref, ((l1, l2, l3), coeff) in enumerate(zip(spec.paths, spec.coeff)):
            scale = (
                coeff
                * ec.w3j_cg_ratio(l1, l2, l3)
                * np.sqrt(2 * l2 + 1)     # component SH vs our Y_l0(z)=1
                * (-1.0) ** l2            # edge direction flip
            )
            col_scale.append((ours_paths.index((l1, l2, l3)), scale))
        w0, k1 = fcn2(f"{r}.fc_node", 32, col_scale)
        _fill(p, f"{t}/fc_rbf/Dense_0/kernel", w0)
        _fill(p, f"{t}/fc_rbf/Dense_0/bias", np.zeros(32, w0.dtype))
        _fill(p, f"{t}/fc_rbf/Dense_1/kernel", k1)
        _fill(p, f"{t}/fc_rbf/Dense_1/bias", np.zeros(k1.shape[1], k1.dtype))

        # layer_l0 (s0 FCN): same column layout, unit scale (folded above)
        w0s = state[f"{r}.layer_l0.0.weight"] / np.sqrt(
            state[f"{r}.layer_l0.0.weight"].shape[0]
        )
        w0s = _qhnet_s0_rows(w0s, c, n_l, layer0=(i == 0))
        w1s = state[f"{r}.layer_l0.1.weight"] * (c_ssp / np.sqrt(32))
        k1s = np.zeros((32, len(ours_paths) * c), w1s.dtype)
        for p_ref, (l1, l2, l3) in enumerate(spec.paths):
            dst = ours_paths.index((l1, l2, l3))
            k1s[:, dst * c : (dst + 1) * c] = w1s[:, p_ref * c : (p_ref + 1) * c]
        _fill(p, f"{t}/fc_s0/Dense_0/kernel", w0s)
        _fill(p, f"{t}/fc_s0/Dense_0/bias", np.zeros(32, w0s.dtype))
        _fill(p, f"{t}/fc_s0/Dense_1/kernel", k1s)
        _fill(p, f"{t}/fc_s0/Dense_1/bias", np.zeros(k1s.shape[1], k1s.dtype))

        if i != 0:
            _e3nn_linear_fill(p, f"{t}/linear_pre", f"{r}.linear_node_pre", state, c, c)
            _e3nn_linear_fill(p, f"{t}/linear_in", f"{r}.linear_node", state, c, c)
            _norm_gate_fill(p, f"{t}/norm_gate", f"{r}.norm_gate", state)
        _e3nn_linear_fill(p, f"{t}/linear_out", f"{r}.linear_out", state, c, c)

    uuu = ec.qhnet_uuu_tp(LMAX)
    uuu_scale = np.asarray(
        [cf * ec.w3j_cg_ratio(*pp) for pp, cf in zip(uuu.paths, uuu.coeff)]
    )
    n_self = model.num_layers - model.start_layer - 1
    for k in range(n_self):
        i = model.start_layer + 1 + k
        t, r = f"self_{i}", f"e3_gnn_node_layer.{k}"
        _norm_gate_fill(p, f"{t}/ng1", f"{r}.norm_gate_1", state)
        _norm_gate_fill(p, f"{t}/ng2", f"{r}.norm_gate_2", state)
        _norm_gate_fill(p, f"{t}/ng3", f"{r}.norm_gate", state)
        _e3nn_linear_fill(p, f"{t}/lin1", f"{r}.linear_node_1", state, c, c)
        _e3nn_linear_fill(p, f"{t}/lin2", f"{r}.linear_node_2", state, c, c)
        _e3nn_linear_fill(p, f"{t}/lin3", f"{r}.linear_node_3", state, c, c)
        w = state[f"{r}.tp.weight"].reshape(len(uuu.paths), c)
        _fill(p, f"{t}/tp_weights", w * uuu_scale[:, None])

        t, r = f"pair_{i}", f"e3_gnn_node_pair_layer.{k}"
        _e3nn_linear_fill(p, f"{t}/lin_inner", f"{r}.linear_node_pair_inner", state, c, c)
        _e3nn_linear_fill(p, f"{t}/lin_n", f"{r}.linear_node_pair_n", state, c, c)
        _e3nn_linear_fill(p, f"{t}/lin_out", f"{r}.linear_node_pair", state, c, c)
        _norm_gate_fill(p, f"{t}/ng_pre", f"{r}.norm_gate_pre", state)
        _norm_gate_fill(p, f"{t}/ng_post", f"{r}.norm_gate", state)
        # tp_node_pair(node[src], node[dst]) vs our (dst, src): our path
        # (l1,l2,l3) takes the reference's (l2,l1,l3) column block, with
        # the swap sign folded in
        swap_cols = []
        for p_ref, ((l1, l2, l3), coeff) in enumerate(zip(uuu.paths, uuu.coeff)):
            dst = ours_paths.index((l2, l1, l3))
            scale = coeff * ec.w3j_cg_ratio(l1, l2, l3) * ec.cg_swap_sign(l1, l2, l3)
            swap_cols.append((dst, scale))
        w0, k1 = fcn2(f"{r}.fc_node_pair", 8, swap_cols)
        _fill(p, f"{t}/fc_rbf/Dense_0/kernel", w0)
        _fill(p, f"{t}/fc_rbf/Dense_0/bias", np.zeros(8, w0.dtype))
        _fill(p, f"{t}/fc_rbf/Dense_1/kernel", k1)
        _fill(p, f"{t}/fc_rbf/Dense_1/bias", np.zeros(k1.shape[1], k1.dtype))
        # fc (plain torch Sequential WITH biases): s0 rows + swap columns
        w0s = _qhnet_s0_rows_pair(_t(state[f"{r}.fc.0.weight"]), c, n_l)
        _fill(p, f"{t}/fc_s0/Dense_0/kernel", w0s)
        _fill(p, f"{t}/fc_s0/Dense_0/bias", state[f"{r}.fc.0.bias"])
        w1s = _t(state[f"{r}.fc.2.weight"])
        b1s = state[f"{r}.fc.2.bias"]
        k1s = np.zeros((c, len(ours_paths) * c), w1s.dtype)
        bs = np.zeros(len(ours_paths) * c, b1s.dtype)
        for p_ref, (l1, l2, l3) in enumerate(uuu.paths):
            dst = ours_paths.index((l2, l1, l3))
            k1s[:, dst * c : (dst + 1) * c] = w1s[:, p_ref * c : (p_ref + 1) * c]
            bs[dst * c : (dst + 1) * c] = b1s[p_ref * c : (p_ref + 1) * c]
        _fill(p, f"{t}/fc_s0/Dense_1/kernel", k1s)
        _fill(p, f"{t}/fc_s0/Dense_1/bias", bs)

    _e3nn_linear_fill(p, "output_ii", "output_ii", state, c, cb)
    _e3nn_linear_fill(p, "output_ij", "output_ij", state, c, cb)

    # Expansion heads: reference (l_in, lo1, lo2) column order -> our
    # (lo1, lo2, l_in); mu per block; bias blocks additionally /cb
    layout = OrbitalLayout(model.orbitals or _default_qhnet_orbitals(), model.num_elements)
    ref_ins, n_w, n_b = ec.expansion_instructions(tuple(layout.mults), cb, LMAX)
    ours_off = {}
    w_off, b_off = 0, 0
    for lo1, _, mul1 in layout.group_slices():
        for lo2, _, mul2 in layout.group_slices():
            for l_in in range(abs(lo1 - lo2), min(lo1 + lo2, LMAX) + 1):
                ours_off[(l_in, lo1, lo2)] = (w_off, b_off if l_in == 0 else None)
                w_off += cb * mul1 * mul2
                if l_in == 0:
                    b_off += mul1 * mul2
    assert w_off == n_w and b_off == n_b, (w_off, n_w, b_off, n_b)

    def expansion_head(ours, torch_pfx, first_in_plain=True):
        _fill(p, f"{ours}/Dense_0/kernel", _t(state[f"{torch_pfx}.0.weight"]))
        _fill(p, f"{ours}/Dense_0/bias", state[f"{torch_pfx}.0.bias"])
        w1 = _t(state[f"{torch_pfx}.2.weight"])
        b1 = state[f"{torch_pfx}.2.bias"]
        k = np.zeros((w1.shape[0], n_w), w1.dtype)
        b = np.zeros(n_w, b1.dtype)
        for (l_in, lo1, lo2, mul1, mul2, rw, _rb) in ref_ins:
            size = cb * mul1 * mul2
            ow = ours_off[(l_in, lo1, lo2)][0]
            mu = ec.w3j_cg_ratio(lo1, lo2, l_in)
            k[:, ow : ow + size] = w1[:, rw : rw + size] * mu
            b[ow : ow + size] = b1[rw : rw + size] * mu
        _fill(p, f"{ours}/Dense_1/kernel", k)
        _fill(p, f"{ours}/Dense_1/bias", b)

    def expansion_bias_head(ours, torch_pfx):
        _fill(p, f"{ours}/Dense_0/kernel", _t(state[f"{torch_pfx}.0.weight"]))
        _fill(p, f"{ours}/Dense_0/bias", state[f"{torch_pfx}.0.bias"])
        w1 = _t(state[f"{torch_pfx}.2.weight"])
        b1 = state[f"{torch_pfx}.2.bias"]
        k = np.zeros((w1.shape[0], n_b), w1.dtype)
        b = np.zeros(n_b, b1.dtype)
        for (l_in, lo1, lo2, mul1, mul2, _rw, rb) in ref_ins:
            if l_in != 0:
                continue
            size = mul1 * mul2
            ob = ours_off[(0, lo1, lo2)][1]
            mu = ec.w3j_cg_ratio(lo1, lo2, 0) / cb
            k[:, ob : ob + size] = w1[:, rb : rb + size] * mu
            b[ob : ob + size] = b1[rb : rb + size] * mu
        _fill(p, f"{ours}/Dense_1/kernel", k)
        _fill(p, f"{ours}/Dense_1/bias", b)

    expansion_head("fc_ii", "fc_ii.hamiltonian")
    expansion_head("fc_ij", "fc_ij.hamiltonian")
    expansion_bias_head("fc_ii_bias", "fc_ii_bias.hamiltonian")
    expansion_bias_head("fc_ij_bias", "fc_ij_bias.hamiltonian")
    return params


def _default_qhnet_orbitals():
    from nabladft_tpu.models.qhnet import DEF2_SVP_ORBITALS

    return DEF2_SVP_ORBITALS


def convert_state_dict(family: str, state: Dict[str, np.ndarray], model, example_batch):
    """Convert a torch state dict into `model`'s parameter tree (the
    download-free core of get_pretrained_params, used by the golden tests).

    Converters target the canonical (XLA) parameter layout; for models whose
    fused-Pallas path uses a packed layout (eSCN), the result is remapped
    with the library layout converters (models/param_convert.py)."""
    import jax

    to_pallas = False
    if family.lower() == "escn" and getattr(model, "_pallas_enabled", lambda: False)():
        import dataclasses

        to_pallas = True
        model = dataclasses.replace(model, use_pallas=False)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example_batch)
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    import inspect

    conv = _CONVERTERS[family.lower()]
    if "model" in inspect.signature(conv).parameters:
        converted = conv(state, params, model=model)
    else:
        converted = conv(state, params)
    if to_pallas:
        from nabladft_tpu.models.param_convert import escn_params

        converted = escn_params(converted, to="pallas")
    return jax.tree_util.tree_map(np.asarray, converted)


def get_pretrained_params(
    name: str,
    model,
    example_batch,
    cache_dir: Path = Path("checkpoints/pretrained"),
) -> Any:
    """Download checkpoint `name` ('<Model>_<split>') and convert into the
    given model's parameter structure (reference
    model_registry.get_pretrained_model:59)."""
    import jax

    family = name.split("_")[0].lower().replace("-", "")
    aliases = {
        "painnoc": "painn", "schnet": "schnet", "painn": "painn",
        "dimenet++": "dimenetpp", "graphormer3dsmall": "graphormer3d",
        "gemnetoc": "gemnet_oc", "escnoc": "escn",
    }
    family = aliases.get(family, family)
    if family not in _CONVERTERS:
        raise NotImplementedError(
            f"no torch->flax converter for family {family!r}; convertible: "
            f"{convertible_families()} — re-train with the TPU trainer instead"
        )
    path = checkpoint_registry.download(name, Path(cache_dir) / f"{name}.ckpt")
    state = load_torch_state_dict(path)
    return convert_state_dict(family, state, model, example_batch)


def load_pretrained_into(train_state, name: str):
    """Pipeline hook: replace TrainState params with converted pretrained
    weights (requires matching architecture config)."""
    raise NotImplementedError(
        "load_pretrained_into requires the example batch; use "
        "get_pretrained_params and TrainState.replace(params=...) directly"
    )
