"""Pretrained-model registry: download + torch→flax weight conversion.

The analog of the reference's ModelRegistry
(nablaDFT/model_registry.py:16-150): resolve '<Model>_<split>' names to
checkpoint URLs (42 published checkpoints, links/models_checkpoints.json),
download with ETag validation, and restore weights into a framework model.

Published checkpoints are PyTorch state dicts, so restoring them here means
a structural conversion. Converters are registered per family; they map
torch parameter names/layouts onto the flax parameter tree. SchNet and
PaiNN converters cover the workhorse models; families whose TPU
architecture is a re-design rather than a re-parameterization (QHNet's
fused tensor products, eSCN's table-free rotations) are better re-trained —
`convertible_families()` reports which is which.

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
    for i in range(len([k for k in state if k.startswith(pre + "interactions")]) // 8):
        b = f"{pre}interactions.{i}."
        _fill(p, f"filter_{i}_0/kernel", _t(state[b + "filter_network.0.weight"]))
        _fill(p, f"filter_{i}_0/bias", state[b + "filter_network.0.bias"])
        _fill(p, f"filter_{i}_1/kernel", _t(state[b + "filter_network.1.weight"]))
        _fill(p, f"filter_{i}_1/bias", state[b + "filter_network.1.bias"])
        _fill(p, f"interaction_{i}/Dense_0/kernel", _t(state[b + "in2f.weight"]))
        _fill(p, f"interaction_{i}/Dense_1/kernel", _t(state[b + "f2out.0.weight"]))
        _fill(p, f"interaction_{i}/Dense_1/bias", state[b + "f2out.0.bias"])
        _fill(p, f"interaction_{i}/Dense_2/kernel", _t(state[b + "f2out.1.weight"]))
        _fill(p, f"interaction_{i}/Dense_2/bias", state[b + "f2out.1.bias"])
    out_pre = "model.output_modules.0.outnet."
    _fill(p, "atomwise/Dense_0/kernel", _t(state[out_pre + "0.weight"]))
    _fill(p, "atomwise/Dense_0/bias", state[out_pre + "0.bias"])
    _fill(p, "atomwise/Dense_1/kernel", _t(state[out_pre + "1.weight"]))
    _fill(p, "atomwise/Dense_1/bias", state[out_pre + "1.bias"])
    return params


@register_converter("painn")
def convert_painn(state: Dict[str, np.ndarray], params: Dict) -> Dict:
    """schnetpack PaiNN → models.painn.PaiNN (dense-pair formulation keeps
    the same parameter shapes: message filters are the 3F Dense split in
    three; update blocks map 1:1)."""
    p = params["params"]
    pre = "model.representation."
    _fill(p, "atom_embedding/embedding", state[pre + "embedding.weight"])
    n_layers = len({k.split(".")[2] for k in state if k.startswith(pre + "interactions")})
    for i in range(n_layers):
        li = f"layer_{i}"
        b = f"{pre}interactions.{i}."
        # intra-atom phi MLP
        _fill(p, f"{li}/message/MLP_0/Dense_0/kernel", _t(state[b + "interatomic_context_net.0.weight"]))
        _fill(p, f"{li}/message/MLP_0/Dense_0/bias", state[b + "interatomic_context_net.0.bias"])
        _fill(p, f"{li}/message/MLP_0/Dense_1/kernel", _t(state[b + "interatomic_context_net.1.weight"]))
        _fill(p, f"{li}/message/MLP_0/Dense_1/bias", state[b + "interatomic_context_net.1.bias"])
        # filter Dense (schnetpack: one shared filter net per layer slice)
        w = _t(state[f"{pre}filter_net.weight"]) if f"{pre}filter_net.weight" in state else None
        if w is not None:
            f = w.shape[1] // (3 * n_layers)
            sl = w[:, i * 3 * f : (i + 1) * 3 * f]
            _fill(p, f"{li}/message/w_s/kernel", sl[:, :f])
            _fill(p, f"{li}/message/w_vv/kernel", sl[:, f : 2 * f])
            _fill(p, f"{li}/message/w_vs/kernel", sl[:, 2 * f :])
        u = f"{pre}mixing.{i}."
        _fill(p, f"{li}/update/Dense_0/kernel", _t(state[u + "mu_channel_mix.0.weight"])[..., : p[li]["update"]["Dense_0"]["kernel"].shape[-1]])
        _fill(p, f"{li}/update/Dense_1/kernel", _t(state[u + "mu_channel_mix.0.weight"])[..., p[li]["update"]["Dense_0"]["kernel"].shape[-1] :])
        _fill(p, f"{li}/update/MLP_0/Dense_0/kernel", _t(state[u + "intraatomic_context_net.0.weight"]))
        _fill(p, f"{li}/update/MLP_0/Dense_0/bias", state[u + "intraatomic_context_net.0.bias"])
        _fill(p, f"{li}/update/MLP_0/Dense_1/kernel", _t(state[u + "intraatomic_context_net.1.weight"]))
        _fill(p, f"{li}/update/MLP_0/Dense_1/bias", state[u + "intraatomic_context_net.1.bias"])
    out_pre = "model.output_modules.0.outnet."
    _fill(p, "energy_head/Dense_0/kernel", _t(state[out_pre + "0.weight"]))
    _fill(p, "energy_head/Dense_0/bias", state[out_pre + "0.bias"])
    _fill(p, "energy_head/Dense_1/kernel", _t(state[out_pre + "1.weight"]))
    _fill(p, "energy_head/Dense_1/bias", state[out_pre + "1.bias"])
    return params


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
    aliases = {"painnoc": "painn", "schnet": "schnet", "painn": "painn"}
    family = aliases.get(family, family)
    if family not in _CONVERTERS:
        raise NotImplementedError(
            f"no torch->flax converter for family {family!r}; convertible: "
            f"{convertible_families()} — re-train with the TPU trainer instead"
        )
    path = checkpoint_registry.download(name, Path(cache_dir) / f"{name}.ckpt")
    state = load_torch_state_dict(path)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example_batch)
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    converted = _CONVERTERS[family](state, params)
    return jax.tree_util.tree_map(np.asarray, converted)


def load_pretrained_into(train_state, name: str):
    """Pipeline hook: replace TrainState params with converted pretrained
    weights (requires matching architecture config)."""
    raise NotImplementedError(
        "load_pretrained_into requires the example batch; use "
        "get_pretrained_params and TrainState.replace(params=...) directly"
    )
