"""Checkpoint-layout conversion between the fused-Pallas and XLA parameter
trees of eSCN and EquiformerV2.

The fused kernels (ops/pallas/escn_layer, ops/pallas/eqv2_attn) pack the
per-m SO(2) weight matrices into stacked/concatenated arrays so the kernel
reads contiguous row slices; the XLA paths keep each m as its own flax
submodule (mirroring the reference escn/escn.py:708-880 and
equiformer_v2/so2_ops.py module structure). The packing is pure
slice/concat, so the map is exactly invertible — a checkpoint trained in
either mode evaluates identically in the other after conversion
(tests/models/test_param_convert.py).

The CANONICAL on-disk layout is the fused (pallas) one — it is the
production training path on TPU. `convert_params(model, params)` remaps a
tree to whatever layout the given model instance resolves to.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _unfreeze(tree):
    return jax.tree_util.tree_map(lambda x: x, tree)


def _split_collections(params: Dict[str, Any]):
    """Accept {"params": ...} or a bare param dict; return (inner, wrap)."""
    if "params" in params and isinstance(params["params"], dict):
        return dict(params["params"]), True
    return dict(params), False


def _wrap(inner, wrapped, original):
    if wrapped:
        out = dict(original)
        out["params"] = inner
        return out
    return inner


# ---------------------------------------------------------------- eSCN ----

def _escn_layer_pallas_to_xla(lp: Dict[str, Any]) -> Dict[str, Any]:
    lp = dict(lp)
    wg, bg = lp.pop("wg"), lp.pop("bg")
    w1_0, w2_0 = lp.pop("w1_0"), lp.pop("w2_0")
    h = w1_0.shape[-1]
    m_max = 0
    while f"fc1_m{m_max + 1}" in lp:
        m_max += 1
    for bi, bname in ((0, "so2_source"), (1, "so2_target")):
        blk = {
            "fc_dist0": {"kernel": wg[bi][:, :h], "bias": bg[bi][0, :h]},
            "fc1_m0": {"kernel": w1_0[bi]},
            "fc2_m0": {"kernel": w2_0[bi]},
        }
        for m in range(1, m_max + 1):
            fc1 = lp[f"fc1_m{m}"]
            blk[f"so2_m{m}"] = {
                "fc_dist": {
                    "kernel": wg[bi][:, (2 * m - 1) * h : (2 * m + 1) * h],
                    "bias": bg[bi][0, (2 * m - 1) * h : (2 * m + 1) * h],
                },
                "fc1_r": {"kernel": fc1[bi][:, :h]},
                "fc1_i": {"kernel": fc1[bi][:, h:]},
                "fc2_r": {"kernel": lp[f"w2r_m{m}"][bi]},
                "fc2_i": {"kernel": lp[f"w2i_m{m}"][bi]},
            }
        lp[bname] = blk
    for m in range(1, m_max + 1):
        lp.pop(f"fc1_m{m}", None)
        lp.pop(f"w2r_m{m}", None)
        lp.pop(f"w2i_m{m}", None)
    return lp


def _escn_layer_xla_to_pallas(lp: Dict[str, Any]) -> Dict[str, Any]:
    lp = dict(lp)
    blocks = [lp.pop("so2_source"), lp.pop("so2_target")]
    m_max = 0
    while f"so2_m{m_max + 1}" in blocks[0]:
        m_max += 1
    cat = np.concatenate
    wg = np.stack([
        cat([blk["fc_dist0"]["kernel"]]
            + [blk[f"so2_m{m}"]["fc_dist"]["kernel"] for m in range(1, m_max + 1)],
            axis=1)
        for blk in blocks
    ])
    bg = np.stack([
        cat([blk["fc_dist0"]["bias"]]
            + [blk[f"so2_m{m}"]["fc_dist"]["bias"] for m in range(1, m_max + 1)],
            axis=0)[None, :]
        for blk in blocks
    ])
    lp["wg"], lp["bg"] = wg, bg
    lp["w1_0"] = np.stack([blk["fc1_m0"]["kernel"] for blk in blocks])
    lp["w2_0"] = np.stack([blk["fc2_m0"]["kernel"] for blk in blocks])
    for m in range(1, m_max + 1):
        lp[f"fc1_m{m}"] = np.stack([
            cat([blk[f"so2_m{m}"]["fc1_r"]["kernel"],
                 blk[f"so2_m{m}"]["fc1_i"]["kernel"]], axis=1)
            for blk in blocks
        ])
        lp[f"w2r_m{m}"] = np.stack(
            [blk[f"so2_m{m}"]["fc2_r"]["kernel"] for blk in blocks])
        lp[f"w2i_m{m}"] = np.stack(
            [blk[f"so2_m{m}"]["fc2_i"]["kernel"] for blk in blocks])
    return lp


def escn_params(params, to: str):
    """Convert an eSCN param tree to layout `to` in {"pallas", "xla"}.
    No-op when already in the requested layout."""
    inner, wrapped = _split_collections(_unfreeze(params))
    fn = None
    for name, lp in inner.items():
        if not name.startswith("layer_"):
            continue
        src = "pallas" if "wg" in lp else "xla"
        if src == to:
            return params
        fn = (_escn_layer_pallas_to_xla if to == "xla"
              else _escn_layer_xla_to_pallas)
        break
    if fn is None:
        return params
    for name in list(inner):
        if name.startswith("layer_"):
            inner[name] = fn(inner[name])
    return _wrap(inner, wrapped, params)


# ---------------------------------------------------- EquiformerV2 ----

def _eqv2_ga_pallas_to_xla(ga: Dict[str, Any], n_l_of_m, co: int) -> Dict[str, Any]:
    out = {}
    out["rad_func"] = {"kernel": ga["w_rad"], "bias": ga["b_rad"][0]}
    c1 = {"fc_m0": {"kernel": ga["w1"]}}
    c2 = {"fc_m0": {"kernel": ga["w2"]}}
    m = 1
    while f"fc1_m{m}" in ga:
        n_l = n_l_of_m(m)
        c1[f"fc_r_m{m}"] = {"kernel": ga[f"fc1_m{m}"][:, : n_l * co]}
        c1[f"fc_i_m{m}"] = {"kernel": ga[f"fc1_m{m}"][:, n_l * co :]}
        c2[f"fc_r_m{m}"] = {"kernel": ga[f"fc2_m{m}"][:, : n_l * co]}
        c2[f"fc_i_m{m}"] = {"kernel": ga[f"fc2_m{m}"][:, n_l * co :]}
        m += 1
    out["so2_conv_1"] = c1
    out["so2_conv_2"] = c2
    out["alpha_norm"] = {"scale": ga["ln_scale"][0], "bias": ga["ln_bias"][0]}
    out["alpha_dot"] = ga["alpha_dot"]
    for k, v in ga.items():
        if k.startswith("proj_l"):
            out[k] = v
    return out


def _eqv2_ga_xla_to_pallas(ga: Dict[str, Any]) -> Dict[str, Any]:
    cat = np.concatenate
    out = {
        "w_rad": ga["rad_func"]["kernel"],
        "b_rad": ga["rad_func"]["bias"][None, :],
        "w1": ga["so2_conv_1"]["fc_m0"]["kernel"],
        "w2": ga["so2_conv_2"]["fc_m0"]["kernel"],
        "ln_scale": ga["alpha_norm"]["scale"][None, :],
        "ln_bias": ga["alpha_norm"]["bias"][None, :],
        "alpha_dot": ga["alpha_dot"],
    }
    m = 1
    while f"fc_r_m{m}" in ga["so2_conv_1"]:
        out[f"fc1_m{m}"] = cat(
            [ga["so2_conv_1"][f"fc_r_m{m}"]["kernel"],
             ga["so2_conv_1"][f"fc_i_m{m}"]["kernel"]], axis=1)
        out[f"fc2_m{m}"] = cat(
            [ga["so2_conv_2"][f"fc_r_m{m}"]["kernel"],
             ga["so2_conv_2"][f"fc_i_m{m}"]["kernel"]], axis=1)
        m += 1
    for k, v in ga.items():
        if k.startswith("proj_l"):
            out[k] = v
    return out


def eqv2_params(params, to: str, l_max: int, m_max: int, co: int):
    """Convert an EquiformerV2 param tree to layout `to`.
    co = num_heads * attn_value_channels; needed to split the concatenated
    real/imag column blocks on the pallas→xla direction."""

    def n_l_of_m(m):
        return l_max + 1 - m

    inner, wrapped = _split_collections(_unfreeze(params))

    def ga_of(sub):
        return sub["ga"] if "ga" in sub else sub

    src = None
    for name, sub in inner.items():
        if name.startswith("block_") or name == "force_block":
            src = "pallas" if "w_rad" in ga_of(sub) else "xla"
            break
    if src is None or src == to:
        return params
    for name in list(inner):
        sub = inner[name]
        if name.startswith("block_"):
            nb = dict(sub)
            nb["ga"] = (_eqv2_ga_pallas_to_xla(sub["ga"], n_l_of_m, co)
                        if to == "xla" else _eqv2_ga_xla_to_pallas(sub["ga"]))
            inner[name] = nb
        elif name == "force_block":
            inner[name] = (_eqv2_ga_pallas_to_xla(sub, n_l_of_m, co)
                           if to == "xla" else _eqv2_ga_xla_to_pallas(sub))
    return _wrap(inner, wrapped, params)


# -------------------------------------------------------------- dispatch ----

def params_layout(model) -> str:
    """The layout a model instance resolves to ("pallas"/"xla"/"shared").
    Models whose two paths share one layout return "shared"."""
    if type(model).__name__ in ("ESCN", "EquiformerV2"):
        return "pallas" if model._pallas_enabled() else "xla"
    return "shared"


def convert_params(model, params):
    """Remap `params` (either layout) to the layout `model` resolves to.
    Identity for models without per-path layouts."""
    name = type(model).__name__
    if name == "ESCN":
        return escn_params(params, params_layout(model))
    if name == "EquiformerV2":
        co = model.num_heads * model.attn_value_channels
        return eqv2_params(params, params_layout(model), model.l_max,
                           model.m_max, co)
    return params
