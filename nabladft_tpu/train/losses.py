"""Mask-aware loss functions with reference-parity semantics.

Reference loss inventory:
  * energy L1 / MSE (config/model/*.yaml `losses.energy`);
  * forces `L2Loss` = mean over atoms of the per-atom force-vector 2-norm of
    the error (gemnet_oc/loss.py:15 — NOT a squared loss);
  * Hamiltonian loss = RMSE + MAE over masked matrix entries
    (qhnet/loss.py:5-16), with the mask selecting real orbital blocks.

All functions reduce over *real* elements only and return scalars; weighted
combination happens in `multitask_loss`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

_EPS = 1e-12


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


def energy_l1(pred, target, graph_mask) -> jnp.ndarray:
    err = jnp.abs(pred - target)
    return _safe_div(jnp.sum(jnp.where(graph_mask, err, 0.0)), graph_mask.sum())


def energy_mse(pred, target, graph_mask) -> jnp.ndarray:
    err = (pred - target) ** 2
    return _safe_div(jnp.sum(jnp.where(graph_mask, err, 0.0)), graph_mask.sum())


def forces_l1(pred, target, node_mask) -> jnp.ndarray:
    """Component-wise MAE over real atoms (torch.nn.L1Loss semantics)."""
    err = jnp.abs(pred - target) * node_mask[..., None]
    return _safe_div(err.sum(), 3.0 * node_mask.sum())


def forces_mse(pred, target, node_mask) -> jnp.ndarray:
    err = (pred - target) ** 2 * node_mask[..., None]
    return _safe_div(err.sum(), 3.0 * node_mask.sum())


def forces_l2norm(pred, target, node_mask) -> jnp.ndarray:
    """Per-atom error-vector 2-norm, averaged over real atoms
    (reference GemNet `L2Loss`, gemnet_oc/loss.py:15)."""
    d2 = jnp.sum((pred - target) ** 2, axis=-1)
    norm = jnp.sqrt(d2 + _EPS)
    return _safe_div(jnp.sum(jnp.where(node_mask, norm, 0.0)), node_mask.sum())


def matrix_rmse_mae(pred, target, pair_mask) -> jnp.ndarray:
    """RMSE + MAE over masked matrix entries (qhnet/loss.py:5-16)."""
    diff = jnp.where(pair_mask, pred - target, 0.0)
    n = jnp.maximum(pair_mask.sum(), 1.0)
    mse = jnp.sum(diff * diff) / n
    mae = jnp.sum(jnp.abs(diff)) / n
    return jnp.sqrt(mse + _EPS) + mae


def matrix_mae(pred, target, pair_mask) -> jnp.ndarray:
    diff = jnp.where(pair_mask, pred - target, 0.0)
    return jnp.sum(jnp.abs(diff)) / jnp.maximum(pair_mask.sum(), 1.0)


def block_target_matrix(target_mat, idx, valid, graph_mask):
    """Gather the target matrix into block-space super-matrix form.

    idx/valid: [B,A,R] per-(atom, generic-slot) orbital index / validity
    (from the model's static orbital layout). Returns (tgt [B,AR,AR],
    mask [B,AR,AR]); every valid orbital pair appears exactly once, so
    masked losses/metrics over this space equal the full-matrix ones."""
    b, a, r = idx.shape
    flat = idx.reshape(b, a * r)
    rows = jnp.take_along_axis(target_mat, flat[:, :, None], axis=1)
    tgt = jnp.take_along_axis(rows, flat[:, None, :], axis=2)
    vm = valid.reshape(b, a * r)
    mask = vm[:, :, None] & vm[:, None, :] & graph_mask[:, None, None]
    return tgt, mask


LOSS_FNS = {
    "energy_l1": energy_l1,
    "energy_mse": energy_mse,
    "forces_l1": forces_l1,
    "forces_mse": forces_mse,
    "forces_l2norm": forces_l2norm,
}


def multitask_loss(
    out: Dict[str, jnp.ndarray],
    batch,
    loss_specs: Dict[str, str],
    loss_coefs: Dict[str, float],
    max_errors: Dict[str, float] | None = None,
) -> Dict[str, jnp.ndarray]:
    """Weighted multi-task loss.

    loss_specs: target -> loss kind, e.g. {"energy": "l1", "forces": "l2norm"}.
    max_errors: optional per-target MAE clamp (PhiSNet legacy trainer,
    phisnet/training/util.py:37-45): a target whose batch MAE exceeds its
    clamp contributes ZERO to the total this step, so one exploding target
    (e.g. energies early in multi-task H+E+F training) cannot poison the
    gradients of the others. Gated per-target values are still reported.
    Returns {"total": scalar, "<target>": scalar per task}.
    """
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for target, kind in loss_specs.items():
        mae = None
        if target == "energy":
            fn = LOSS_FNS[f"energy_{kind}"]
            val = fn(out["energy"], batch.energy, batch.graph_mask)
            if max_errors and target in max_errors:
                mae = energy_l1(out["energy"], batch.energy, batch.graph_mask)
        elif target == "forces":
            fn = LOSS_FNS[f"forces_{kind}"]
            val = fn(out["forces"], batch.forces, batch.node_mask)
            if max_errors and target in max_errors:
                mae = forces_l1(out["forces"], batch.forces, batch.node_mask)
        elif target in ("hamiltonian", "overlap", "core"):
            if target not in out and f"{target}_blocks" in out:
                pred, tgt_mat = out[f"{target}_blocks"], None
                tgt, pm = block_target_matrix(
                    getattr(batch, target), out["block_index"],
                    out["block_valid"], batch.graph_mask,
                )
            else:
                pred, tgt = out[target], getattr(batch, target)
                pm = batch.orb_mask[:, :, None] & batch.orb_mask[:, None, :]
                pm = pm & batch.graph_mask[:, None, None]
            val = matrix_rmse_mae(pred, tgt, pm)
            if max_errors and target in max_errors:
                mae = matrix_mae(pred, tgt, pm)
        else:
            raise KeyError(f"unknown loss target {target!r}")
        losses[target] = val
        coef = loss_coefs.get(target, 1.0)
        if mae is not None:
            # hard gate, no gradient through the comparison
            gate = (mae <= max_errors[target]).astype(val.dtype)
            total = total + coef * gate * val
        else:
            total = total + coef * val
    losses["total"] = total
    return losses
