"""Streaming multi-task metrics as (sum, count) accumulators.

Replaces torchmetrics MultitaskWrapper / MeanAbsoluteError / the masked MAE
for Hamiltonians (qhnet/masked_mae.py:7-20) with plain pytree accumulators:
the jitted step returns per-batch error sums and counts; the host (or a
psum, under pmap-style use) adds them up, and `compute()` divides once at
epoch end. That reproduces exactly torchmetrics' "global" averaging: a mean
over all elements, not a mean of batch means.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def batch_metric_sums(out: Dict, batch) -> Dict[str, jnp.ndarray]:
    """Per-batch absolute-error sums + element counts for each target."""
    sums: Dict[str, jnp.ndarray] = {}
    if "energy" in out:
        err = jnp.abs(out["energy"] - batch.energy)
        sums["energy/abs_sum"] = jnp.sum(jnp.where(batch.graph_mask, err, 0.0))
        sums["energy/count"] = batch.graph_mask.sum().astype(jnp.float32)
    if "forces" in out:
        err = jnp.abs(out["forces"] - batch.forces) * batch.node_mask[..., None]
        sums["forces/abs_sum"] = err.sum()
        sums["forces/count"] = 3.0 * batch.node_mask.sum().astype(jnp.float32)
    for target in ("hamiltonian", "overlap", "core"):
        if getattr(batch, target, None) is None:
            continue
        if target in out:
            pm = batch.orb_mask[:, :, None] & batch.orb_mask[:, None, :]
            pm = pm & batch.graph_mask[:, None, None]
            err = jnp.abs(out[target] - getattr(batch, target))
        elif f"{target}_blocks" in out:
            from nabladft_tpu.train.losses import block_target_matrix

            tgt, pm = block_target_matrix(
                getattr(batch, target),
                out["block_index"], out["block_valid"], batch.graph_mask,
            )
            err = jnp.abs(out[f"{target}_blocks"] - tgt)
        else:
            continue
        sums[f"{target}/abs_sum"] = jnp.sum(jnp.where(pm, err, 0.0))
        sums[f"{target}/count"] = pm.sum().astype(jnp.float32)
    return sums


class MetricAccumulator:
    """Host-side accumulation of the sums returned by the jitted step."""

    def __init__(self):
        self._sums: Dict[str, float] = {}

    def update(self, sums: Dict[str, jnp.ndarray]) -> None:
        for k, v in sums.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)

    def compute(self) -> Dict[str, float]:
        out = {}
        for k in self._sums:
            if k.endswith("/abs_sum"):
                target = k[: -len("/abs_sum")]
                count = self._sums.get(f"{target}/count", 0.0)
                out[f"{target}/mae"] = self._sums[k] / max(count, 1.0)
        return out

    def reset(self) -> None:
        self._sums.clear()


def mae_dict_to_str(metrics: Dict[str, float]) -> str:
    return "  ".join(f"{k}={v:.3e}" for k, v in sorted(metrics.items()))
