"""Batched calculator: model → (energy, forces) with unit conversion.

The analog of the reference's BatchwiseCalculator / PyGBatchwiseCalculator
(nablaDFT/optimization/calculator.py:15-134): wraps trained model params
into a jittable `(MolBatch) -> (E, F)` function, converting model output
units to the task units (config/calculator/pyg_calculator.yaml declares
Hartree/Å). Caching is unnecessary here — the relaxation loop is compiled,
so there is no repeated host-side property protocol to memoize.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import forward

# conversion factors to atomic-ish task units
ENERGY_UNITS = {"Hartree": 1.0, "eV": 1.0 / 27.211386245988, "kcal/mol": 1.0 / 627.5094740631}
POSITION_UNITS = {"Ang": 1.0, "Bohr": 0.529177210903}


class BatchwiseCalculator:
    """Callable (MolBatch) -> (energy [B], forces [B,A,3]) in task units."""

    def __init__(
        self,
        model,
        variables: Any,
        energy_unit: str = "Hartree",
        position_unit: str = "Ang",
    ):
        self.model = model
        self.variables = variables
        # model emits energy in `energy_unit` per `position_unit`;
        # convert to Hartree / Å task units (reference calculator.py:40-60)
        self.energy_scale = ENERGY_UNITS[energy_unit]
        self.force_scale = ENERGY_UNITS[energy_unit] / POSITION_UNITS[position_unit]

    def __call__(self, batch: MolBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out = forward(self.model, self.variables, batch)
        energy = out["energy"] * self.energy_scale
        forces = out["forces"] * self.force_scale
        return energy, forces

    energy_forces = __call__
