"""Per-element atomic reference energies (atomization-energy offsets).

The SchNet/PaiNN configs in the reference add per-element offsets to the
predicted energy (AddOffsets postprocessor fed from
nablaDFT/data/atomization_energies.npy; nablaDFT_dataset.py:201 injects them
as dataset metadata). Here they are a plain [Zmax] array models can embed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_PATH = Path(__file__).parent / "atomization_energies.npy"


def atomization_energies() -> np.ndarray:
    """[54] float64 per-element reference energies in Eh (index = Z)."""
    return np.load(_PATH)


def atomrefs_for(z_max: int = 100) -> np.ndarray:
    base = atomization_energies()
    out = np.zeros(z_max, np.float64)
    out[: len(base)] = base
    return out
