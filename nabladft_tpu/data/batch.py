"""Fixed-shape padded molecular batches — the universal device-side format.

The reference framework (AIRI-Institute/nablaDFT) feeds models ragged
PyTorch-Geometric `Batch` objects (variable node/edge counts per step;
see reference nablaDFT/dataset/pyg_datasets.py). That is hostile to XLA:
every new shape retriggers compilation and prevents MXU tiling. Here every
batch is a dense, statically shaped pytree:

  * molecules are padded to a bucket's ``max_atoms`` (A);
  * a batch holds ``B`` molecules: ``z:[B,A] pos:[B,A,3] node_mask:[B,A]``;
  * graph structure (neighbor lists, triplets) is derived **on device** from
    positions with fixed budgets — no host round trip per step;
  * Hamiltonian targets are carried as padded per-molecule dense matrices
    ``[B, O, O]`` with an orbital mask (reference keeps them as ragged numpy,
    hamiltonian_dataset.py:96-106).

Padding convention: ``z == 0`` and ``node_mask == False`` for padding atoms.
Padding molecules (for the last partial batch) have ``graph_mask == False``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MolBatch:
    """A statically shaped batch of padded molecules.

    Shapes (B = molecules per batch, A = max atoms in bucket):
      z:          [B, A]    int32   atomic numbers, 0 = padding
      pos:        [B, A, 3] float32 Cartesian coordinates (Å for energy DBs,
                                    Bohr for Hamiltonian DBs — unit recorded
                                    by the dataset, models are unit-agnostic)
      node_mask:  [B, A]    bool    True for real atoms
      graph_mask: [B]       bool    True for real molecules
      energy:     [B]       float32 target energy (Eh), 0 where padded
      forces:     [B, A, 3] float32 target forces, 0 where padded
    Optional Hamiltonian-task fields (O = max orbitals in bucket):
      hamiltonian: [B, O, O] float32
      overlap:     [B, O, O] float32
      core:        [B, O, O] float32
      orb_mask:    [B, O]    bool   True for real orbitals
    Bookkeeping:
      mol_id:     [B] int32 row index in the source database (for writers)
    """

    z: jnp.ndarray
    pos: jnp.ndarray
    node_mask: jnp.ndarray
    graph_mask: jnp.ndarray
    energy: jnp.ndarray
    forces: jnp.ndarray
    mol_id: jnp.ndarray
    hamiltonian: Optional[jnp.ndarray] = None
    overlap: Optional[jnp.ndarray] = None
    core: Optional[jnp.ndarray] = None
    orb_mask: Optional[jnp.ndarray] = None
    # periodic systems (OC-style data; None for nablaDFT molecules):
    # [B, 3, 3] lattice vectors as rows (ASE convention)
    cell: Optional[jnp.ndarray] = None

    @property
    def num_mols(self) -> int:
        return self.z.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.z.shape[1]

    @property
    def n_atoms(self) -> jnp.ndarray:
        """[B] number of real atoms per molecule."""
        return self.node_mask.sum(axis=-1).astype(jnp.int32)

    @property
    def n_real_mols(self) -> jnp.ndarray:
        return self.graph_mask.sum().astype(jnp.int32)

    @property
    def n_real_atoms(self) -> jnp.ndarray:
        return self.node_mask.sum().astype(jnp.int32)

    def replace_pos(self, pos: jnp.ndarray) -> "MolBatch":
        """New batch with updated positions (used by the relaxation engine)."""
        return self.replace(pos=pos)
