"""Data layer: SQLite readers/writers, registries, bucketed fixed-shape batching."""

from nabladft_tpu.data.ase_codec import AseDatabase, AtomsRecord  # noqa: F401
from nabladft_tpu.data.batch import MolBatch  # noqa: F401
from nabladft_tpu.data.dataset import (  # noqa: F401
    BucketedLoader,
    DataModule,
    EnergyDataset,
    HamiltonianDataset,
    LoaderConfig,
    seeded_random_split,
)
from nabladft_tpu.data.hamiltonian_db import HamiltonianDatabase, HamiltonianRecord  # noqa: F401
from nabladft_tpu.data.registry import checkpoint_registry, dataset_registry  # noqa: F401
