"""nablaDFT-TPU: a TPU-native neural-network-potential benchmark framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the nablaDFT v2
benchmark stack (reference: AIRI-Institute/nablaDFT): dataset layer over the
nablaDFT energy / Hamiltonian SQLite databases, a model zoo of NNPs and
Hamiltonian predictors as jit-compiled modules over statically padded
molecular graphs, a single SPMD train/test/predict pipeline, and an on-device
batched L-BFGS conformational-optimization engine.

Everything on the compute path is functional JAX: fixed shapes, no
data-dependent control flow under jit, collectives via a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from nabladft_tpu.data.batch import MolBatch  # noqa: F401
