"""Device mesh + sharding rules: the framework's single SPMD story.

Replaces both reference DDP paths (Lightning DDPStrategy injection,
utils/pipelines.py:65-71, and PhiSNet's manual NCCL setup,
phisnet/train_ddp.py:186-205) with one compiled program over a
`jax.sharding.Mesh`:

  * axis "dp" — batch (molecule) dimension, over ICI;
  * axis "mp" — reserved for model/tensor sharding of the largest
    Hamiltonian models (unused = size 1 by default).

Gradients/metrics need no explicit collectives in user code: parameters are
replicated, batches are dp-sharded, and XLA inserts the psums when jit
partitions the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_dp: Optional[int] = None,
    n_mp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_mp
    use = n_dp * n_mp
    dev_array = np.asarray(devices[:use]).reshape(n_dp, n_mp)
    return Mesh(dev_array, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (molecule) axis split over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host MolBatch with its leading axis split over dp."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding) if x is not None else None

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
