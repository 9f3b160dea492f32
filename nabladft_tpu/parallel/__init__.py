"""SPMD parallelism: meshes, shardings, collective helpers."""

from nabladft_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
