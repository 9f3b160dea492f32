"""Shared compute ops: graph construction, radial bases, spherical algebra."""

from nabladft_tpu.ops import graph, radial, segment  # noqa: F401
