"""Masked segment/aggregation primitives for padded batches.

Replaces torch-scatter (`scatter`, `segment_coo`) usage across the reference
models (painn_pyg/painn.py:10,128; gemnet_oc). With the dense [B, A, ...]
layout most aggregations are masked sums over an axis; these helpers cover the
remaining genuinely segmented cases (flattened node lists, relaxation engine
bookkeeping) with `jax.ops.segment_sum`, which XLA lowers efficiently on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum over `axis`, treating mask==False entries as 0.

    mask is broadcast against x from the left (mask [B,A] vs x [B,A,F]).
    """
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.sum(jnp.where(mask, x, 0.0), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int, eps: float = 1e-9) -> jnp.ndarray:
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    n = jnp.sum(mask, axis=axis)
    return s / jnp.maximum(n, eps)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax with masked entries excluded (weight exactly 0)."""
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(mask, logits, neg)
    probs = jax.nn.softmax(logits, axis=axis)
    return jnp.where(mask, probs, 0.0)


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, eps: float = 1e-9
) -> jnp.ndarray:
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[: segment_ids.ndim], dtype=data.dtype)
    n = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    while n.ndim < s.ndim:
        n = n[..., None]
    return s / jnp.maximum(n, eps)
