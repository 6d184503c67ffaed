"""Masked segment reductions over padded edge arrays.

TPU-native replacement for torch_scatter's CUDA `scatter_mean/max/add`
(`Tracking/networks/mpn.py:3,152-159`): `jax.ops.segment_sum` over
static-shaped edge tensors with validity masks, so the MPN aggregation is one
dense XLA scatter instead of a dynamic-shape CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: jax.Array | None = None) -> jax.Array:
    """Sum rows of `data` (E, D) into `num_segments` buckets; masked rows
    contribute zero."""
    if mask is not None:
        data = jnp.where(mask[:, None], data, 0.0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                 mask: jax.Array | None = None) -> jax.Array:
    """Mean over valid rows per segment (empty segments -> 0), matching
    torch_scatter.scatter_mean's empty-bucket behaviour."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones((data.shape[0],), data.dtype)
    if mask is not None:
        ones = ones * mask.astype(data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(counts, 1.0)[:, None]


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: jax.Array | None = None) -> jax.Array:
    """Max over valid rows per segment (empty segments -> 0, matching
    torch_scatter.scatter_max's zero-fill for empty buckets)."""
    neg = jnp.asarray(-jnp.inf, data.dtype)
    if mask is not None:
        data = jnp.where(mask[:, None], data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)
