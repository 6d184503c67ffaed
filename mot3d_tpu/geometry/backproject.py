"""Pinhole backprojection, masked + static-shaped.

Replaces the reference's `backproject` (`PoseEst/pose_estimation.py:16-43`)
which `np.where`-gathers a variable-length point list.  Here the output is a
dense (H, W, 3) camera-space point map plus a validity mask; downstream ops
stay masked, or compact into a fixed-size buffer with `gather_masked_points`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_intrinsics(fx: float, fy: float, cx: float, cy: float) -> jax.Array:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


def backproject_depth(depth: jax.Array, intrinsics: jax.Array,
                      mask: jax.Array | None = None):
    """Depth map (H, W) -> camera-space point map (H, W, 3) + valid mask.

    Matches the reference convention (`PoseEst/pose_estimation.py:16-43`):
    p = K^-1 [u, v, 1]^T * z, then y and z negated (Blender camera looks -Z).
    Points where depth <= 0 (or mask is False) are invalid.
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # row index
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # col index
    z = depth.astype(jnp.float32)
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    pts = jnp.stack([x, -y, -z], axis=-1)
    valid = depth > 0
    if mask is not None:
        valid = jnp.logical_and(valid, mask.astype(bool))
    return pts, valid


def gather_masked_values(values: jax.Array, valid: jax.Array, max_points: int):
    """Compact masked values into a fixed-size buffer (TPU static shapes).

    values: any shape with trailing feature dim D (e.g. (H, W, D));
    valid: matching leading shape.  Returns
    ((max_points, D), (max_points,) valid, (max_points,) source flat indices).

    Deterministic: keeps values in raster order.  If more than `max_points`
    are valid, takes an even stride through the valid set so the buffer still
    spans the whole object (instead of truncating to the top rows).
    """
    d = values.shape[-1]
    flat_vals = values.reshape(-1, d)
    flat_valid = valid.reshape(-1)
    n = flat_valid.shape[0]
    n_valid = flat_valid.sum()

    # Rank of each valid element among valid elements (0-based raster order),
    # mapped onto a target slot; even stride when overfull.
    rank = jnp.cumsum(flat_valid) - 1
    slot = jnp.where(
        n_valid <= max_points,
        rank,
        (rank * max_points) // jnp.maximum(n_valid, 1),
    ).astype(jnp.int32)
    # First element of each slot is selected; compaction via top_k over the
    # negated raster index (on TPU top_k is far cheaper than a scatter-min
    # over the full pixel map).
    prev_slot = jnp.concatenate([jnp.full((1,), -1, jnp.int32), slot[:-1]])
    first = flat_valid & ((slot != prev_slot) | (rank == 0))
    raster = jnp.arange(n, dtype=jnp.int32)
    sentinel = jnp.iinfo(jnp.int32).min
    score = jnp.where(first, -raster, sentinel)
    neg, idx = jax.lax.top_k(score, max_points)  # ascending raster order
    out_valid = neg != sentinel
    out_vals = jnp.where(out_valid[:, None], flat_vals[idx], 0.0)
    return out_vals, out_valid, idx


def gather_masked_points(points: jax.Array, valid: jax.Array, max_points: int):
    """`gather_masked_values` specialised to 3-D points: returns (pts, valid)."""
    pts, ok, _ = gather_masked_values(points, valid, max_points)
    return pts, ok
