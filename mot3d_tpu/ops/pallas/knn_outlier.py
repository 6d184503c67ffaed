"""Pallas kernel: fused kNN mean-distance for statistical outlier removal.

The XLA formulation (`geometry/outlier.py`) materialises the per-detection
(N, C) pairwise-distance matrix in HBM — 420 MB at bench shapes (400
detections x 1024 points x 256 candidates, f32) — and then runs
`approx_max_k` over it, re-reading everything.  Per detection the matrix is
only 1 MB: this kernel keeps it entirely in VMEM, extracts the k smallest
distances with exact min-extraction passes, and writes back just the (N,)
mean-kNN statistic — ~60x less HBM traffic for the pose stage's dominant op.

Semantics: exact k-NN (the XLA path's `approx_max_k` has recall ~0.95, so
the kernel is *more* faithful to open3d's KD-tree result, reference use at
`PoseEst/pose_estimation.py:311-349`).  Ties are broken by first column
index, matching a stable sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # "infinity" that survives arithmetic without NaNs


def _kernel(pts_ref, cand_ref, colv_ref, cols_ref, out_ref, *, k: int):
    """pts (3, N); cand (3, C); colv (8, C); cols (8, C) f32; out (8, N)."""
    pts = pts_ref[...]                              # (3, N)
    cand = cand_ref[...]                            # (3, C)
    n = pts.shape[1]
    c = cand.shape[1]

    # d2[i, j] = |p_i|^2 + |q_j|^2 - 2 p_i.q_j, MXU for the cross term.
    sq_r = jnp.sum(pts * pts, axis=0)[:, None]      # (N, 1)
    sq_c = jnp.sum(cand * cand, axis=0)[None, :]    # (1, C)
    cross = jax.lax.dot_general(pts, cand, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq_r + sq_c - 2.0 * cross, 0.0)

    # Invalidate padded candidate columns and self-distances.
    col_ok = colv_ref[0:1, :] > 0.5                 # (1, C)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)
    col_src = cols_ref[0:1, :].astype(jnp.int32)    # (1, C) source indices
    d2 = jnp.where(col_ok & (row_i != col_src), d2, _BIG)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    acc = jnp.zeros((n, 1), jnp.float32)
    cnt = jnp.zeros((n, 1), jnp.float32)
    for _ in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)      # (N, 1)
        fin = m < _BIG * 0.5
        acc = acc + jnp.where(fin, jnp.sqrt(m), 0.0)
        cnt = cnt + fin.astype(jnp.float32)
        # Mask exactly one occurrence of the minimum (lowest column index).
        imin = jnp.min(jnp.where(d2 <= m, col_iota, c), axis=1,
                       keepdims=True)
        d2 = jnp.where(col_iota == imin, _BIG, d2)

    mean = (acc / jnp.maximum(cnt, 1.0))[:, 0]      # (N,)
    out_ref[...] = jnp.broadcast_to(mean[None, :], (8, n))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_mean_dists_pallas(points: jax.Array, cand: jax.Array,
                          col_valid: jax.Array, cols: jax.Array,
                          k: int, interpret: bool = False) -> jax.Array:
    """Mean distance to the k nearest candidates, per point.

    points (N, 3); cand (C, 3) candidate points; col_valid (C,) bool;
    cols (C,) int32 source index of each candidate (for self-exclusion).
    Returns (N,) f32.  vmap adds grid dimensions (one program per
    detection), mirroring `pose_extract_pallas`.
    """
    n = points.shape[0]
    c = cand.shape[0]
    pts_t = points.astype(jnp.float32).T                       # (3, N)
    cand_t = cand.astype(jnp.float32).T                        # (3, C)
    colv = jnp.broadcast_to(col_valid.astype(jnp.float32)[None, :], (8, c))
    cols_f = jnp.broadcast_to(cols.astype(jnp.float32)[None, :], (8, c))

    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pts (3, N)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cand (3, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # colv (8, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cols (8, C)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )(pts_t, cand_t, colv, cols_f)
    return out[0]
