"""Statistical outlier removal as a batched masked JAX op.

TPU-native replacement for open3d's C++ `remove_statistical_outlier`
(used at `PoseEst/pose_estimation.py:311-349`): for each point, the mean
distance to its k nearest neighbours; points whose mean distance exceeds
mean + std_ratio * std (sample std over valid points) are dropped.

Runs as one (N, N) pairwise-distance pass over a fixed-size padded buffer —
an MXU-shaped matmul (|x-y|^2 = |x|^2 + |y|^2 - 2 x.y) plus a top-k, instead
of the reference's per-object KD-tree on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mot3d_tpu.ops.precision import high_precision


def _auto_impl() -> str:
    """Kernel on real TPU backends, XLA elsewhere (CPU tests, interpret)."""
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - backend not initialised
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "xla"


@high_precision
def statistical_outlier_mask(points: jax.Array, valid: jax.Array,
                             nb_neighbors: int = 20,
                             std_ratio: float = 2.0,
                             min_points: int = 100,
                             approx: bool = True,
                             candidates: int = 0,
                             impl: str = "auto") -> jax.Array:
    """Return the kept-point mask (N,) for a padded point buffer (N, 3).

    Matches open3d semantics: threshold = mean + std_ratio * sample-std of the
    per-point mean kNN distances.  If fewer than `min_points` points are valid
    the input mask is returned unchanged (reference skips cleaning below 100
    points, `pose_estimation.py:311`).

    candidates > 0 restricts each point's neighbour search to an evenly
    strided subset of `candidates` columns, with `nb_neighbors` scaled by the
    same fraction (the j-th NN among an f-fraction subset sits at the j/f-th
    NN overall, so the subset statistic tracks the full one up to a
    density-uniform factor — and the mean + std_ratio * std threshold is
    computed from the *same* statistic, so the kept set is stable).  This
    cuts both the pairwise-distance matmul and the top-k by n/candidates;
    it is the pose-pipeline hot path (the full (N, N) pass measured 37.5 ms
    of the 69 ms pose stage at 400 detections x 1024 points on v5e).
    """
    n = points.shape[0]
    valid = valid.astype(bool)

    if impl == "auto":
        impl = _auto_impl()
    if impl in ("pallas", "pallas_interpret"):
        # Fused VMEM-resident kernel: the (N, C) distance matrix never
        # touches HBM (ops/pallas/knn_outlier.py); exact k-NN instead of
        # the XLA path's approx_max_k.
        from mot3d_tpu.ops.pallas.knn_outlier import knn_mean_dists_pallas
        if candidates and candidates < n:
            cols = (jnp.arange(candidates) * n + n // 2) // candidates
            k = max(1, round(nb_neighbors * candidates / n))
        else:
            cols = jnp.arange(n)
            k = nb_neighbors
        k = min(k, cols.shape[0] - 1)
        # The kept mask is a non-differentiable selection (reference
        # semantics); stop_gradient keeps autodiff from ever tracing into
        # the kernel, which defines no VJP.
        pts_ng = jax.lax.stop_gradient(points)
        mean_knn = knn_mean_dists_pallas(
            pts_ng, pts_ng[cols], valid[cols], cols, k,
            interpret=(impl == "pallas_interpret"))
        return _threshold_keep(mean_knn, valid, std_ratio, min_points)

    sq = (points ** 2).sum(-1)

    if candidates and candidates < n:
        # Evenly spread column indices for ANY (n, candidates) pair: the
        # i-th candidate sits at the centre of the i-th of `candidates`
        # equal spans of [0, n).  An integer stride (n // candidates) would
        # degenerate to a spatially biased prefix when candidates does not
        # divide n (e.g. 600 of 1024 -> cols 0..599), starving the tail of
        # a raster-ordered buffer of neighbour candidates.
        cols = (jnp.arange(candidates) * n + n // 2) // candidates
        d2 = (sq[:, None] + sq[cols][None, :]
              - 2.0 * (points @ points[cols].T))
        col_valid = valid[cols]
        self_mask = jnp.arange(n)[:, None] == cols[None, :]
        n_cols = candidates
        k = max(1, round(nb_neighbors * candidates / n))
    else:
        d2 = sq[:, None] + sq[None, :] - 2.0 * (points @ points.T)
        col_valid = valid
        self_mask = jnp.eye(n, dtype=bool)
        n_cols = n
        k = nb_neighbors
    d2 = jnp.maximum(d2, 0.0)
    big = jnp.asarray(jnp.inf, points.dtype)
    # Invalidate padded columns and self-distances.
    d2 = jnp.where(col_valid[None, :], d2, big)
    d2 = jnp.where(self_mask, big, d2)

    k = min(k, n_cols - 1)
    # k smallest distances per row; approx_max_k is the TPU-native partial
    # sort (recall ~0.95; the mean-kNN statistic is insensitive to it).
    if approx and n_cols >= 128:
        neg_topk, _ = jax.lax.approx_max_k(-d2, k)
    else:
        neg_topk, _ = jax.lax.top_k(-d2, k)
    knn_d = jnp.sqrt(jnp.maximum(-neg_topk, 0.0))
    # If a row has fewer than k valid neighbours, inf leaks in; mask those.
    finite = jnp.isfinite(knn_d)
    cnt = jnp.maximum(finite.sum(-1), 1)
    mean_knn = jnp.where(finite, knn_d, 0.0).sum(-1) / cnt  # (N,)
    return _threshold_keep(mean_knn, valid, std_ratio, min_points)


def _threshold_keep(mean_knn: jax.Array, valid: jax.Array, std_ratio: float,
                    min_points: int) -> jax.Array:
    """open3d rule: drop points whose mean-kNN distance exceeds
    mean + std_ratio * sample-std (over valid points)."""
    n_valid = jnp.maximum(valid.sum(), 1)
    mu = jnp.where(valid, mean_knn, 0.0).sum() / n_valid
    var = jnp.where(valid, (mean_knn - mu) ** 2, 0.0).sum() / jnp.maximum(n_valid - 1, 1)
    thresh = mu + std_ratio * jnp.sqrt(var)

    keep = jnp.logical_and(valid, mean_knn <= thresh)
    skip = valid.sum() < min_points
    return jnp.where(skip, valid, keep)
