"""Batched, masked, differentiable Umeyama similarity fit + vectorised RANSAC.

Reference behaviour: `PoseEst/pose_utils.py`.
  - estimateSimilarityUmeyama (:16-61): centroid-centred 3x3 covariance -> SVD
    with reflection correction; isotropic scale = sum(D)/var(source);
    translation t = mu_t - s * R^T mu_s where the returned "Rotation" is
    R = (U V^T)^T (the reference's convention — its transpose U V^T is the
    actual source->target rotation, applied in `transform_pc`).
  - getRANSACInliers (:63-83): 100 iterations x 10-point minimal sets; the
    model is scored by the Frobenius residual over *all* points using the
    (reference-convention) transform s*R p + t; best-so-far early stop at
    StopThreshold; inliers = per-point residual < PassThreshold.
  - estimateSimilarityTransform (:86-117): auto thresholds from mean norms;
    fails if best inlier ratio < 0.1; final Umeyama on the inliers.

TPU-native design: no Python loops over RANSAC iterations or points.  All
hypotheses are drawn up-front with a counter-based PRNG, the 10-point solver
is vmapped (100 tiny SVDs batch onto the TPU), residual evaluation is one
(iters, N) matmul-shaped pass, and the early-stop rule is reproduced with an
arg-reduction.  Point sets are fixed-size (N, 3) buffers with validity masks.
The whole solver is differentiable through jnp.linalg.svd's JVP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mot3d_tpu.ops.precision import high_precision


class SimilarityTransform(NamedTuple):
    scale: jax.Array        # () isotropic scale
    rotation: jax.Array     # (3, 3) reference-convention R (= (U V^T)^T)
    translation: jax.Array  # (3,)
    valid: jax.Array        # () bool — solver succeeded


def _kabsch_rotation_quat(cov: jax.Array, iters: int = 30) -> jax.Array:
    """Optimal source->target rotation R* from a 3x3 covariance, via Horn's
    quaternion method with fixed-iteration power iteration.

    TPU-native alternative to jnp.linalg.svd: builds the symmetric 4x4
    matrix K(cov) whose largest-eigenvalue eigenvector is the optimal unit
    quaternion, then runs `iters` power-iteration steps (pure batched
    matmuls, MXU-friendly, differentiable, deterministic) after a trace
    shift that makes the top eigenvalue dominant.  Handles the reflection
    case by construction (always returns a proper rotation — the behaviour
    the reference's sign-flip targets).
    """
    # Horn's N is built from M = sum s t^T; our covariance is sum t s^T.
    s = cov.T
    tr = s[0, 0] + s[1, 1] + s[2, 2]
    k = jnp.array([
        [tr, s[1, 2] - s[2, 1], s[2, 0] - s[0, 2], s[0, 1] - s[1, 0]],
        [s[1, 2] - s[2, 1], s[0, 0] - s[1, 1] - s[2, 2],
         s[0, 1] + s[1, 0], s[2, 0] + s[0, 2]],
        [s[2, 0] - s[0, 2], s[0, 1] + s[1, 0],
         s[1, 1] - s[0, 0] - s[2, 2], s[1, 2] + s[2, 1]],
        [s[0, 1] - s[1, 0], s[2, 0] + s[0, 2], s[1, 2] + s[2, 1],
         s[2, 2] - s[0, 0] - s[1, 1]],
    ])
    # Shift so the most-positive eigenvalue dominates in magnitude:
    # eigenvalues of K lie within +-2*||cov||_F * sqrt(3)-ish; Frobenius
    # bound is cheap and safe.
    shift = 2.0 * jnp.sqrt((s * s).sum()) + 1e-12
    km = k + shift * jnp.eye(4)

    # Accelerated power iteration by repeated squaring-ish: q <- normalise(Km^2 q).
    q = jnp.full((4,), 0.5, cov.dtype)

    def body(_, q):
        q = km @ (km @ q)
        return q / jnp.maximum(jnp.linalg.norm(q), 1e-20)

    q = jax.lax.fori_loop(0, iters, body, q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    # Quaternion -> rotation matrix (source->target).
    r = jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    return r


@high_precision
def umeyama_similarity(source: jax.Array, target: jax.Array,
                       weights: jax.Array,
                       method: str = "quat") -> SimilarityTransform:
    """Weighted Umeyama similarity fit source -> target.

    source, target: (N, 3); weights: (N,) nonnegative (0 = padded/invalid).
    Semantics match `PoseEst/pose_utils.py:16-61` for 0/1 weights: biased
    (1/N) covariance and variance, reflection handled as a proper rotation,
    scale = sum(D')/var(source), fallback scale 1 when var or sum(D) is zero.

    method: "quat" (default; Horn's quaternion solver via power iteration —
    batched matmuls, fast on TPU where small SVDs are slow) or "svd"
    (jnp.linalg.svd, bit-closer to the reference's LAPACK path).
    """
    w = weights.astype(source.dtype)
    n = jnp.maximum(w.sum(), 1e-12)
    mu_s = (source * w[:, None]).sum(0) / n
    mu_t = (target * w[:, None]).sum(0) / n
    # CovMatrix = CenteredTarget @ CenteredSource^T / nPoints  (3x3).
    # The mask is applied to one side only (applying it to both would square
    # the weights; for 0/1 weights one-sided masking is exact).
    ct = (target - mu_t) * w[:, None]
    cov = (ct.T @ (source - mu_s)) / n

    if method == "svd":
        u, d, vt = jnp.linalg.svd(cov, full_matrices=True)
        neg = (jnp.linalg.det(u) * jnp.linalg.det(vt)) < 0.0
        sign = jnp.where(neg, jnp.array([1.0, 1.0, -1.0], cov.dtype),
                         jnp.ones(3, cov.dtype))
        d = d * sign
        u = u * sign[None, :]
        r_star = u @ vt              # actual source->target rotation
        trace = d.sum()
    else:
        r_star = _kabsch_rotation_quat(cov)
        trace = (r_star * cov).sum()  # = trace(R*^T cov) = sum of D'

    rotation = r_star.T  # reference convention stores the transpose
    var_s = ((source - mu_s) ** 2 * w[:, None]).sum() / n
    degenerate = (var_s * trace) == 0.0
    scale = jnp.where(degenerate, 1.0, trace / jnp.maximum(var_s, 1e-20))
    # Translation = mu_t - mu_s . (s R)  == mu_t - s R^T mu_s
    translation = mu_t - scale * (rotation.T @ mu_s)
    return SimilarityTransform(scale, rotation, translation,
                               jnp.asarray(True))


@high_precision
def apply_similarity(t: SimilarityTransform, points: jax.Array) -> jax.Array:
    """Map points with the *actual* source->target transform s R^T p + t.

    Mirrors `PoseEst/pose_estimation.py:45-57` (transform_pc), where the
    reference multiplies by diag(scale) @ rot.transpose().
    """
    return t.scale * points @ t.rotation + t.translation


def _model_residuals(t: SimilarityTransform, source: jax.Array,
                     target: jax.Array) -> jax.Array:
    """Per-point residuals || target_i - (s R^T source_i + t) ||.

    Deliberate fix vs the reference: `evaluateModel`
    (`PoseEst/pose_utils.py:5-14`) scores with OutTransform
    (`pose_utils.py:58`), whose rotation block is the *transpose* of the
    actual source->target rotation (the one `transform_pc` applies), so its
    residuals are systematically wrong for non-symmetric rotations and its
    RANSAC only discriminates because the auto thresholds are enormous.
    We score with the true forward map (same as `apply_similarity`), which
    makes inlier selection meaningful; under the reference's loose auto
    thresholds the end behaviour is near-identical.
    """
    return jnp.linalg.norm(target - apply_similarity(t, source), axis=-1)


@high_precision
def ransac_umeyama(source: jax.Array, target: jax.Array, valid: jax.Array,
                   key: jax.Array, iters: int = 100, sample_size: int = 10,
                   pass_threshold: jax.Array | float = 200.0,
                   stop_threshold: jax.Array | float = 1.0,
                   method: str = "quat"):
    """Vectorised RANSAC (all hypotheses in one batch).

    Returns (inlier_mask (N,), best_inlier_ratio ()).
    Reproduces `getRANSACInliers` (`PoseEst/pose_utils.py:63-83`) semantics:
      - each hypothesis fits a 10-point Umeyama, residual = Frobenius norm of
        all-point residuals, inliers = residual_i < PassThreshold;
      - winner: the early-stop rule "stop once best-so-far < StopThreshold"
        == argmin of residuals over the prefix ending at the first hypothesis
        whose running best beats StopThreshold.
    Sampling uses a counter-based JAX PRNG (reference uses np.random.randint,
    so parity is statistical, not bitwise).
    """
    n = source.shape[0]
    n_valid = jnp.maximum(valid.sum(), 1)

    # Draw iters x sample_size indices uniformly over the *valid* points:
    # u in [0, n_valid) mapped through the sorted-valid-index table.
    valid_idx_table = jnp.argsort(~valid)  # valid indices first, raster order
    u = jax.random.randint(key, (iters, sample_size), 0, jnp.iinfo(jnp.int32).max)
    draw = valid_idx_table[(u % n_valid).astype(jnp.int32)]

    def fit(idx):
        w = jnp.ones((sample_size,), source.dtype)
        return umeyama_similarity(source[idx], target[idx], w, method)

    models = jax.vmap(fit)(draw)  # batched SimilarityTransform

    def residual_of(scale, rot, trans):
        t = SimilarityTransform(scale, rot, trans, jnp.asarray(True))
        r = _model_residuals(t, source, target)
        r = jnp.where(valid, r, 0.0)
        return jnp.sqrt((r ** 2).sum()), r

    model_res, point_res = jax.vmap(residual_of)(
        models.scale, models.rotation, models.translation)

    # Early-stop emulation: running best; k = first iter where best < stop.
    running_best = jax.lax.associative_scan(jnp.minimum, model_res)
    stopped = running_best < stop_threshold
    any_stop = stopped.any()
    k = jnp.where(any_stop, jnp.argmax(stopped), iters - 1)
    considered = jnp.arange(iters) <= k
    masked_res = jnp.where(considered, model_res, jnp.inf)
    best = jnp.argmin(masked_res)

    inliers = jnp.logical_and(point_res[best] < pass_threshold, valid)
    ratio = inliers.sum() / n  # reference divides by total point count
    return inliers, ratio


@high_precision
def estimate_similarity_transform(source: jax.Array, target: jax.Array,
                                  valid: jax.Array, key: jax.Array,
                                  iters: int = 100, sample_size: int = 10,
                                  ratio_adapt: float = 1.0,
                                  min_inlier_ratio: float = 0.1,
                                  stop_divisor: float = 100.0,
                                  method: str = "quat"
                                  ) -> SimilarityTransform:
    """Full solver: auto thresholds -> RANSAC -> final Umeyama on inliers.

    Mirrors `estimateSimilarityTransform` (`PoseEst/pose_utils.py:86-117`).
    On failure (inlier ratio < min_inlier_ratio) returns valid=False with the
    identity-ish fit still populated (callers mask on `.valid`).
    """
    n_valid = jnp.maximum(valid.sum(), 1)
    norm_s = jnp.where(valid, jnp.linalg.norm(source, axis=-1), 0.0).sum() / n_valid
    norm_t = jnp.where(valid, jnp.linalg.norm(target, axis=-1), 0.0).sum() / n_valid
    ratio_ts = norm_t / jnp.maximum(norm_s, 1e-12)
    ratio_st = norm_s / jnp.maximum(norm_t, 1e-12)
    pass_t = jnp.maximum(ratio_st, ratio_ts) * ratio_adapt
    stop_t = pass_t / stop_divisor

    inliers, ratio = ransac_umeyama(source, target, valid, key, iters,
                                    sample_size, pass_t, stop_t, method)
    # Note: the reference computes ratio over the raw buffer length; with
    # padded buffers we renormalise to valid points for the failure test.
    ratio_valid = inliers.sum() / n_valid

    fit = umeyama_similarity(source, target, inliers.astype(source.dtype),
                             method)
    ok = jnp.logical_and(ratio_valid >= min_inlier_ratio, valid.sum() >= sample_size)
    return SimilarityTransform(fit.scale, fit.rotation, fit.translation, ok)
