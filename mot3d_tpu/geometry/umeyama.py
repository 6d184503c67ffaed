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


def _sym4_square(m):
    """Square a symmetric 4x4 given as a 4x4 nested tuple of (...,) scalars.

    Products of a symmetric matrix with itself stay symmetric, so only the
    upper triangle is computed.  Scalar-expression form on purpose: inside
    the vmapped RANSAC hot loop a (..., 4, 4) array pads each matrix to a
    full (8, 128) TPU tile — ~256x wasted VPU/VMEM traffic across 40k
    lanes, measured as the dominant pose-stage cost; (...,)-shaped lanes
    are packed densely.
    """
    out = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i, 4):
            out[i][j] = sum(m[i][k] * m[k][j] for k in range(4))
            out[j][i] = out[i][j]
    return out


def _horn_rstar_scalars(c):
    """Optimal source->target rotation r* from a 3x3 covariance, scalar form.

    c: 3x3 nested list of (...,) covariance components (target x source,
    as `umeyama_similarity` builds it).  Returns r* as a 3x3 nested list of
    (...,) scalars.  Horn's quaternion method: the largest-eigenvalue
    eigenvector of the symmetric 4x4 K(cov) is the optimal unit quaternion;
    a trace shift makes that eigenvalue dominant in magnitude and
    K^(2^6) q0 extracts it by repeated squaring.  Written entirely in
    scalar expressions so every intermediate is a lane-packed (...,) array
    — a (..., 4, 4) matrix pads to a full (8, 128) TPU tile per lane.
    Handles the reflection case by construction (always a proper rotation —
    the behaviour the reference's SVD sign-flip targets).
    """
    # s = cov.T (Horn's N is built from sum s t^T; ours is sum t s^T).
    s = [[c[j][i] for j in range(3)] for i in range(3)]
    # Degenerate guard: an all-zero covariance (padded detection slot with
    # every weight 0, or a RANSAC hypothesis that drew one coincident
    # point) is replaced by the identity BEFORE any rsqrt touches it.
    # Guarding only the outputs is not enough — `where` blocks the
    # unselected branch's cotangent but that zero still multiplies the
    # branch's internal inf derivatives (0 * inf = NaN), which poisons the
    # whole batch gradient (root-caused by tests/test_combined_step.py::
    # test_differentiable_pose_reaches_detector: differentiable-pose
    # training was NaN).  Forward: degenerate lanes now return the identity
    # rotation (they are masked invalid downstream either way).
    ss = sum(s[i][j] ** 2 for i in range(3) for j in range(3))
    pos = ss > 0
    s = [[jnp.where(pos, s[i][j], 1.0 if i == j else 0.0) for j in range(3)]
         for i in range(3)]
    tr = s[0][0] + s[1][1] + s[2][2]
    shift = 2.0 * jnp.sqrt(sum(s[i][j] ** 2 for i in range(3)
                               for j in range(3))) + 1e-12
    m = [[tr + shift, s[1][2] - s[2][1], s[2][0] - s[0][2], s[0][1] - s[1][0]],
         [None, s[0][0] - s[1][1] - s[2][2] + shift,
          s[0][1] + s[1][0], s[2][0] + s[0][2]],
         [None, None, s[1][1] - s[0][0] - s[2][2] + shift, s[1][2] + s[2][1]],
         [None, None, None, s[2][2] - s[0][0] - s[1][1] + shift]]
    for i in range(4):
        for j in range(i):
            m[i][j] = m[j][i]

    # K^(2^6) by normalised squaring (== 64 power-iteration steps with
    # sequential depth 6); Frobenius normalisation keeps f32 in range and
    # leaves the top eigenvector unchanged.
    for _ in range(6):
        m = _sym4_square(m)
        f2 = sum(m[i][j] ** 2 for i in range(4) for j in range(4))
        fpos = f2 > 0
        fro = jnp.where(fpos, jnp.sqrt(jnp.where(fpos, f2, 1.0)), 0.0)
        inv = 1.0 / jnp.maximum(fro, 1e-15)  # eps^2 must not FTZ in the VJP
        m = [[m[i][j] * inv for j in range(4)] for i in range(4)]

    # q = K^64 @ q0 (q0 = const), normalised -> unit quaternion.
    q = [m[i][0] + m[i][1] + m[i][2] + m[i][3] for i in range(4)]
    q2 = q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2
    qpos = q2 > 0
    qn = 1.0 / jnp.maximum(
        jnp.where(qpos, jnp.sqrt(jnp.where(qpos, q2, 1.0)), 0.0), 1e-15)
    w, x, y, z = q[0] * qn, q[1] * qn, q[2] * qn, q[3] * qn
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]


def _umeyama_fit_scalars(sc, tc, w):
    """Weighted Umeyama fit in scalar (structure-of-arrays) form.

    sc, tc: 3-tuples of (..., P) source/target component arrays; w: (..., P)
    0/1 weights.  Returns (scale (...,), r* 3x3 nested list of (...,),
    translation 3-list of (...,)) — the same quantities as
    `umeyama_similarity(method="quat")` without ever materialising a
    (..., 3, 3) array (tile-padding economics: see `_sym4_square`).
    """
    n = jnp.maximum(w.sum(-1), 1e-12)
    mus = [(x * w).sum(-1) / n for x in sc]
    mut = [(x * w).sum(-1) / n for x in tc]
    # One-sided masking (exact for 0/1 weights): ct_i = w * (t_i - mu_t_i).
    cov = [[(((tc[i] - mut[i][..., None]) * w
              * (sc[j] - mus[j][..., None])).sum(-1) / n)
            for j in range(3)] for i in range(3)]
    rstar = _horn_rstar_scalars(cov)
    trace = sum(rstar[i][j] * cov[i][j] for i in range(3) for j in range(3))
    var_s = sum(((sc[j] - mus[j][..., None]) ** 2 * w).sum(-1)
                for j in range(3)) / n
    degenerate = (var_s * trace) == 0.0
    # 1e-12, not 1e-20: the div VJP computes -g*x/denom^2 and 1e-40
    # flushes to zero (subnormal FTZ) -> 0/0 NaN in the backward pass.
    scale = jnp.where(degenerate, 1.0, trace / jnp.maximum(var_s, 1e-12))
    # translation = mu_t - scale * (r* @ mu_s).
    translation = [mut[j] - scale * sum(rstar[j][i] * mus[i]
                                        for i in range(3))
                   for j in range(3)]
    return scale, rstar, translation


@high_precision
def umeyama_similarity(source: jax.Array, target: jax.Array,
                       weights: jax.Array,
                       method: str = "quat") -> SimilarityTransform:
    """Weighted Umeyama similarity fit source -> target.

    source, target: (N, 3); weights: (N,) nonnegative (0 = padded/invalid).
    Semantics match `PoseEst/pose_utils.py:16-61` for 0/1 weights: biased
    (1/N) covariance and variance, reflection handled as a proper rotation,
    scale = sum(D')/var(source), fallback scale 1 when var or sum(D) is zero.

    method: "quat" (default; Horn's quaternion solver in lane-packed
    scalar form — see `_umeyama_fit_scalars`; fast on TPU where small
    SVDs are slow) or "svd" (jnp.linalg.svd, bit-closer to the
    reference's LAPACK path).
    """
    w = weights.astype(source.dtype)
    if method == "quat":
        sc = tuple(source[..., j] for j in range(3))
        tc = tuple(target[..., j] for j in range(3))
        scale, rstar, tr = _umeyama_fit_scalars(sc, tc, w)
        # r* assembled once at the boundary; reference convention stores
        # the transpose.
        rotation = jnp.stack(
            [jnp.stack([rstar[j][i] for j in range(3)], -1)
             for i in range(3)], -2)
        translation = jnp.stack(tr, -1)
        return SimilarityTransform(scale, rotation, translation,
                                   jnp.asarray(True))

    n = jnp.maximum(w.sum(), 1e-12)
    mu_s = (source * w[:, None]).sum(0) / n
    mu_t = (target * w[:, None]).sum(0) / n
    # CovMatrix = CenteredTarget @ CenteredSource^T / nPoints  (3x3).
    # The mask is applied to one side only (applying it to both would square
    # the weights; for 0/1 weights one-sided masking is exact).
    ct = (target - mu_t) * w[:, None]
    cov = (ct.T @ (source - mu_s)) / n

    u, d, vt = jnp.linalg.svd(cov, full_matrices=True)
    neg = (jnp.linalg.det(u) * jnp.linalg.det(vt)) < 0.0
    sign = jnp.where(neg, jnp.array([1.0, 1.0, -1.0], cov.dtype),
                     jnp.ones(3, cov.dtype))
    d = d * sign
    u = u * sign[None, :]
    r_star = u @ vt              # actual source->target rotation
    trace = d.sum()

    rotation = r_star.T  # reference convention stores the transpose
    var_s = ((source - mu_s) ** 2 * w[:, None]).sum() / n
    degenerate = (var_s * trace) == 0.0
    # 1e-12, not 1e-20: the div VJP computes -g*x/denom^2 and 1e-40
    # flushes to zero (subnormal FTZ) -> 0/0 NaN in the backward pass.
    scale = jnp.where(degenerate, 1.0, trace / jnp.maximum(var_s, 1e-12))
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

    u = jax.random.randint(key, (iters, sample_size), 0, jnp.iinfo(jnp.int32).max)
    rank = (u % n_valid).astype(jnp.int32)                # (iters, S)

    if method == "quat":
        # Moment-matmul hot path.  The earlier gather form (compaction
        # table -> point gathers -> scalar fits -> (iters, N) residual
        # reduction) measured ~13 ms at bench shapes (400 detections x 100
        # hypotheses), dominated by the table scatter and the batched
        # gathers, NOT by the fit math.  This formulation has no gathers at
        # all: every fit statistic is a sum over the drawn multiset, i.e.
        # one (iters, N) selection-count matrix times an (N, 18) feature
        # matrix — a single MXU matmul — and hypothesis scoring is a
        # closed-form quadratic in the fitted transform, so the (iters, N)
        # residual matrix is never materialised either.
        dt = source.dtype
        v_f = valid.astype(dt)
        nv = n_valid.astype(dt)
        # rank_pt[n] = rank of point n among valid points (raster order);
        # drawing rank r selects the same point the compaction table did.
        rank_pt = jnp.where(valid, jnp.cumsum(valid) - 1, -1)  # (N,)
        # W[h, n] = multiplicity of point n in hypothesis h's 10-point draw.
        w_sel = sum((rank[:, s, None] == rank_pt[None, :]).astype(dt)
                    for s in range(sample_size))          # (iters, N)

        # Centre both clouds by their global valid centroids: covariance /
        # scale are shift-invariant (per-hypothesis means are subtracted),
        # and centred second moments avoid the E[st] - E[s]E[t]
        # cancellation that raw moments would suffer in f32.
        cs = [(source[:, j] * v_f).sum() / nv for j in range(3)]
        ct = [(target[:, j] * v_f).sum() / nv for j in range(3)]
        sx = [jnp.where(valid, source[:, j] - cs[j], 0.0) for j in range(3)]
        tx = [jnp.where(valid, target[:, j] - ct[j], 0.0) for j in range(3)]

        # Features: everything a weighted Umeyama fit needs, per point.
        feats = (sx + tx + [sx[j] * sx[j] for j in range(3)]
                 + [tx[i] * sx[j] for i in range(3) for j in range(3)])
        fmat = jnp.stack(feats, axis=-1)                  # (N, 18)
        mom = w_sel @ fmat                                # (iters, 18) MXU
        s_n = jnp.asarray(float(sample_size), dt)
        mus = [mom[:, j] / s_n for j in range(3)]
        mut = [mom[:, 3 + j] / s_n for j in range(3)]
        cov = [[mom[:, 9 + 3 * i + j] / s_n - mut[i] * mus[j]
                for j in range(3)] for i in range(3)]
        var_s = sum(mom[:, 6 + j] / s_n - mus[j] ** 2 for j in range(3))
        rstar = _horn_rstar_scalars(cov)
        trace = sum(rstar[i][j] * cov[i][j]
                    for i in range(3) for j in range(3))
        degenerate = (var_s * trace) == 0.0
        # 1e-12, not 1e-20: denom^2 must stay a normal f32 in the div VJP.
        scale = jnp.where(degenerate, 1.0,
                          trace / jnp.maximum(var_s, 1e-12))
        # Translation in centred coordinates; uncentred only for the winner.
        tau = [mut[j] - scale * sum(rstar[j][i] * mus[i] for i in range(3))
               for j in range(3)]

        # Closed-form residual norm: with A_j = [s r*_j0, s r*_j1, s r*_j2,
        # tau_j] and P = [sx; sy; sz; v] (4, N) masked-centred homogeneous
        # points,  sum_n v r_n^2 = sum_j (c_j - 2 A_j.B_j + A_j M A_j^T)
        # where M = P P^T (4x4), B = T~ P^T (3x4), c_j = sum v tx_j^2 —
        # all per-detection constants, so scoring is ~60 lane flops per
        # hypothesis instead of an (iters, N) pass.
        p_h = jnp.stack(sx + [v_f], axis=0)               # (4, N)
        m_q = p_h @ p_h.T                                 # (4, 4)
        t_m = jnp.stack(tx, axis=0)                       # (3, N)
        b_q = t_m @ p_h.T                                 # (3, 4)
        c_q = [(tx[j] ** 2).sum() for j in range(3)]

        def a_row(j):
            return [scale * rstar[j][0], scale * rstar[j][1],
                    scale * rstar[j][2], tau[j]]

        rsq_total = 0.0
        for j in range(3):
            a = a_row(j)
            quad = sum(a[k] * a[l] * m_q[k, l]
                       for k in range(4) for l in range(4))
            rsq_total = rsq_total + c_q[j] - 2.0 * sum(
                a[k] * b_q[j, k] for k in range(4)) + quad
        # Grad-safe sqrt: a perfect (or clamped-negative) fit must not emit
        # sqrt'(0) = inf into the differentiable-pose gradient.
        rpos = rsq_total > 0
        model_res = jnp.where(
            rpos, jnp.sqrt(jnp.where(rpos, rsq_total, 1.0)), 0.0)  # (iters,)

        # Winner's per-point inlier test needs the uncentred transform.
        px = [source[:, j] for j in range(3)]             # (N,)

        def rsq_of(sc_h, rs_h, tr_h):
            """sc_h (...,), rs_h 3x3 of (...,), tr_h 3 of (...,) broadcast
            against the (N,) point components -> (..., N) residual^2."""
            r = 0.0
            for j in range(3):
                tj = sc_h[..., None] * sum(
                    rs_h[j][i][..., None] * px[i] for i in range(3)) \
                    + tr_h[j][..., None]
                r = r + (target[:, j] - tj) ** 2
            return jnp.where(valid, r, 0.0)

        pass_sq = jnp.square(pass_threshold)
    else:
        # Compaction table draw for the svd reference path (slow; kept as
        # the bit-closest-to-reference oracle).
        slot = jnp.where(valid, jnp.cumsum(valid) - 1, n)
        valid_idx_table = jnp.zeros((n,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        draw = valid_idx_table[rank]

        def fit(idx):
            w = jnp.ones((sample_size,), source.dtype)
            return umeyama_similarity(source[idx], target[idx], w, method)

        models = jax.vmap(fit)(draw)  # batched SimilarityTransform

        def residual_of(scale, rot, trans):
            t = SimilarityTransform(scale, rot, trans, jnp.asarray(True))
            r = _model_residuals(t, source, target)
            r = jnp.where(valid, r, 0.0)
            return jnp.sqrt((r ** 2).sum()), r ** 2

        model_res, rsq_all = jax.vmap(residual_of)(
            models.scale, models.rotation, models.translation)
        pass_sq = jnp.square(pass_threshold)

    # Early-stop emulation: running best; k = first iter where best < stop.
    running_best = jax.lax.associative_scan(jnp.minimum, model_res)
    stopped = running_best < stop_threshold
    any_stop = stopped.any()
    k = jnp.where(any_stop, jnp.argmax(stopped), iters - 1)
    considered = jnp.arange(iters) <= k
    masked_res = jnp.where(considered, model_res, jnp.inf)
    best = jnp.argmin(masked_res)

    # residual < pass  <=>  residual^2 < pass^2 (thresholds are positive).
    if method == "quat":
        take = lambda x: x[best]
        rs_b = [[take(rstar[i][j]) for j in range(3)] for i in range(3)]
        sc_b = take(scale)
        # Uncentre: t_actual = tau + ct - s R* cs (fits ran on centred data).
        tr_b = [take(tau[j]) + ct[j]
                - sc_b * sum(rs_b[j][i] * cs[i] for i in range(3))
                for j in range(3)]
        rsq_best = rsq_of(sc_b, rs_b, tr_b)
    else:
        rsq_best = rsq_all[best]
    inliers = jnp.logical_and(rsq_best < pass_sq, valid)
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

    def _safe_norms(pts):
        # norm with a grad-safe sqrt: padded slots are exact zeros and
        # sqrt'(0) = inf would NaN the differentiable-pose gradient.
        sq = (pts ** 2).sum(-1)
        pos = sq > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)

    norm_s = jnp.where(valid, _safe_norms(source), 0.0).sum() / n_valid
    norm_t = jnp.where(valid, _safe_norms(target), 0.0).sum() / n_valid
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
