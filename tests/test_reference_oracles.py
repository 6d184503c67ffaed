"""Equivalence tests against the ACTUAL reference code (not transcriptions).

`/root/reference/PoseEst/pose_utils.py` is pure NumPy and
`/root/reference/Tracking/utils/train_utils.py` needs only torch + scipy —
both importable here, so the oracles below are the reference's own
functions loaded from disk (VERDICT r1 "strengthen the oracle tests").
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mot3d_tpu.geometry import (estimate_similarity_transform,
                                umeyama_similarity)
from mot3d_tpu.geometry.iou3d import box3d_iou
from mot3d_tpu.tracking.graph_builder import match_gt_identity

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_pose_utils():
    return _load("PoseEst/pose_utils.py", "ref_pose_utils")


@pytest.fixture(scope="module")
def ref_train_utils():
    return _load("Tracking/utils/train_utils.py", "ref_train_utils")


def _random_similarity(rng):
    angle = rng.uniform(-np.pi, np.pi, 3)
    cx, cy, cz = np.cos(angle)
    sx, sy, sz = np.sin(angle)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    rot = rz @ ry @ rx
    scale = rng.uniform(0.5, 2.5)
    trans = rng.uniform(-2, 2, 3)
    return scale, rot, trans


def _hom(points):
    return np.transpose(np.hstack([points, np.ones((points.shape[0], 1))]))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("method", ["quat", "svd"])
def test_umeyama_matches_reference(ref_pose_utils, seed, method):
    rng = np.random.default_rng(seed)
    scale, rot, trans = _random_similarity(rng)
    source = rng.uniform(-1, 1, (60, 3))
    # reference semantics: target_i = scale * source_i @ Rotation + trans
    target = scale * source @ rot + trans

    ref_scales, ref_rot, ref_trans, _ = ref_pose_utils.estimateSimilarityUmeyama(
        _hom(source), _hom(target))

    ours = umeyama_similarity(jnp.asarray(source), jnp.asarray(target),
                              jnp.ones(60), method=method)
    np.testing.assert_allclose(float(ours.scale), ref_scales[0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.rotation), ref_rot,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours.translation), ref_trans,
                               atol=2e-3)


def test_umeyama_reflection_branch_matches_reference(ref_pose_utils):
    """Target built with a reflection forces the det<0 correction
    (`pose_utils.py:39-42`)."""
    rng = np.random.default_rng(7)
    source = rng.uniform(-1, 1, (40, 3))
    refl = np.diag([1.0, 1.0, -1.0])
    target = 1.3 * source @ refl + np.array([0.2, -0.5, 1.0])
    ref_scales, ref_rot, ref_trans, _ = ref_pose_utils.estimateSimilarityUmeyama(
        _hom(source), _hom(target))
    assert np.linalg.det(ref_rot) > 0  # proper rotation enforced
    ours = umeyama_similarity(jnp.asarray(source), jnp.asarray(target),
                              jnp.ones(40), method="svd")
    np.testing.assert_allclose(float(ours.scale), ref_scales[0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.rotation), ref_rot, atol=5e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_full_solver_matches_reference_with_outliers(ref_pose_utils, seed):
    """Both RANSAC pipelines must recover the same ground-truth transform
    from 15%-outlier data (samplers differ, so compare via the GT)."""
    rng = np.random.default_rng(seed)
    scale, rot, trans = _random_similarity(rng)
    n = 200
    source = rng.uniform(-1, 1, (n, 3))
    target = scale * source @ rot + trans
    n_out = 30
    target[:n_out] += rng.uniform(3, 6, (n_out, 3))  # gross outliers

    np.random.seed(seed)  # reference uses the global NumPy RNG
    ref_scales, ref_rot, ref_trans, _ = ref_pose_utils.estimateSimilarityTransform(
        source, target)
    assert ref_scales is not None

    ours = estimate_similarity_transform(
        jnp.asarray(source), jnp.asarray(target), jnp.ones(n, bool),
        jax.random.PRNGKey(seed))
    assert bool(ours.valid)
    # Both within tight tolerance of the generating transform.
    for got_scale, got_rot, got_trans in [
            (ref_scales[0], ref_rot, ref_trans),
            (float(ours.scale), np.asarray(ours.rotation),
             np.asarray(ours.translation))]:
        np.testing.assert_allclose(got_scale, scale, rtol=5e-3)
        np.testing.assert_allclose(got_rot, rot, atol=5e-3)
        np.testing.assert_allclose(got_trans, trans, atol=2e-2)


# ---------------------------------------------------------------- 3D IoU

_SIGNS = np.array(
    [[1, 1, 1], [1, 1, -1], [-1, 1, -1], [-1, 1, 1],
     [1, -1, 1], [1, -1, -1], [-1, -1, -1], [-1, -1, 1]], np.float64)


def _box(center, half, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return center + (_SIGNS * half) @ ry.T


@pytest.mark.parametrize("seed", range(8))
def test_box3d_iou_matches_reference_qhull(ref_train_utils, seed):
    """Our fixed-buffer Sutherland-Hodgman BEV IoU vs the reference's
    scipy-qhull `compute_3d_iou` (`Tracking/utils/train_utils.py:83-176`)
    on the same canonically-ordered corners."""
    import torch
    rng = np.random.default_rng(seed)
    c1 = rng.uniform(-1, 1, 3)
    c2 = c1 + rng.uniform(-0.5, 0.5, 3)
    h1 = rng.uniform(0.3, 0.8, 3)
    h2 = rng.uniform(0.3, 0.8, 3)
    b1 = _box(c1, h1, rng.uniform(-np.pi, np.pi))
    b2 = _box(c2, h2, rng.uniform(-np.pi, np.pi))

    ref_iou, _ = ref_train_utils.compute_3d_iou(
        torch.tensor(b1), torch.tensor(b2))
    ours = float(box3d_iou(jnp.asarray(b1), jnp.asarray(b2))[0])
    np.testing.assert_allclose(ours, float(ref_iou), atol=2e-3)


def test_box3d_iou_disjoint_matches_reference(ref_train_utils):
    import torch
    b1 = _box(np.zeros(3), np.full(3, 0.5), 0.3)
    b2 = _box(np.array([5.0, 0.0, 0.0]), np.full(3, 0.5), -0.2)
    ref_iou, _ = ref_train_utils.compute_3d_iou(torch.tensor(b1),
                                                torch.tensor(b2))
    ours = float(box3d_iou(jnp.asarray(b1), jnp.asarray(b2))[0])
    np.testing.assert_allclose(ours, float(ref_iou), atol=1e-6)
    assert ours == pytest.approx(0.0, abs=1e-6)


def test_identity_matching_matches_reference_check_pair(ref_train_utils):
    """`match_gt_identity` vs the reference's per-detection `check_pair`
    (`train_utils.py:67-81`: argmax 3D IoU, assigned iff >= thres)."""
    import torch
    rng = np.random.default_rng(3)
    gt_ids = np.array([11, 22, 33], np.int64)
    gt_boxes = np.stack([_box(rng.uniform(-2, 2, 3), rng.uniform(0.3, 0.7, 3),
                              rng.uniform(-np.pi, np.pi)) for _ in range(3)])
    # predictions: near-copies of GT plus one far-away false positive
    pred = np.concatenate([
        gt_boxes + rng.normal(0, 0.02, gt_boxes.shape),
        _box(np.array([20.0, 0, 0]), np.full(3, 0.5), 0.0)[None]])

    ref_assign = []
    for i in range(4):
        ref_assign.append(ref_train_utils.check_pair(
            torch.tensor(pred[i]), torch.tensor(gt_boxes),
            torch.tensor(gt_ids), thres=0.01))
    ref_assign = [-1 if a is None else int(a) for a in ref_assign]

    ours = match_gt_identity(
        jnp.asarray(pred), jnp.ones(4, bool), jnp.asarray(gt_boxes),
        jnp.asarray(gt_ids, jnp.int32), jnp.ones(3, bool), 0.01)
    assert list(np.asarray(ours)) == ref_assign
