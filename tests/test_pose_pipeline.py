"""Pose pipeline: synthetic render -> recovery of known poses; GT box crop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mot3d_tpu.config import default_config
from mot3d_tpu.geometry import euler_to_rotmat, make_intrinsics
from mot3d_tpu.pose import (crop_gt_box3d, estimate_object_pose,
                            postprocess_frame)

CFG = default_config()
CAM = CFG.camera
K = make_intrinsics(CAM.fx, CAM.fy, CAM.cx, CAM.cy)
RNG = np.random.default_rng(9)


def render_object(euler, scale, trans, n=400000):
    """Z-buffer render of a NOCS cube *surface* into depth/nocs/mask maps.

    The visible surface must be spatially smooth (as real NOCS maps are) for
    the detector-resolution 28x28 patch to carry the signal.
    """
    H, W = CAM.height, CAM.width
    R = np.asarray(euler_to_rotmat(jnp.array(euler)))
    # Sample points on the cube surface (one coordinate pinned to a face).
    pts = RNG.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    face = RNG.integers(0, 6, n)
    pts[np.arange(n), face % 3] = np.where(face < 3, 0.05, 0.95)
    nocs_pts = pts - 0.5
    cam = scale * nocs_pts @ R.T + trans
    x, y, z = cam[:, 0], -cam[:, 1], -cam[:, 2]
    u = np.round(x / z * CAM.fx + CAM.cx).astype(int)
    v = np.round(y / z * CAM.fy + CAM.cy).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    depth = np.full((H, W), np.inf, np.float32)
    nocs = np.zeros((H, W, 3), np.float32)
    # z-buffer: nearest point wins (process far-to-near).
    order = np.argsort(-z[ok])
    uu, vv, zz = u[ok][order], v[ok][order], z[ok][order]
    nn = (nocs_pts[ok] + 0.5)[order]
    depth[vv, uu] = zz
    nocs[vv, uu] = nn
    depth[~np.isfinite(depth)] = 0.0
    mask = depth > 0
    box = np.array([u[ok].min(), v[ok].min(), u[ok].max() + 1,
                    v[ok].max() + 1], np.float32)
    return depth, nocs, mask, box, cam


def nocs_patch_from_map(nocs, box, g=28):
    """Resample the map's box region to a 28x28 patch (detector-style)."""
    import cv2
    x0, y0, x1, y1 = (int(v) for v in box)
    crop = nocs[y0:y1, x0:x1]
    return cv2.resize(crop, (g, g), interpolation=cv2.INTER_NEAREST)


class TestEstimateObjectPose:
    def test_recovers_known_pose(self):
        euler = np.array([0.0, 0.8, 0.0], np.float32)
        scale, trans = 1.3, np.array([0.2, -0.1, -2.8], np.float32)
        depth, nocs, mask, box, _ = render_object(euler, scale, trans)
        patch = nocs_patch_from_map(nocs, box)
        campose = np.eye(4, dtype=np.float32)
        campose[:3, 3] = [0.5, 1.0, -0.2]

        res = jax.jit(lambda *a: estimate_object_pose(*a, CFG))(
            jnp.array(patch), jnp.array(depth), jnp.array(campose), K,
            jnp.array(mask), jnp.array(box), jax.random.PRNGKey(0))
        assert bool(res.valid)
        # ~6% scale bias is inherent to the 28x28 patch resolution at
        # silhouette edges (the reference detector output has the same).
        np.testing.assert_allclose(float(res.scale), scale, rtol=0.1)
        # world translation = campose @ cad2cam translation
        want_t = campose[:3, :3] @ trans + campose[:3, 3]
        np.testing.assert_allclose(np.asarray(res.translation), want_t,
                                   atol=0.08)
        # euler of the unscaled world rotation ~ object euler (identity camera
        # rotation)
        np.testing.assert_allclose(np.asarray(res.euler), euler, atol=0.1)

    def test_empty_mask_invalid(self):
        depth = np.zeros((CAM.height, CAM.width), np.float32)
        res = estimate_object_pose(
            jnp.zeros((28, 28, 3)), jnp.array(depth), jnp.eye(4), K,
            jnp.zeros((CAM.height, CAM.width), bool),
            jnp.array([10.0, 10.0, 50.0, 50.0]), jax.random.PRNGKey(0), CFG)
        assert not bool(res.valid)
        assert np.isfinite(np.asarray(res.translation)).all()


class TestCropGtBox3d:
    def test_fully_visible_box_unchanged(self):
        euler = np.zeros(3, np.float32)
        scale, trans = 1.0, np.array([0.0, 0.0, -3.0], np.float32)
        depth, nocs, mask, box2d, cam = render_object(euler, scale, trans)
        campose = np.eye(4, dtype=np.float32)
        world = cam  # identity campose
        gt_box = np.zeros((8, 3), np.float32)
        mins, maxs = world.min(0) - 0.02, world.max(0) + 0.02
        from mot3d_tpu.geometry import aabb_corners
        gt_box = np.asarray(aabb_corners(jnp.array(mins), jnp.array(maxs)))
        cropped = np.asarray(crop_gt_box3d(
            jnp.array(depth), jnp.array(campose), K, jnp.array(gt_box),
            jnp.array(box2d), jnp.array(mask)))
        # Fully visible -> essentially unchanged (within point sampling).
        np.testing.assert_allclose(cropped, gt_box, atol=0.1)

    def test_occluded_box_shrinks(self):
        euler = np.zeros(3, np.float32)
        scale, trans = 1.0, np.array([0.0, 0.0, -3.0], np.float32)
        depth, nocs, mask, box2d, cam = render_object(euler, scale, trans)
        # Occlude the right half of the image.
        cut = int(box2d[0] + (box2d[2] - box2d[0]) / 2)
        depth2 = depth.copy()
        depth2[:, cut:] = 0.0
        mask2 = depth2 > 0
        from mot3d_tpu.geometry import aabb_corners
        mins, maxs = cam.min(0), cam.max(0)
        gt_box = np.asarray(aabb_corners(jnp.array(mins), jnp.array(maxs)))
        cropped = np.asarray(crop_gt_box3d(
            jnp.array(depth2), jnp.eye(4), K, jnp.array(gt_box),
            jnp.array(box2d), jnp.array(mask2)))
        # x extent must shrink (right half of the object is invisible;
        # camera x maps to world x with identity pose).
        assert cropped[:, 0].max() < gt_box[:, 0].max() - 0.1
        assert cropped[:, 1].min() == pytest.approx(gt_box[:, 1].min(), abs=0.1)


class TestPostprocessFrame:
    def test_gating_and_pose(self):
        euler = np.array([0.0, 0.4, 0.0], np.float32)
        scale, trans = 1.2, np.array([0.1, 0.0, -3.0], np.float32)
        depth, nocs, mask, box2d, cam = render_object(euler, scale, trans)
        patch = nocs_patch_from_map(nocs, box2d)
        I = 4
        det_boxes = np.zeros((I, 4), np.float32)
        det_boxes[0] = box2d
        det_boxes[1] = [5, 5, 30, 30]        # low score -> gated
        det_scores = np.array([0.9, 0.1, 0.0, 0.0], np.float32)
        det_classes = np.zeros(I, np.int32)
        det_valid = np.array([True, True, False, False])
        det_masks = np.zeros((I, 28, 28), np.float32)
        # full-box mask at 28x28 (the paste covers the whole box)
        det_masks[0] = 1.0
        det_voxels = np.zeros((I, 32, 32, 32), np.float32)
        det_nocs = np.zeros((I, 28, 28, 3), np.float32)
        det_nocs[0] = patch
        gt_boxes2d = box2d[None].repeat(2, 0)
        gt_valid = np.array([True, False])
        from mot3d_tpu.geometry import aabb_corners
        gt3d = np.asarray(aabb_corners(jnp.array(cam.min(0) - 0.05),
                                       jnp.array(cam.max(0) + 0.05)))
        gt_boxes3d = gt3d[None].repeat(2, 0)

        out = jax.jit(lambda *a: postprocess_frame(*a, CFG))(
            jnp.array(det_boxes), jnp.array(det_scores),
            jnp.array(det_classes), jnp.array(det_valid),
            jnp.array(det_masks), jnp.array(det_voxels), jnp.array(det_nocs),
            jnp.array(gt_boxes2d), jnp.array(gt_valid), jnp.array(depth),
            jnp.eye(4), K, jnp.array(gt_boxes3d), jax.random.PRNGKey(0))

        v = np.asarray(out.valid)
        assert v[0] and not v[1:].any()
        np.testing.assert_allclose(float(out.scales[0]), scale, rtol=0.08)
        np.testing.assert_allclose(np.asarray(out.translations[0]), trans,
                                   atol=0.08)


class TestDifferentiablePose:
    def test_gradient_gate(self):
        """The north-star claim: the pose solver is differentiable end to
        end.  pose.differentiable=True lets gradients flow from the pose
        outputs back into the NOCS patch (the reference detaches,
        postprocess.py:151 — our default False reproduces that)."""
        import dataclasses
        euler = np.array([0.0, 0.3, 0.0], np.float32)
        scale, trans = 1.1, np.array([0.0, 0.0, -2.5], np.float32)
        depth, nocs, mask, box, _ = render_object(euler, scale, trans)
        patch = jnp.array(nocs_patch_from_map(nocs, box))

        def make_loss(cfg):
            def loss(p):
                res = estimate_object_pose(
                    p, jnp.array(depth), jnp.eye(4), K, jnp.array(mask),
                    jnp.array(box), jax.random.PRNGKey(0), cfg)
                return res.scale + res.translation.sum()
            return loss

        cfg_detached = CFG
        g0 = jax.grad(make_loss(cfg_detached))(patch)
        assert float(jnp.abs(g0).max()) == 0.0  # reference parity: detached

        cfg_diff = CFG.replace(pose=dataclasses.replace(
            CFG.pose, differentiable=True))
        g1 = jax.grad(make_loss(cfg_diff))(patch)
        assert np.isfinite(np.asarray(g1)).all()
        assert float(jnp.abs(g1).max()) > 0.0   # gradients reach the NOCS head
