"""F2F (frame-to-frame Mask R-CNN) baseline tests.

Covers the reference's F2F comparison baseline:
`postprocess_dets_office_F2F`/`project_segmask_F2F` (segment point clouds),
pred_trajectory-style greedy assembly, `calculate_F2F_metrics`, and the
fuse_pose_F2F smoothing variant (`Tracking/utils/vis_utils.py:201-318`).
"""

import jax.numpy as jnp
import numpy as np

from mot3d_tpu.tracking.f2f import F2FTracker, eval_f2f, segment_centers
from mot3d_tpu.tracking.smoothing import fuse_pose_f2f


class TestSegmentCenters:
    def _setup(self):
        h, w = 32, 32
        depth = np.full((h, w), 2.0, np.float32)
        intr = np.array([[32.0, 0, 15.5], [0, 32.0, 15.5], [0, 0, 1]],
                        np.float32)
        masks = np.zeros((2, h, w), np.float32)
        masks[0, 4:10, 4:10] = 1.0
        masks[1, 20:28, 18:26] = 1.0
        boxes = np.array([[4, 4, 10, 10], [18, 20, 26, 28]], np.float32)
        valid = np.array([True, True])
        return masks, boxes, valid, depth, intr

    def test_matches_manual_backprojection(self):
        masks, boxes, valid, depth, intr = self._setup()
        centres, has = segment_centers(
            jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(valid),
            jnp.asarray(depth), jnp.asarray(intr))
        assert bool(has[0]) and bool(has[1])
        # Manual: reference backproject convention (y, z negated).
        vs, us = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        m = masks[0] > 0.5
        z = depth[m]
        x = (us[m] - 15.5) / 32.0 * z
        y = (vs[m] - 15.5) / 32.0 * z
        manual = np.stack([x, -y, -z], -1).mean(0)
        np.testing.assert_allclose(np.asarray(centres[0]), manual, atol=1e-5)

    def test_box_gating_and_world_transform(self):
        masks, boxes, valid, depth, intr = self._setup()
        # Mask spilling outside its box must be cut by the box zero-pad
        # (`inference_utils.py:74-78`).
        masks[0][:] = 1.0
        campose = np.eye(4, dtype=np.float32)
        campose[:3, 3] = [1.0, 2.0, 3.0]
        c_box, _ = segment_centers(
            jnp.asarray(masks[:1]), jnp.asarray(boxes[:1]),
            jnp.asarray(valid[:1]), jnp.asarray(depth), jnp.asarray(intr))
        c_world, _ = segment_centers(
            jnp.asarray(masks[:1]), jnp.asarray(boxes[:1]),
            jnp.asarray(valid[:1]), jnp.asarray(depth), jnp.asarray(intr),
            campose=jnp.asarray(campose))
        # Full-image mask but identical centre to the box-restricted one.
        masks2 = np.zeros_like(masks[:1])
        masks2[0, 4:10, 4:10] = 1.0
        c_ref, _ = segment_centers(
            jnp.asarray(masks2), jnp.asarray(boxes[:1]),
            jnp.asarray(valid[:1]), jnp.asarray(depth), jnp.asarray(intr))
        np.testing.assert_allclose(np.asarray(c_box), np.asarray(c_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_world),
                                   np.asarray(c_box) + campose[:3, 3],
                                   atol=1e-5)

    def test_invalid_detection_has_no_points(self):
        masks, boxes, valid, depth, intr = self._setup()
        _, has = segment_centers(
            jnp.asarray(masks), jnp.asarray(boxes),
            jnp.asarray([True, False]), jnp.asarray(depth),
            jnp.asarray(intr))
        assert bool(has[0]) and not bool(has[1])


class TestF2FTrackerAndMetrics:
    def _seq(self, n_frames=5):
        per_frame, gt = [], [[], []]
        for t in range(n_frames):
            a = np.array([0.1 * t, 0.0, 1.0])
            b = np.array([2.0, 0.1 * t, 1.0])
            per_frame.append([{"loc": a, "cls": 1}, {"loc": b, "cls": 2}])
            gt[0].append({"loc": a, "scan_idx": t, "obj_idx": 100})
            gt[1].append({"loc": b, "scan_idx": t, "obj_idx": 101})
        return per_frame, gt

    def test_perfect_tracking_mota_1(self):
        per_frame, gt = self._seq()
        trajs = F2FTracker(dist_thres=0.25, seq_len=5).track(per_frame)
        assert len(trajs) == 2
        m = eval_f2f(trajs, gt, seq_len=5)
        assert m["mota"] == 1.0
        assert m["f1"] == 1.0 and m["precision"] == 1.0 and m["recall"] == 1.0

    def test_missed_frames_lower_mota(self):
        per_frame, gt = self._seq()
        per_frame[2] = []  # both objects missed at t=2
        trajs = F2FTracker(dist_thres=0.25, seq_len=5).track(per_frame)
        m = eval_f2f(trajs, gt, seq_len=5)
        assert m["mota"] < 1.0
        assert m["num_misses"] == 2


class TestFusePoseF2F:
    def _traj(self):
        traj = []
        for t in (0, 1, 3, 4):  # gap at t=2
            c2w = np.identity(4)
            yaw = 0.3 + 0.01 * t
            c, s = np.cos(yaw), np.sin(yaw)
            c2w[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) * 2.0
            c2w[:3, 3] = [0.1 * t, 0.0, 1.0]
            traj.append({"scan_idx": t, "cad2world": c2w, "obj_idx": 7})
        return traj

    def test_densifies_and_fills_forward(self):
        out = fuse_pose_f2f(self._traj(), sigma=1.0, constraint=True)
        assert [d["scan_idx"] for d in out] == [0, 1, 2, 3, 4]
        assert all(d["obj_idx"] == 7 for d in out)
        for d in out:
            c2w = d["cad2world"]
            # scale preserved through unscale/rescale
            np.testing.assert_allclose(np.linalg.norm(c2w[:3, :3], axis=0),
                                       2.0, rtol=1e-5)
            # constraint: rotation is a pure z (yaw) rotation
            r = c2w[:3, :3] / 2.0
            np.testing.assert_allclose(r[2, :2], 0.0, atol=1e-6)
            np.testing.assert_allclose(r[:2, 2], 0.0, atol=1e-6)

    def test_short_trajectory_passthrough(self):
        t = self._traj()[:1]
        assert fuse_pose_f2f(t) == t

    def test_negative_yaw_not_collapsed(self):
        """The reference's clip bounds invert for negative initial yaw
        (vis_utils.py:295) and collapse the series; ours must keep a
        +/-20%*|yaw| band."""
        traj = []
        for t in range(4):
            yaw = -1.0 + 0.02 * t
            c, s = np.cos(yaw), np.sin(yaw)
            c2w = np.identity(4)
            c2w[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            c2w[:3, 3] = [0.1 * t, 0, 0]
            traj.append({"scan_idx": t, "cad2world": c2w})
        out = fuse_pose_f2f(traj, sigma=1.0, constraint=True)
        yaws = np.array([d["euler"][2] for d in out])
        assert (np.abs(yaws + 1.0) < 0.25).all()  # near the initial yaw
        assert len(np.unique(np.round(yaws, 6))) > 1  # not a constant

    def test_duplicate_frame_entries_do_not_crash(self):
        traj = self._traj()
        traj.append(dict(traj[1]))  # second detection at the same frame
        out = fuse_pose_f2f(traj, sigma=1.0)
        assert [d["scan_idx"] for d in out] == [0, 1, 2, 3, 4]

    def test_loc_euler_synced_with_matrix(self):
        out = fuse_pose_f2f(self._traj(), sigma=1.0)
        for d in out:
            np.testing.assert_allclose(d["loc"], d["cad2world"][:3, 3])
            r = d["cad2world"][:3, :3] / 2.0  # uniform scale 2
            from scipy.spatial.transform import Rotation
            np.testing.assert_allclose(
                Rotation.from_matrix(r).as_euler("xyz"), d["euler"],
                atol=1e-8)
