"""Smoothing, heuristic tracker, pointcloud utils, office dataset reading."""

import os

import numpy as np
import pytest

from mot3d_tpu.tracking.smoothing import fuse_pose
from mot3d_tpu.tracking.heuristic import HeuristicTracker
from mot3d_tpu.utils import (convert_voxel_to_pc, get_scale,
                             construct_box_minmax, project_segmask_world,
                             rgb_image_to_world_pc, sec_to_hm_str)


class TestFusePose:
    def test_interpolates_gaps_and_smooths(self):
        traj = [
            {"scan_idx": 0, "loc": np.array([0.0, 0, 0]),
             "euler": np.array([0.0, 0.0, 0.0])},
            {"scan_idx": 2, "loc": np.array([2.0, 0, 0]),
             "euler": np.array([0.0, 0.4, 0.0])},
            {"scan_idx": 4, "loc": np.array([4.0, 0, 0]),
             "euler": np.array([0.0, 0.8, 0.0])},
        ]
        fused = fuse_pose(traj, sigma_translation=0.5)
        assert [d["scan_idx"] for d in fused] == [0, 1, 2, 3, 4]
        # interpolated frame 1 sits between its neighbours
        assert 0.0 < fused[1]["loc"][0] < 2.0
        assert 0.0 < fused[1]["euler"][1] < 0.4

    def test_single_detection_passthrough(self):
        traj = [{"scan_idx": 3, "loc": np.zeros(3)}]
        assert fuse_pose(traj) == traj


class TestHeuristicTracker:
    def test_tracks_two_objects(self):
        frames = []
        for t in range(5):
            frames.append([
                {"loc": np.array([0.05 * t, 0.0, 0.0])},
                {"loc": np.array([5.0, 5.0 + 0.05 * t, 0.0])},
            ])
        trajs = HeuristicTracker(dist_thres=0.5).track(frames)
        assert len(trajs) == 2
        assert all(len(t) == 5 for t in trajs)

    def test_new_track_on_jump(self):
        frames = [[{"loc": np.zeros(3)}], [{"loc": np.array([9.0, 0, 0])}]]
        trajs = HeuristicTracker(dist_thres=0.5).track(frames)
        assert len(trajs) == 2

    def test_duplicate_guard(self):
        frames = [[{"loc": np.zeros(3)}, {"loc": np.array([0.05, 0, 0])}]]
        trajs = HeuristicTracker(dist_thres=0.5, similar_thres=0.2).track(frames)
        assert len(trajs) == 1  # second det suppressed as duplicate


class TestPointcloudUtils:
    def test_voxel_to_pc(self):
        g = np.zeros((32, 32, 32))
        g[16, 16, 16] = 1
        pc = convert_voxel_to_pc(g, np.eye(3), np.array([1.0, 2, 3]), 2.0)
        np.testing.assert_allclose(pc[0], [1, 2, 3], atol=0.05)

    def test_get_scale(self):
        r = np.eye(3) * 1.7
        np.testing.assert_allclose(get_scale(r), [1.7] * 3)

    def test_box_minmax(self):
        p = np.array([[0, 0, 0], [1, 2, 3.0]])
        np.testing.assert_allclose(construct_box_minmax(p),
                                   [0, 0, 0, 1, 2, 3])

    def test_world_pc(self):
        depth = np.zeros((8, 8), np.float32)
        depth[4, 4] = 2.0
        rgb = np.zeros((8, 8, 3), np.float32)
        K = np.array([[4.0, 0, 3.5], [0, 4.0, 3.5], [0, 0, 1]])
        campose = np.eye(4)
        pc = rgb_image_to_world_pc(rgb, depth, campose, K)
        assert pc.shape == (1, 6)
        np.testing.assert_allclose(pc[0, 2], -2.0, atol=1e-6)
        mask = depth > 0
        pts = project_segmask_world(mask, depth, campose, K)
        np.testing.assert_allclose(pts[0], pc[0, :3], atol=1e-6)

    def test_sec_to_hm(self):
        assert sec_to_hm_str(10239) == "02h50m39s"


class TestOfficeDataset:
    def test_reading(self, tmp_path):
        import cv2
        base = tmp_path / "office"
        scene = base / "seq01"
        for sub in ("rgb", "depth"):
            os.makedirs(scene / sub)
        rgb = np.random.default_rng(0).integers(
            0, 255, (480, 640, 3)).astype(np.uint8)
        depth = np.full((480, 640, 3), 50, np.uint8)
        cv2.imwrite(str(scene / "rgb" / "0001.png"), rgb)
        cv2.imwrite(str(scene / "depth" / "0001.png"), depth)
        with open(scene / "calibration.txt", "w") as f:
            f.write("525.0 525.0 319.5 239.5\n")

        from mot3d_tpu.data.office import OfficeDataset
        ds = OfficeDataset(str(base))
        assert ds.scenes == ["seq01"]
        fr = ds.load_frame("seq01", "0001.png")
        assert fr.rgb.shape == (240, 320, 3)
        assert fr.depth.shape == (240, 320)
        np.testing.assert_allclose(fr.intrinsics[0, 0], 525.0 * 0.5)
        assert not fr.person_mask.any()
