"""Office (no-GT) inference path: detector -> camera-space pose -> heuristic
tracking, end to end on a synthetic office fixture (tiny detector)."""

import os

import numpy as np
import pytest

from mot3d_tpu.config import (CameraConfig, Config, DetectionConfig,
                              PoseConfig)


@pytest.fixture(scope="module")
def office_root(tmp_path_factory):
    import cv2
    base = tmp_path_factory.mktemp("office")
    scene = base / "seq01"
    for sub in ("rgb", "depth"):
        os.makedirs(scene / sub)
    rng = np.random.default_rng(0)
    for t in range(2):
        rgb = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        depth = np.full((128, 128, 3), 40 + t, np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"{t:04d}.png"), rgb)
        cv2.imwrite(str(scene / "depth" / f"{t:04d}.png"), depth)
    with open(scene / "calibration.txt", "w") as f:
        f.write("128.0 128.0 63.5 63.5\n")
    return str(base)


def test_office_inference_runs(office_root):
    import jax
    from mot3d_tpu.data.office import OfficeDataset, office_inference
    from mot3d_tpu.models.mask_rcnn import MaskRCNN

    det = DetectionConfig(
        pad_height=64, pad_width=64, image_height=64, image_width=64,
        rpn_pre_nms_topk_test=64, rpn_post_nms_topk_test=16,
        detections_per_image=4, max_instances=3,
        anchor_sizes=(16, 32, 64, 128, 256), backbone_width=0.25,
        fpn_channels=64, mask_head_width=32, box_head_width=128,
        head_width_mult=0.125, fg_head_buffer=8)
    cam = CameraConfig(height=64, width=64, fx=64.0, fy=64.0)
    pose = PoseConfig(max_points=128, ransac_iters=16, outlier_min_points=16)
    cfg = Config().replace(detection=det, camera=cam, pose=pose)

    ds = OfficeDataset(office_root, resize_hw=(64, 64))
    model = MaskRCNN(cfg.detection)
    import jax.numpy as jnp
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), method=MaskRCNN.predict))(
            jax.random.PRNGKey(0))

    trajs, per_frame = office_inference(cfg, model, params, ds, "seq01")
    assert len(per_frame) == 2
    # Untrained detector: no crash, trajectories well-formed if any.
    for traj in trajs:
        assert all("loc" in d and "scan_idx" in d for d in traj)
