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
        assert all("cad2world" in d for d in traj)

    # F2F baseline variant (postprocess_dets_office_F2F): association on
    # segment point-cloud centres, no pose estimation.
    trajs_f2f, per_frame_f2f = office_inference(
        cfg, model, params, ds, "seq01", tracker="f2f")
    assert len(per_frame_f2f) == 2
    for traj in trajs_f2f:
        assert all("loc" in d and "scan_idx" in d for d in traj)
        assert all("euler" not in d for d in traj)  # no pose fit in F2F


_TINY_OVERRIDES = [
    "detection.pad_height=64", "detection.pad_width=64",
    "detection.image_height=64", "detection.image_width=64",
    "detection.rpn_pre_nms_topk_test=64",
    "detection.rpn_post_nms_topk_test=16",
    "detection.detections_per_image=4", "detection.max_instances=3",
    "detection.anchor_sizes=16,32,64,128,256",
    "detection.backbone_width=0.25", "detection.fpn_channels=64",
    "detection.mask_head_width=32", "detection.box_head_width=128",
    "detection.head_width_mult=0.125", "detection.fg_head_buffer=8",
    "camera.height=64", "camera.width=64", "camera.fx=64.0", "camera.fy=64.0",
    "pose.max_points=128", "pose.ransac_iters=16",
    "pose.outlier_min_points=16",
]


def test_infer_office_cli(office_root, tmp_path):
    """The infer-office subcommand (reference's first-class entry point
    `Detection/inference_office_dset.py:51-404`): runs end to end and
    writes trajectory JSON + visual exports."""
    import json
    from mot3d_tpu import cli
    out = str(tmp_path / "office_out")
    cli.main(["infer-office", "--data", office_root, "--scene", "seq01",
              "--tracker", "f2f", "--fuse", "--out", out]
             + _TINY_OVERRIDES)
    sdir = os.path.join(out, "seq01")
    with open(os.path.join(sdir, "trajectories.json")) as f:
        trajs = json.load(f)
    for t in trajs:
        assert all(set(d) >= {"scan_idx", "loc", "cls"} for d in t)
