"""Office (real-world TUM RGB-D) dataset + inference pipeline.

Mirrors `Detection/data/office_dataset.py:11-113` and the office inference
flow of `Detection/inference_office_dset.py:51-404`:

    <base>/<scene>/rgb/<img>.png
    <base>/<scene>/depth/<img>.png        (8-bit, first channel)
    <base>/<scene>/denseposes/<img>.png   (person mask; optional)
    <base>/<scene>/calibration.txt        ("fx fy cx cy" on line 1)

Images are resized to 320x240 (intrinsics halved accordingly).  There is no
ground truth: poses are estimated in camera space (run_pose_office — our
postprocess_frame with use_gt_gate=False and an identity campose), graphs
are built without targets, and tracking uses either the MPN or the
heuristic L2 tracker.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class OfficeFrame(NamedTuple):
    rgb: np.ndarray            # (240, 320, 3) float32 RGB
    depth: np.ndarray          # (240, 320) float32
    person_mask: np.ndarray    # (240, 320) bool, True = person
    intrinsics: np.ndarray     # (3, 3) resized intrinsics
    scene: str
    name: str


class OfficeDataset:
    def __init__(self, base_dir: str, resize_hw=(240, 320),
                 mask_person: bool = False):
        self.base_dir = base_dir
        self.resize_hw = resize_hw
        self.mask_person = mask_person
        self.scenes = sorted(
            d for d in os.listdir(base_dir)
            if os.path.isdir(os.path.join(base_dir, d)))

    def frames(self, scene: str) -> List[str]:
        return sorted(os.listdir(os.path.join(self.base_dir, scene, "rgb")))

    def load_frame(self, scene: str, name: str) -> OfficeFrame:
        base = os.path.join(self.base_dir, scene)
        h, w = self.resize_hw
        rgb = cv2.imread(os.path.join(base, "rgb", name))[:, :, ::-1]
        orig_h, orig_w = rgb.shape[:2]
        rgb = cv2.resize(rgb.astype(np.float32), (w, h),
                         interpolation=cv2.INTER_LINEAR)
        depth = cv2.imread(os.path.join(base, "depth", name))[:, :, 0]
        depth = cv2.resize(depth.astype(np.float32), (w, h),
                           interpolation=cv2.INTER_LINEAR)
        dp_path = os.path.join(base, "denseposes", name)
        if os.path.exists(dp_path):
            person = cv2.imread(dp_path)[:, :, 0].astype(np.float32)
            person = cv2.resize(person, (w, h),
                                interpolation=cv2.INTER_NEAREST) > 0
        else:
            person = np.zeros((h, w), bool)
        if self.mask_person:
            rgb = rgb * (~person[:, :, None])

        with open(os.path.join(base, "calibration.txt")) as f:
            fx, fy, cx, cy = (float(v) for v in f.readline().split()[:4])
        sx, sy = w / orig_w, h / orig_h
        intr = np.array([[fx * sx, 0, cx * sx], [0, fy * sy, cy * sy],
                         [0, 0, 1]], np.float32)
        return OfficeFrame(rgb, depth, person, intr, scene, name)


def office_inference(cfg, det_model, det_params, dataset: OfficeDataset,
                     scene: str, max_frames: Optional[int] = None,
                     dist_thres: float = 0.25, tracker: str = "heuristic"):
    """Detector -> camera-space pose (no GT gates) -> tracking.

    The office variant of the combined pipeline
    (`Detection/inference_office_dset.py`, postprocess_dets_office +
    run_pose_office): identity campose keeps poses in camera space.

    tracker:
      - "heuristic": greedy L2 matching on pose-estimated locations
        (`tracking_front.py:64-94` pred_trajectory_office);
      - "f2f": the Mask-R-CNN-only F2F baseline — association on segment
        point-cloud centres, no pose input
        (`postprocess_dets_office_F2F`, `postprocess.py:354-411`).
    """
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from mot3d_tpu.models.mask_rcnn import MaskRCNN
    from mot3d_tpu.pose.pipeline import paste_patch, postprocess_frame
    from mot3d_tpu.tracking.f2f import F2FTracker, segment_centers
    from mot3d_tpu.tracking.heuristic import HeuristicTracker

    predict = jax.jit(lambda p, im: det_model.apply(
        p, im, method=MaskRCNN.predict))

    def pose(bx, sc, cl, va, ma, vo, no, de, intr, k):
        m = bx.shape[0]
        dummy_g2 = jnp.zeros((1, 4))
        dummy_gv = jnp.zeros((1,), bool)
        dummy_g3 = jnp.zeros((1, 8, 3))
        return postprocess_frame(bx, sc, cl, va, ma, vo, no, dummy_g2,
                                 dummy_gv, de, jnp.eye(4), intr, dummy_g3,
                                 k, cfg, use_gt_gate=False)

    pose_jit = jax.jit(pose)

    def f2f_centers(masks28, boxes, valid, depth, intr):
        h, w = depth.shape
        full = jax.vmap(lambda m, b: paste_patch(
            m[..., None], b, (h, w))[..., 0])(masks28, boxes)
        return segment_centers(full, boxes, valid, depth, intr)

    f2f_jit = jax.jit(f2f_centers)
    rng = jax.random.PRNGKey(0)
    per_frame = []
    names = dataset.frames(scene)[:max_frames]
    pad_h, pad_w = cfg.detection.pad_height, cfg.detection.pad_width
    for name in names:
        fr = dataset.load_frame(scene, name)
        img = np.zeros((pad_h, pad_w, 3), np.float32)
        img[:fr.rgb.shape[0], :fr.rgb.shape[1]] = fr.rgb
        dets = predict(det_params, jnp.asarray(img)[None])
        rng, sub = jax.random.split(rng)
        frame_dets = []
        if tracker == "f2f":
            centres, has_pts = f2f_jit(
                dets.masks[0], dets.boxes[0],
                jnp.logical_and(dets.valid[0],
                                dets.scores[0] > cfg.combined.objectness_office),
                jnp.asarray(fr.depth), jnp.asarray(fr.intrinsics))
            for i in np.nonzero(np.asarray(has_pts))[0]:
                frame_dets.append({
                    "loc": np.asarray(centres[i]),
                    "cls": int(np.asarray(dets.classes[0])[i]),
                    "box2d": np.asarray(dets.boxes[0][i]),
                })
        else:
            out = pose_jit(dets.boxes[0], dets.scores[0], dets.classes[0],
                           dets.valid[0], dets.masks[0], dets.voxels[0],
                           dets.nocs[0], jnp.asarray(fr.depth),
                           jnp.asarray(fr.intrinsics), sub)
            valid = np.asarray(out.valid)
            for i in np.nonzero(valid)[0]:
                euler = np.asarray(out.rotations[i])
                loc = np.asarray(out.translations[i])
                scale = float(out.scales[i])
                c2w = np.identity(4)
                c2w[:3, :3] = Rotation.from_euler("xyz",
                                                  euler).as_matrix() * scale
                c2w[:3, 3] = loc
                frame_dets.append({
                    "loc": loc,
                    "euler": euler,
                    "scale": scale,
                    "cad2world": c2w,
                    "cls": int(np.asarray(dets.classes[0])[i]),
                    "voxel": np.asarray(out.voxels[i]),
                    "box": np.asarray(out.pred_boxes[i]),
                })
        per_frame.append(frame_dets)
    trk = (F2FTracker(dist_thres=dist_thres, seq_len=len(names))
           if tracker == "f2f"
           else HeuristicTracker(dist_thres=dist_thres, seq_len=len(names)))
    return trk.track(per_frame), per_frame
