"""F2F (frame-to-frame Mask R-CNN) baseline.

The paper's non-learned comparison baseline, shipped by the reference as:

  - `postprocess_dets_office_F2F` (`Detection/tracker/postprocess.py:
    354-411`): per detection above objectness threshold, zero-pad the depth
    map outside the predicted box and backproject the predicted binary mask
    into a segment point cloud (`project_segmask_F2F`,
    `Detection/inference/inference_utils.py:67-83`) — no NOCS, no pose fit.
  - trajectory assembly by greedy centre matching
    (`Tracking/tracker/tracking_front.py:24-62` pred_trajectory /
    `:640-742` analyse_trajectories_F2F).
  - `calculate_F2F_metrics` (`Detection/inference/inference_utils.py:
    224-252`): MOTA = 1 - (misses + FPs + switches) / gt_objects, plus
    F1/precision/recall.

TPU-native form: the segment point clouds come from one batched
`backproject_depth` + masked mean (one jit program for all detections of a
frame); trajectory assembly and metrics are host-side like every other
tracker variant.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mot3d_tpu.geometry.backproject import backproject_depth
from mot3d_tpu.tracking.heuristic import HeuristicTracker
from mot3d_tpu.tracking.mot_metrics import (MOTAccumulator,
                                            norm2squared_matrix)


def segment_centers(masks: jax.Array, boxes: jax.Array, valid: jax.Array,
                    depth: jax.Array, intrinsics: jax.Array,
                    campose: Optional[jax.Array] = None):
    """Per-detection segment point-cloud centres.

    masks (D, H, W) in [0,1]; boxes (D, 4) XYXY; depth (H, W).  The depth
    map is zeroed outside each detection's box (the reference's zero-pad,
    `inference_utils.py:74-78`), masked by the predicted binary mask, and
    backprojected; the centre is the mean of the valid points (camera
    space, or world space when a campose is given).  Returns
    (centres (D, 3), has_points (D,)).
    """
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def per_det(mask, box, ok):
        in_box = ((uu >= box[0]) & (uu < box[2])
                  & (vv >= box[1]) & (vv < box[3]))
        m = (mask >= 0.5) & in_box & ok
        pts, pvalid = backproject_depth(depth, intrinsics, m)
        if campose is not None:
            pts = pts @ campose[:3, :3].T + campose[:3, 3]
        wsum = pvalid.sum()
        centre = jnp.where(wsum > 0,
                           (pts * pvalid[..., None]).sum((0, 1))
                           / jnp.maximum(wsum, 1),
                           jnp.zeros(3))
        return centre, wsum > 0

    return jax.vmap(per_det)(masks, boxes, valid)


class F2FTracker:
    """Greedy frame-to-frame centre matching (pred_trajectory semantics,
    `tracking_front.py:24-62`), reusing the heuristic matcher."""

    def __init__(self, dist_thres: float = 0.25, seq_len: int = 25):
        self._heur = HeuristicTracker(dist_thres=dist_thres, seq_len=seq_len)

    def track(self, per_frame_dets: List[List[dict]]) -> List[List[dict]]:
        """per_frame_dets[t] = [{"loc": centre, "cls": c, ...}, ...]."""
        return self._heur.track(per_frame_dets)


def eval_f2f(pred_trajectories: List[List[dict]],
             gt_trajectories: List[List[dict]], seq_len: int,
             dist_gate: float = 0.4) -> Dict[str, float]:
    """F2F metric block (`calculate_F2F_metrics` equivalents): MOTA via the
    accumulator (misses + FPs + switches over GT objects) plus
    F1/precision/recall derived from the same counts."""
    acc = MOTAccumulator()
    for t in range(seq_len):
        gt_ids, gt_pos = [], []
        for ti, traj in enumerate(gt_trajectories):
            for d in traj:
                if d["scan_idx"] == t:
                    gt_ids.append(d.get("obj_idx", ti))
                    gt_pos.append(np.asarray(d["loc"], np.float64))
        hyp_ids, hyp_pos = [], []
        for ti, traj in enumerate(pred_trajectories):
            for d in traj:
                if d["scan_idx"] == t:
                    hyp_ids.append(d.get("obj_idx", ti))
                    hyp_pos.append(np.asarray(d["loc"], np.float64))
        dists = norm2squared_matrix(
            np.asarray(gt_pos, np.float64).reshape(len(gt_ids), 3),
            np.asarray(hyp_pos, np.float64).reshape(len(hyp_ids), 3),
            max_d2=dist_gate)
        acc.update(gt_ids, hyp_ids, dists)
    s = acc.summary()
    p, r = s.get("precision", 0.0), s.get("recall", 0.0)
    s["f1"] = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return s
