"""Per-object 7-DoF pose estimation pipeline (reference PoseEst/ equivalent)."""

from mot3d_tpu.pose.pipeline import (
    PoseResult,
    estimate_object_pose,
    crop_gt_box3d,
    postprocess_frame,
)
