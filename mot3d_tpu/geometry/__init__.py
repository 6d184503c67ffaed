"""Pure-JAX geometry core: the reference's `PoseEst/` + geometry utilities,
re-designed as masked, batched, differentiable ops (static shapes only)."""

from mot3d_tpu.geometry.transforms import (
    euler_to_rotmat,
    rotmat_to_euler,
    quaternion_from_euler,
    cam_to_world,
    transform_points,
    cad2world_matrix,
    aabb_corners,
    sort_bbox,
    box_corners_to_minmax,
)
from mot3d_tpu.geometry.backproject import backproject_depth, make_intrinsics
from mot3d_tpu.geometry.umeyama import (
    umeyama_similarity,
    ransac_umeyama,
    estimate_similarity_transform,
)
from mot3d_tpu.geometry.outlier import statistical_outlier_mask
from mot3d_tpu.geometry.iou3d import (
    box3d_iou,
    box3d_iou_matrix,
    box2d_iou,
    box2d_iou_matrix,
    voxel_iou,
    polygon_clip_area,
)
from mot3d_tpu.geometry.metrics import rotation_error_deg, location_error
