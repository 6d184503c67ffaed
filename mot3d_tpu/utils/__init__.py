"""Shared host-side utilities (point clouds, boxes, timing)."""

from mot3d_tpu.utils.pointcloud import (
    convert_voxel_to_pc,
    get_scale,
    construct_box_minmax,
    project_segmask_world,
    backproject_rgb,
    rgb_image_to_world_pc,
)
from mot3d_tpu.utils.timing import sec_to_hm_str
