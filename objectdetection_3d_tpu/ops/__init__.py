"""Compute kernels: box geometry, IoU, voxelization, NMS (all jittable)."""

from objectdetection_3d_tpu.ops.boxes import (  # noqa: F401
    rotation_matrices,
    box_corners_3d,
    rotated_corners_2d_envelope,
    corners_2d_envelope,
    iou_aabb_2d,
    limit_period,
    points_in_boxes,
    box_collision_test,
    get_min_bbox,
)
from objectdetection_3d_tpu.ops.iou3d import iou3d, iou3d_aligned  # noqa: F401
from objectdetection_3d_tpu.ops.voxelize import (  # noqa: F401
    Voxelizer,
    voxelize,
)
from objectdetection_3d_tpu.ops.nms import multiclass_nms  # noqa: F401
