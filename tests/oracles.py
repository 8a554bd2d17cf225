"""Independent numpy oracles used to validate the jitted device kernels.

These are small, slow, obviously-correct implementations of the reference
semantics (cited per function), written from the behavioral spec — they are
the ground truth the fast static-shape JAX ops are tested against.
"""

import numpy as np


def rot_zyx(rx, ry, rz):
    """Rz @ Ry @ Rx (reference ops/ops_torch.py:202-253)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    rot_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    rot_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rot_z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rot_z @ rot_y @ rot_x


def box_corners_np(box):
    """One 9-param box -> 8 corners; z at bottom, pivot = bottom center."""
    x, y, z, dx, dy, dz, rx, ry, rz = box
    signs = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], dtype=np.float64)
    local = signs * np.array([dx / 2, dy / 2, dz])
    rot = rot_zyx(rx, ry, rz)
    return local @ rot.T + np.array([x, y, z])


def point_in_box_np(p, box):
    """Membership test via projection onto box axes."""
    x, y, z, dx, dy, dz, rx, ry, rz = box
    rot = rot_zyx(rx, ry, rz)
    mid = np.array([x, y, z]) + rot[:, 2] * dz / 2
    proj = (p - mid) @ rot
    return np.all(np.abs(proj) * 2 <= np.array([dx, dy, dz]))


def monte_carlo_iou3d(box1, box2, n=200_000, seed=0):
    """Sampled IoU of two rotated boxes (oracle for the clipping kernel)."""
    rng = np.random.default_rng(seed)
    c = np.concatenate([box_corners_np(box1), box_corners_np(box2)], 0)
    lo, hi = c.min(0), c.max(0)
    pts = rng.uniform(lo, hi, size=(n, 3))
    in1 = np.array([point_in_box_np(p, box1) for p in pts])
    in2 = np.array([point_in_box_np(p, box2) for p in pts])
    inter = np.sum(in1 & in2)
    union = np.sum(in1 | in2)
    if union == 0:
        return 0.0
    return inter / union


def voxelize_np(points, voxel_size, pc_range, max_points, max_voxels,
                reflectance_sampling):
    """First-come / reflectance-priority voxel binning.

    Behavioral port of reference ops/ops_numba.py:171-308: iterate points
    (reflectance-descending when sampling), assign first-come voxel ids, cap
    points per voxel, cap voxel count.
    Returns (dict coord->list-of-points, ordered coords list).
    """
    pc_range = np.asarray(pc_range, np.float64)
    voxel_size = np.asarray(voxel_size, np.float64)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(int)

    if reflectance_sampling:
        order = np.argsort(-points[:, 3], kind="stable")
        points = points[order]

    voxels = {}
    coords_in_order = []
    for p in points:
        c = np.floor((p[:3] - pc_range[:3]) / voxel_size).astype(int)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = tuple(c)
        if key not in voxels:
            if len(voxels) >= max_voxels:
                break
            voxels[key] = []
            coords_in_order.append(key)
        if len(voxels[key]) < max_points:
            voxels[key].append(p.copy())
    return voxels, coords_in_order


def greedy_nms_np(boxes_iou, scores, score_thr, iou_thr):
    """Greedy NMS keep set (reference model/utils.py:376-424 semantics).

    Args:
        boxes_iou: (N, N) IoU matrix.
        scores: (N,) class scores.
    Returns:
        sorted list of kept original indices.
    """
    valid = np.where(scores > score_thr)[0]
    if len(valid) == 0:
        return []
    order = valid[np.argsort(-scores[valid], kind="stable")]
    suppressed = set()
    keep = []
    for i, oi in enumerate(order):
        if oi in suppressed:
            continue
        keep.append(oi)
        for oj in order[i + 1:]:
            if boxes_iou[oi, oj] > iou_thr:
                suppressed.add(oj)
    return sorted(keep)
