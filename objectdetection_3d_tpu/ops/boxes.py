"""9-parameter rotated box geometry, fully vectorized and jittable.

Box convention (identical to the reference):
``(x, y, z, dx, dy, dz, rx, ry, rz)`` where ``z`` is the **bottom** of the
box, rotation is ``Rz @ Ry @ Rx`` applied about the *bottom center*
``(x, y, z)`` (reference ops/ops_torch.py:160-256), and angles are radians.

All functions take jnp arrays and are safe under `jax.jit` / `vmap`.
"""

import jax
import jax.numpy as jnp
import numpy as np

# TPU matmuls default to bf16; geometry needs full f32 accumulation.
_HI = jax.lax.Precision.HIGHEST

# Corner layout (reference ops/ops_torch.py:163-195):
#   p0=(-,-,z) p1=(+,-,z) p2=(+,+,z) p3=(-,+,z)   bottom
#   p4..p7 same xy at z+dz                         top
# np (not jnp): module-level jnp constants would initialize the JAX backend
# at import time, which breaks hermetic CPU-only subprocesses (the driver's
# dryrun_multichip); jnp ops coerce np operands on use at no cost.
_CORNER_SIGNS = np.array(
    [
        [-1.0, -1.0, 0.0],
        [1.0, -1.0, 0.0],
        [1.0, 1.0, 0.0],
        [-1.0, 1.0, 0.0],
        [-1.0, -1.0, 1.0],
        [1.0, -1.0, 1.0],
        [1.0, 1.0, 1.0],
        [-1.0, 1.0, 1.0],
    ]
)

# Quad faces with OUTWARD winding (right-hand rule) for divergence-theorem
# volume; the reference stores the pytorch3d plane list instead
# (ops/ops_torch.py:270-276) — ours is reordered so every face normal points
# out of the box.
FACES_OUTWARD = np.array(
    [
        [0, 3, 2, 1],  # bottom  (-z)
        [4, 5, 6, 7],  # top     (+z)
        [0, 1, 5, 4],  # y-
        [2, 3, 7, 6],  # y+
        [0, 4, 7, 3],  # x-
        [1, 2, 6, 5],  # x+
    ]
)


def rotation_matrices(rx, ry, rz):
    """Rz @ Ry @ Rx rotation matrices for batched angles.

    Args:
        rx, ry, rz: arrays of shape (...,).
    Returns:
        (..., 3, 3) rotation matrices.
    """
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)

    rot_x = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    rot_y = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    rot_z = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    rot_zy = jnp.einsum("...ij,...jk->...ik", rot_z, rot_y, precision=_HI)
    return jnp.einsum("...ij,...jk->...ik", rot_zy, rot_x, precision=_HI)


def box_corners_3d(boxes):
    """9-param boxes -> 8 rotated corners.

    Matches reference ops/ops_torch.py:160-256 (``bbox2corners3D``): corners
    span z .. z+dz, rotation about the bottom center, applied as
    ``(corner - c) @ R^T + c``.

    Args:
        boxes: (..., 9)
    Returns:
        (..., 8, 3) corners.
    """
    center = boxes[..., :3]
    dims = boxes[..., 3:6]
    half = jnp.concatenate(
        [dims[..., :2] * 0.5, dims[..., 2:3]], axis=-1)
    # local corner offsets relative to bottom center
    local = _CORNER_SIGNS * half[..., None, :]
    rot = rotation_matrices(boxes[..., 6], boxes[..., 7], boxes[..., 8])
    rotated = jnp.einsum("...ck,...jk->...cj", local, rot, precision=_HI)
    return rotated + center[..., None, :]


def rotated_corners_2d_envelope(boxes):
    """Axis-aligned 2D envelope of the rotated corners.

    The reference's "rotated BEV IoU" is IoU of these envelopes
    (ops/ops_torch.py:13-114).

    Args:
        boxes: (..., 9)
    Returns:
        (..., 4) as (xmin, ymin, xmax, ymax).
    """
    corners = box_corners_3d(boxes)
    mn = jnp.min(corners[..., :2], axis=-2)
    mx = jnp.max(corners[..., :2], axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def corners_2d_envelope(boxes):
    """Unrotated 2D envelope, keeping rz (reference ops/ops_torch.py:117-157).

    Returns:
        (..., 5) as (xmin, ymin, xmax, ymax, rz).
    """
    x, y = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 3] * 0.5, boxes[..., 4] * 0.5
    return jnp.stack(
        [x - hx, y - hy, x + hx, y + hy, boxes[..., 8]], axis=-1)


def iou_aabb_2d(bboxes1, bboxes2, mode="iou", eps=1e-6):
    """Pairwise IoU / IoF / GIoU of axis-aligned 2D boxes.

    Matches reference ops/ops_torch.py:538-607 (``bbox_iou2D``).

    Args:
        bboxes1: (N, 4) as (x1, y1, x2, y2)
        bboxes2: (K, 4)
    Returns:
        (N, K)
    """
    assert mode in ("iou", "iof", "giou"), f"Unsupported mode {mode}"
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (
        bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (
        bboxes2[..., 3] - bboxes2[..., 1])

    lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
    rb = jnp.minimum(bboxes1[..., :, None, 2:4], bboxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    overlap = wh[..., 0] * wh[..., 1]

    if mode in ("iou", "giou"):
        union = area1[..., None] + area2[..., None, :] - overlap
    else:
        union = jnp.broadcast_to(area1[..., None], overlap.shape)

    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious

    enclosed_lt = jnp.minimum(bboxes1[..., :, None, :2],
                              bboxes2[..., None, :, :2])
    enclosed_rb = jnp.maximum(bboxes1[..., :, None, 2:4],
                              bboxes2[..., None, :, 2:4])
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0)
    enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return ious - (enclose_area - union) / enclose_area


def limit_period(val, offset=0.5, period=jnp.pi):
    """Wrap into ``[-offset*period, (1-offset)*period)``.

    Matches reference model/utils.py:339-350.
    """
    return val - jnp.floor(val / period + offset) * period


def box_axes(boxes):
    """Unit axes (columns of R) and mid-center of each box.

    Returns:
        axes: (..., 3, 3) where axes[..., :, i] is the i-th box axis.
        mid:  (..., 3) volumetric center (bottom center + az*dz/2).
    """
    rot = rotation_matrices(boxes[..., 6], boxes[..., 7], boxes[..., 8])
    mid = boxes[..., :3] + rot[..., :, 2] * boxes[..., 5:6] * 0.5
    return rot, mid


def points_in_boxes(points, boxes, eps=0.0):
    """Mask of points inside rotated boxes.

    Vectorized version of reference ops/ops_torch.py:314-350: a point p is
    inside box b iff ``|axis_i . (p - mid)| * 2 < dim_i`` for all three axes.

    Args:
        points: (P, >=3)
        boxes: (N, 9)
    Returns:
        (P, N) bool mask.
    """
    rot, mid = box_axes(boxes)
    d = points[:, None, :3] - mid[None, :, :]  # (P, N, 3)
    proj = jnp.einsum("pnk,nkj->pnj", d, rot, precision=_HI)  # (P, N, 3) axis coords
    return jnp.all(jnp.abs(proj) * 2 < boxes[None, :, 3:6] + eps, axis=-1)


def box_collision_test(boxes, qboxes):
    """BEV-envelope collision matrix (reference ops/ops_torch.py:400-414)."""
    a = rotated_corners_2d_envelope(boxes)
    b = rotated_corners_2d_envelope(qboxes)
    return iou_aabb_2d(a, b) > 0


def get_min_bbox(points):
    """PCA minimum vertical bounding box of a point set.

    Reference ops/ops_torch.py:422-464 (which still calls the removed
    ``torch.eig``); re-implemented with ``eigh`` on the 2x2 xy covariance.

    Args:
        points: (P, >=3)
    Returns:
        (7,) box (x, y, z_mid, w, l, h, yaw).
    """
    h_min = jnp.min(points[:, 2])
    h_max = jnp.max(points[:, 2])
    xy = points[:, :2]
    centered = xy - jnp.mean(xy, axis=0)
    cov = jnp.matmul(centered.T, centered, precision=_HI) / (xy.shape[0] - 1)
    _, vect = jnp.linalg.eigh(cov)
    tvect = vect.T
    pts_rot = jnp.matmul(xy, jnp.linalg.inv(tvect), precision=_HI)
    mn = jnp.min(pts_rot, axis=0)
    mx = jnp.max(pts_rot, axis=0)
    diff = mx - mn
    center = jnp.matmul(mn + diff * 0.5, tvect, precision=_HI)
    yaw = jnp.arctan2(tvect[0, 1], tvect[0, 0])
    return jnp.array(
        [center[0], center[1], (h_min + h_max) * 0.5,
         diff[0], diff[1], h_max - h_min, yaw])


def box_planes(boxes):
    """Half-space representation: 6 outward planes per box.

    inside(x) iff ``n_i . x <= d_i`` for all i.

    Args:
        boxes: (..., 9)
    Returns:
        normals: (..., 6, 3), offsets: (..., 6)
    """
    rot, mid = box_axes(boxes)
    axes = jnp.swapaxes(rot, -1, -2)  # (..., 3_axes, 3)
    half = boxes[..., 3:6] * 0.5
    normals = jnp.concatenate([axes, -axes], axis=-2)  # (..., 6, 3)
    centers_dot = jnp.einsum("...ik,...k->...i", normals, mid, precision=_HI)
    offsets = centers_dot + jnp.concatenate([half, half], axis=-1)
    return normals, offsets


# ---------------------------------------------------------------------------
# Host-side runtime validators (numpy, raising — NOT jit-safe)
# ---------------------------------------------------------------------------
# The reference raises on malformed corner sets before every exact-IoU call
# (ops/ops_torch.py:610-690, ``check_coplanar`` / ``check_nonzero``).  Inside
# jit our IoU is padding-safe by design (returns 0 for degenerate boxes), so
# these run only at the HOST boundary, on user-supplied data entering
# ``run_inference`` / ``MetricEvaluator`` with ``validate=True``.

# Quad faces in the reference's plane list (ops/ops_torch.py:617-625).
_VALIDATE_PLANES = np.array(
    [[0, 1, 2, 3], [3, 2, 6, 7], [0, 1, 5, 4],
     [0, 3, 7, 4], [1, 2, 6, 5], [4, 5, 6, 7]])

# Triangle faces (reference ops/ops_torch.py:658-671).
_VALIDATE_TRIANGLES = np.array(
    [[0, 1, 2], [0, 3, 2], [4, 5, 6], [4, 6, 7], [1, 5, 6], [1, 6, 2],
     [0, 4, 7], [0, 7, 3], [3, 2, 6], [3, 6, 7], [0, 1, 5], [0, 4, 5]])


def _unit(v, eps=1e-12):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), eps)


def check_coplanar(corners, eps=1e-4):
    """Raise ``ValueError`` when any box's quad faces are non-planar
    (reference ops/ops_torch.py:610-648 semantics and message shape).

    Args:
        corners: (B, 8, 3) numpy corner sets.
    """
    corners = np.asarray(corners, np.float64)
    v0, v1, v2, v3 = np.moveaxis(
        corners[:, _VALIDATE_PLANES], 2, 0)  # each (B, 6, 3)
    normal = _unit(np.cross(_unit(v1 - v0), _unit(v2 - v0)))
    dev = np.einsum("bpk,bpk->bp", v3 - v0, normal)
    # NaN corners compare False -> flagged, like the reference's tag
    coplanar = np.all(np.abs(dev) < eps, axis=1)
    if not coplanar.all():
        raise ValueError(
            "Plane vertices are not coplanar. This applies for bboxes in "
            "positions: {}".format(np.flatnonzero(~coplanar)))


def check_nonzero(corners, eps=1e-4):
    """Raise ``ValueError`` when any box has a (near-)zero-area face
    (reference ops/ops_torch.py:651-690 semantics and message shape).

    Args:
        corners: (B, 8, 3) numpy corner sets.
    """
    corners = np.asarray(corners, np.float64)
    v0, v1, v2 = np.moveaxis(corners[:, _VALIDATE_TRIANGLES], 2, 0)
    areas = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1) / 2
    nonzero = ~np.any(~(areas >= eps), axis=1)  # NaN areas -> flagged
    if not nonzero.all():
        raise ValueError(
            "Planes have zero areas. This applies for bboxes in "
            "positions: {}".format(np.flatnonzero(~nonzero)))


def validate_boxes(boxes, eps=1e-4):
    """Validate host-side 9-param boxes like the reference validates its
    corner sets before every IoU call: coplanar faces + nonzero areas.

    Args:
        boxes: (B, 9) numpy array (any input convertible to it).
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 9)
    if boxes.size == 0:
        return
    if not np.isfinite(boxes).all():
        raise ValueError(
            "Boxes contain non-finite values. This applies for bboxes in "
            "positions: {}".format(
                np.flatnonzero(~np.isfinite(boxes).all(axis=1))))
    from objectdetection_3d_tpu.augment.numpy_ops import bbox2corners3D_np

    corners = np.stack([bbox2corners3D_np(b) for b in boxes])
    check_coplanar(corners, eps)
    check_nonzero(corners, eps)
