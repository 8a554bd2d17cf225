"""Ground-truth sampling and point-labeling support ops.

JAX/numpy equivalents of reference ops/ops_torch.py:261-533: box faces and
surface normals, semantic point labeling inside boxes, points-in-box
removal, and collision-filtered GT database sampling (the support machinery
for the ``ObjectSample`` augmentation named in the reference augmentor,
augment/augmentation.py:142-151).
"""

import copy
import random

import jax.numpy as jnp
import numpy as np

from objectdetection_3d_tpu.ops.boxes import (
    FACES_OUTWARD,
    box_collision_test,
    box_corners_3d,
    points_in_boxes,
)


def corner2faces3d(corners):
    """(N, 8, 3) corners -> (N, 6, 4, 3) quad faces
    (reference ops/ops_torch.py:261-281)."""
    return corners[:, FACES_OUTWARD]


def surface_normals(corners):
    """Normal vectors + plane offsets for box faces
    (reference ops/ops_torch.py:503-520)."""
    faces = corner2faces3d(corners)
    surf_vec = faces[:, :, :2, :] - faces[:, :, 1:3, :]
    normal_vec = jnp.cross(surf_vec[:, :, 0, :], surf_vec[:, :, 1, :])
    direction = jnp.einsum("aij,aij->ai", normal_vec, faces[:, :, 0, :])
    return normal_vec, -direction


def get_semantic_label(points, boxes, ground_level, effective_trunk):
    """Label points as trunk (1) / ground (0) / noise (-1) relative to boxes
    (reference ops/ops_torch.py:353-385).

    A point inside a box is a trunk point unless it lies below
    ``box_bottom + ground_level`` (ground) or above
    ``box_bottom + effective_trunk * dz`` (noise).
    """
    points = jnp.asarray(points)
    boxes = jnp.asarray(boxes)
    inside = points_in_boxes(points, boxes)          # (P, N)
    z = points[:, 2:3]                               # (P, 1)
    bottom = boxes[None, :, 2]
    dz = boxes[None, :, 5]
    ground = z < bottom + ground_level
    noisy = z > bottom + effective_trunk * dz

    trunk = inside & ~ground & ~noisy
    noise = inside & noisy
    label = jnp.zeros((points.shape[0],), jnp.int32)
    label = jnp.where(jnp.any(trunk, axis=1), 1, label)
    label = jnp.where(jnp.any(noise, axis=1), -1, label)
    return label


def remove_points_in_boxes(points, boxes):
    """Drop points falling inside any box
    (reference ops/ops_torch.py:387-398)."""
    mask = np.asarray(points_in_boxes(jnp.asarray(points),
                                      jnp.asarray(boxes)))
    return np.asarray(points)[~mask.any(axis=1)]


def random_sample(files, num, rng=None):
    """Sample up to ``num`` entries (reference ops/ops_torch.py:466-470).

    ``rng`` (numpy Generator) makes the draw reproducible per item — the
    parallel loader's per-item RNG threads through here; ``None`` keeps
    the reference's global-``random`` behavior.
    """
    if len(files) <= num:
        return files
    if rng is not None:
        idx = rng.choice(len(files), size=num, replace=False)
        return [files[i] for i in idx]
    return random.sample(files, num)


def sample_class(num, gt_boxes, db_boxes, rng=None):
    """Collision-filtered sampling of database objects into a scene
    (reference ops/ops_torch.py:472-501): sampled boxes colliding (BEV
    envelope overlap) with ground truth or other samples are rejected."""
    if num == 0:
        return []
    sampled = copy.deepcopy(random_sample(db_boxes, num, rng=rng))

    num_gt = len(gt_boxes)
    boxes = [np.asarray(b, np.float32) for b in gt_boxes]
    boxes += [np.asarray(s["bbox"], np.float32) for s in sampled]
    bboxes = jnp.asarray(np.stack(boxes)) if boxes else jnp.zeros((0, 9))

    coll = np.array(box_collision_test(bboxes, bboxes))
    np.fill_diagonal(coll, False)

    valid_samples = []
    for i in range(num_gt, num_gt + len(sampled)):
        if coll[i].any():
            coll[i] = False
            coll[:, i] = False
        else:
            valid_samples.append(sampled[i - num_gt])
    return valid_samples


def filter_by_min_points(bboxes, min_points_dict):
    """Keep GT dicts with enough interior points
    (reference ops/ops_torch.py:522-533)."""
    filtered_boxes = []
    for box in bboxes:
        if box["label"] in min_points_dict:
            if (box["points_inside_box"].shape[0]
                    > min_points_dict[box["label"]]):
                filtered_boxes.append(box)
        else:
            filtered_boxes.append(box)
    return filtered_boxes


def get_boxes_normals(boxes):
    """Boxes -> (N, 15): dims + the three unit axis vectors
    (reference ops/ops_torch.py:283-291)."""
    boxes = jnp.asarray(boxes)
    corners = box_corners_3d(boxes)
    norm_x = (corners[:, 1] - corners[:, 0]) / boxes[:, 3:4]
    norm_y = (corners[:, 3] - corners[:, 0]) / boxes[:, 4:5]
    norm_z = (corners[:, 4] - corners[:, 0]) / boxes[:, 5:6]
    normals = jnp.concatenate([norm_x, norm_y, norm_z], axis=-1)
    return jnp.concatenate([boxes[:, :6], normals], axis=-1)
