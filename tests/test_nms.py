import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.ops.boxes import (  # noqa: E402
    iou_aabb_2d,
    rotated_corners_2d_envelope,
)
from objectdetection_3d_tpu.ops.iou3d import iou3d  # noqa: E402
from objectdetection_3d_tpu.ops.nms import multiclass_nms  # noqa: E402
from oracles import greedy_nms_np  # noqa: E402
from test_boxes import random_boxes  # noqa: E402


def _keep_indices(keep_col):
    return sorted(np.where(np.asarray(keep_col))[0].tolist())


@pytest.mark.parametrize("nms_dim", [2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle_greedy(nms_dim, seed):
    rng = np.random.default_rng(seed)
    n = 48
    boxes = random_boxes(n, rng)
    # cluster boxes so plenty of overlaps exist
    boxes[:, :2] = rng.uniform(0, 6, (n, 2))
    boxes[:, 2] = rng.uniform(0, 1, n)
    scores = rng.uniform(0, 1, (n, 1)).astype(np.float32)

    keep = multiclass_nms(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
        score_thr=0.3, iou_thr=0.1, nms_dim=nms_dim)

    if nms_dim == 3:
        iou = np.asarray(iou3d(jnp.asarray(boxes), jnp.asarray(boxes)))
    else:
        env = rotated_corners_2d_envelope(jnp.asarray(boxes))
        iou = np.asarray(iou_aabb_2d(env, env))
    want = greedy_nms_np(iou, scores[:, 0], 0.3, 0.1)
    assert _keep_indices(keep[:, 0]) == want


def test_multiclass_independent():
    rng = np.random.default_rng(3)
    boxes = random_boxes(16, rng)
    scores = rng.uniform(0, 1, (16, 3)).astype(np.float32)
    keep = multiclass_nms(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
        score_thr=0.3, iou_thr=0.2, nms_dim=2)
    env = rotated_corners_2d_envelope(jnp.asarray(boxes))
    iou = np.asarray(iou_aabb_2d(env, env))
    for c in range(3):
        want = greedy_nms_np(iou, scores[:, c], 0.3, 0.2)
        assert _keep_indices(keep[:, c]) == want


def test_padding_rows_never_kept():
    rng = np.random.default_rng(4)
    boxes = random_boxes(8, rng)
    scores = np.full((8, 1), 0.9, np.float32)
    valid = np.array([True] * 5 + [False] * 3)
    keep = multiclass_nms(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
        score_thr=0.3, iou_thr=0.99, nms_dim=2,
        valid_mask=jnp.asarray(valid))
    assert not np.any(np.asarray(keep)[5:])


def test_tiny_threshold_suppresses_overlaps():
    # reference config uses nms_thresh=1e-5: any overlap suppresses
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, 3:6] = 1.0
    boxes[1, 0] = 0.5  # overlapping neighbor
    scores = np.array([[0.9], [0.8]], np.float32)
    keep = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_thr=0.3, iou_thr=1e-5, nms_dim=3)
    assert _keep_indices(keep[:, 0]) == [0]
