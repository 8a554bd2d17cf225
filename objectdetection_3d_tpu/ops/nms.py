"""Fixed-size masked greedy NMS under `jit`.

Replaces the reference's Python while-loop NMS (model/utils.py:353-426,
including its hard-coded ``.cuda()``) with a static `lax.fori_loop` over a
score-sorted candidate buffer: identical greedy keep-set, no host roundtrip.
"""

from functools import partial

import jax
import jax.numpy as jnp

from objectdetection_3d_tpu.ops.boxes import (
    iou_aabb_2d,
    rotated_corners_2d_envelope,
)
from objectdetection_3d_tpu.ops.iou3d import iou3d


def _greedy_keep(iou_sorted, valid_sorted, iou_thr):
    """Greedy suppression in score-sorted space.

    Box i is kept iff it is valid and no earlier kept box overlaps it with
    IoU > ``iou_thr`` — the same keep set as the reference's while-loop
    (model/utils.py:406-424).
    """
    n = valid_sorted.shape[0]
    idx = jnp.arange(n)

    def body(i, state):
        keep, suppressed = state
        is_active = valid_sorted[i] & ~suppressed[i]
        keep = keep.at[i].set(is_active)
        sup = (iou_sorted[i] > iou_thr) & (idx != i) & is_active
        return keep, suppressed | sup

    keep, _ = jax.lax.fori_loop(
        0, n, body,
        (jnp.zeros((n,), bool), jnp.zeros((n,), bool)))
    return keep


@partial(jax.jit, static_argnames=("nms_dim", "iou_row_chunk"))
def multiclass_nms(boxes, scores, score_thr, iou_thr, nms_dim=3,
                   valid_mask=None, iou_row_chunk=64):
    """Per-class greedy NMS (reference model/utils.py:353-426 semantics).

    Args:
        boxes: (N, 9) decoded boxes.
        scores: (N, C) per-class scores (already sigmoided).
        score_thr: scalar score threshold.
        iou_thr: scalar IoU suppression threshold.
        nms_dim: 3 -> exact rotated-3D IoU; 2 -> rotated-corner AABB
            envelope IoU (the reference's import switch,
            model/utils.py:368-374).
        valid_mask: optional (N,) bool of candidate validity (padding rows).
    Returns:
        (N, C) bool keep matrix.
    """
    n, num_classes = scores.shape
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    if nms_dim == 3:
        iou = iou3d(boxes, boxes, row_chunk=iou_row_chunk)
    else:
        env = rotated_corners_2d_envelope(boxes)
        iou = iou_aabb_2d(env, env)

    def one_class(cls_scores):
        valid = (cls_scores > score_thr) & valid_mask
        order = jnp.argsort(-jnp.where(valid, cls_scores, -jnp.inf))
        iou_s = iou[order][:, order]
        keep_sorted = _greedy_keep(iou_s, valid[order], iou_thr)
        return jnp.zeros((n,), bool).at[order].set(keep_sorted)

    return jax.vmap(one_class, in_axes=1, out_axes=1)(scores)
