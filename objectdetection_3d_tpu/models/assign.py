"""Anchor-target assignment, fully vectorized for TPU.

Re-designs the reference's per-item, per-class Python loop with exact 3D IoU
against all 1.92M anchors (model/PointPillars.py:886-1000) as a two-stage
static-shape computation:

1. **Prefilter** — a provable AABB upper bound on the rotated-3D IoU is
   evaluated against every anchor (cheap vector math), and the top-K
   candidate anchors per ground-truth box are selected.
2. **Exact** — the half-space-clipping IoU runs only on the (G, K)
   candidate pairs; results scatter back to full-anchor-space masks.

Anchors outside every candidate set are treated as IoU 0 (negative).  This
matches the reference exactly whenever the K-th upper bound per GT is below
the negative threshold (the practical case for K >= a few hundred);
borderline anchors beyond K would at worst move from "negative" to
"negative", never create or destroy positives, because the true per-GT
maximum is always inside the candidate set (upper-bound dominance).
"""

from functools import partial

import jax
import jax.numpy as jnp

from objectdetection_3d_tpu.models.anchors import BBoxCoder
from objectdetection_3d_tpu.ops.boxes import box_corners_3d, limit_period
from objectdetection_3d_tpu.ops.iou3d import intersection_volume_3d


def _aabb_and_volume(boxes):
    corners = box_corners_3d(boxes)
    return (jnp.min(corners, axis=-2), jnp.max(corners, axis=-2),
            jnp.prod(boxes[..., 3:6], axis=-1))


def _upper_bound_rows(gt_lo, gt_hi, gt_vol, an_lo, an_hi, an_vol):
    """(G', 3)x(N, 3) -> (G', N) IoU upper bounds."""
    lo = jnp.maximum(gt_lo[:, None], an_lo[None, :])
    hi = jnp.minimum(gt_hi[:, None], an_hi[None, :])
    inter = jnp.prod(jnp.clip(hi - lo, 0.0), axis=-1)
    denom = gt_vol[:, None] + an_vol[None, :] - inter
    return jnp.where(denom > 1e-6, inter / jnp.maximum(denom, 1e-6), 0.0)


def _blockwise_topk(ub, k, block):
    """Exact top-k over the anchor axis via a two-level reduction.

    ``lax.top_k`` straight over N~1.9M anchors dominates the train step
    (measured 546 ms for G=128 on v5e).  Splitting N into blocks, ranking
    blocks by their max, and running top-k only inside the winning blocks
    is exact up to ties at the k-th value: every block holding a true
    top-k element has block-max >= the k-th value, and there are at most
    k such blocks, so gathering the top-k blocks (k*block values) keeps
    all of them.  Measured ~17x faster at N=1.92M, k=512, block=128.

    Args:
        ub: (G', N) scores (any real values).
        k: candidates per row; block: anchors per block.
    Returns:
        (G', k) int32 indices into N.
    """
    g, n = ub.shape
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        # -inf: scores may be arbitrary reals (raw logits), padding must
        # never win a top-k slot
        ub = jnp.pad(ub, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    bmax = ub.reshape(g, nb, block).max(-1)
    kb = min(k, nb)
    bidx = jax.lax.top_k(bmax, kb)[1]                     # (G', kb)
    base = (bidx[..., None] * block
            + jnp.arange(block)).reshape(g, kb * block)   # (G', kb*block)
    vals = jnp.take_along_axis(ub, base, axis=1)
    sel = jax.lax.top_k(vals, k)[1]
    return jnp.take_along_axis(base, sel, axis=1)


@partial(jax.jit,
         static_argnames=("candidates_per_gt", "gt_chunk", "num_classes",
                          "prefilter", "prefilter_block"))
def assign_targets(anchors, gt_boxes, gt_labels, gt_mask, pos_thr, neg_thr,
                   candidates_per_gt=512, gt_chunk=16, num_classes=1,
                   anchor_aabb=None, prefilter="approx",
                   prefilter_block=128):
    """Assign GT boxes to anchors for one point cloud.

    Matching rules follow reference model/PointPillars.py:964-978:
    positive if max IoU over GT >= ``pos_thr``; negative if < ``neg_thr``;
    low-quality rescue marks every anchor achieving a GT's row-max as
    positive when that max >= ``neg_thr``.  Per-anchor target = argmax GT
    (first on ties, like torch ``max``).

    Per-class thresholds (reference per-class loop with ``iou_thr[j]``,
    model/PointPillars.py:937-944,976-978): pass ``pos_thr``/``neg_thr`` as
    (num_classes,) arrays and each anchor is judged by the thresholds of
    the class of its best-matching GT (the rescue rule likewise uses the
    GT's own class threshold).  Scalars reproduce the single-class rule.

    Args:
        anchors: (N, 9) flat anchor boxes.
        gt_boxes: (G, 9) padded GT boxes, gt_mask: (G,) validity.
        gt_labels: (G,) int labels.
        pos_thr, neg_thr: scalars or (num_classes,) arrays
            (iou_thr[.][1], iou_thr[.][0] of the config).
        prefilter: candidate-selection algorithm over the 1.9M upper
            bounds.  "approx" (default) = ``lax.approx_max_k`` at recall
            0.99 — the TPU-native partial-reduce primitive (34 ms vs
            546 ms plain top-k at N=1.92M, G=128 on v5e); the candidate
            TOP-K-BY-UPPER-BOUND set is itself already a prefilter
            heuristic, so a 0.99-recall version of it leaves the exact
            IoU stage's semantics unchanged in practice.  "block" =
            exact two-level top-k (``_blockwise_topk``, 224 ms);
            "full" = plain ``lax.top_k``.
        prefilter_block: block size for the "block" variant.
    Returns:
        dict with per-anchor arrays:
            pos_mask, neg_mask: (N,) bool
            best_gt: (N,) int32 (clipped, only meaningful under pos_mask)
            target_deltas: (N, 9) encoded regression targets
            target_labels: (N,) int32 (num_classes for background)
            dir_targets: (N, 3) int32 2-bin direction targets
            num_pos: scalar int32
    """
    n = anchors.shape[0]
    g = gt_boxes.shape[0]
    k = min(candidates_per_gt, n)

    if anchor_aabb is None:
        an_lo, an_hi, an_vol = _aabb_and_volume(anchors)
    else:
        # anchors are trace-time constants; callers precompute their AABBs
        # once instead of re-deriving 1.9M corner sets every step
        an_lo, an_hi, an_vol = anchor_aabb
    gt_lo, gt_hi, gt_vol = _aabb_and_volume(gt_boxes)

    # --- stage 1: top-K candidates per GT by the upper bound -------------
    chunk = min(gt_chunk, g)
    pad_g = (-g) % chunk
    def ub_topk(idx_chunk):
        ub = _upper_bound_rows(gt_lo[idx_chunk], gt_hi[idx_chunk],
                               gt_vol[idx_chunk], an_lo, an_hi, an_vol)
        if prefilter == "approx" and k < n:
            return jax.lax.approx_max_k(
                ub, k, recall_target=0.99, aggregate_to_topk=True)[1]
        if prefilter == "block" and prefilter_block < n:
            return _blockwise_topk(ub, k, prefilter_block)
        return jax.lax.top_k(ub, k)[1]

    gt_idx = jnp.arange(g + pad_g) % jnp.maximum(g, 1)
    cand_idx = jax.lax.map(
        ub_topk, gt_idx.reshape(-1, chunk))
    cand_idx = cand_idx.reshape(-1, k)[:g]  # (G, K)

    # --- stage 2: exact IoU on candidates --------------------------------
    def exact_chunk(args):
        gti, ci = args  # (chunk,), (chunk, K)
        def one(gt_i, cands):
            inter = intersection_volume_3d(
                gt_boxes[gt_i][None], anchors[cands])[0]
            return jnp.clip(inter, 0.0)
        return jax.vmap(one)(gti, ci)

    ci_pad = jnp.concatenate(
        [cand_idx, jnp.zeros((pad_g, k), cand_idx.dtype)], 0)
    inter_gk = jax.lax.map(
        exact_chunk,
        (gt_idx.reshape(-1, chunk), ci_pad.reshape(-1, chunk, k)))
    inter_gk = inter_gk.reshape(-1, k)[:g]

    union = (gt_vol[:, None] + an_vol[cand_idx] - inter_gk)
    exact = jnp.where(union > 1e-6, inter_gk / jnp.maximum(union, 1e-6), 0.0)
    exact = jnp.where(gt_mask[:, None], exact, -1.0)  # padded GT never wins

    # --- scatter back to full anchor space -------------------------------
    flat_idx = cand_idx.reshape(-1)
    flat_iou = exact.reshape(-1)
    max_overlap = jnp.zeros((n,), exact.dtype).at[flat_idx].max(flat_iou)
    max_overlap = jnp.maximum(max_overlap, 0.0)

    winner = exact >= max_overlap[cand_idx]
    winner &= gt_mask[:, None] & (exact > 0)
    g_ids = jnp.broadcast_to(jnp.arange(g)[:, None], (g, k))
    best_gt = jnp.full((n,), g, jnp.int32).at[flat_idx].min(
        jnp.where(winner, g_ids, g).reshape(-1))
    best_gt_clipped = jnp.clip(best_gt, 0, max(g - 1, 0))

    # per-class thresholds, indexed by the matched GT's class
    c = max(num_classes, 1)
    pos_thr = (jnp.asarray(pos_thr, jnp.float32)
               * jnp.ones((c,), jnp.float32))
    neg_thr = (jnp.asarray(neg_thr, jnp.float32)
               * jnp.ones((c,), jnp.float32))
    lbl_safe = jnp.clip(gt_labels, 0, c - 1)
    anchor_lbl = lbl_safe[best_gt_clipped]

    pos = max_overlap >= pos_thr[anchor_lbl]
    neg = max_overlap < neg_thr[anchor_lbl]

    # low-quality rescue (reference model/PointPillars.py:976-978), with
    # each GT's own class threshold
    gt_max = jnp.max(exact, axis=1)  # (G,)
    rescue = ((exact >= gt_max[:, None])
              & (gt_max[:, None] >= neg_thr[lbl_safe][:, None]))
    rescue &= gt_mask[:, None] & (exact > 0)
    pos_extra = jnp.zeros((n,), bool).at[flat_idx].max(rescue.reshape(-1))
    pos = pos | pos_extra
    neg = neg & ~pos

    tgt_boxes = gt_boxes[best_gt_clipped]
    # anchors without a positive target encode against themselves: padded
    # GT rows have zero dims and would inject log(0)/0-div NaNs that poison
    # the masked loss (0 * inf = NaN)
    safe_tgt = jnp.where(pos[:, None], tgt_boxes, anchors)
    target_deltas = BBoxCoder.encode(anchors, safe_tgt)
    target_labels = jnp.where(
        pos, gt_labels[best_gt_clipped], num_classes).astype(jnp.int32)

    # per-axis 2-bin direction targets (reference
    # model/PointPillars.py:187-197): limit to [0, 2pi), bin = floor(r/pi)%2
    angles = tgt_boxes[:, 6:9]
    wrapped = limit_period(angles, 0.0, 2 * jnp.pi)
    dir_targets = (jnp.floor(wrapped / jnp.pi).astype(jnp.int32) % 2)

    return {
        "pos_mask": pos,
        "neg_mask": neg,
        "best_gt": best_gt_clipped,
        "max_overlap": max_overlap,
        "target_deltas": target_deltas,
        "target_labels": target_labels,
        "dir_targets": dir_targets,
        "num_pos": jnp.sum(pos).astype(jnp.int32),
    }
