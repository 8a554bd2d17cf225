"""Anchor-target assignment, fully vectorized for TPU.

Re-designs the reference's per-item, per-class Python loop with exact 3D IoU
against all 1.92M anchors (model/PointPillars.py:886-1000) as a tiered
static-shape computation:

1. **Containment fast path** (when the anchor grid ``layout`` is given) —
   an anchor fully inside a GT box (or vice versa) has CLOSED-FORM exact
   IoU ``vol_small / vol_big``; both containments reduce to separating-
   axis interval tests on box centers, which factor over the anchor grid's
   (cells x combos) structure into a handful of small matmuls.  This is
   where the positive mass lives: on realistic tree-sized GTs, thousands
   of anchors sit fully inside each box with FLAT AABB upper bounds, so
   no top-K-by-upper-bound selection can find them (measured: the top-K
   variants recovered ~385 of 22,346 reference positives at N=1.92M,
   G=128 — tools/check_assign_exact.py).
2. **Prefilter** — the slab-overlap IoU upper bound against every anchor
   selects top-K candidates per GT for the partial-overlap ring.
3. **Exact candidates** — half-space-clipping IoU on the (G, K)
   candidate pairs.
4. **Exact anchor tier** (``exact_anchor_tier``, layout path) — every
   anchor is clipped EXACTLY against its top-2 GTs by prefilter key
   (2N aligned pairs through the Pallas clipper,
   ops/pallas_iou3d.py).  This is what closes the partial-overlap gap
   the per-GT budget cannot: at flagship scale ~1.2M anchors carry a
   slab bound >= pos_thr with near-tied values, so no per-GT top-K
   recovers them (K=2048 still missed 41% of reference positives —
   tools/check_assign_exact.py), but each such anchor's true best GT
   ranks first or second in its own key column.
5. **Sound negatives** — an anchor is negative only when its *evaluated*
   max is below threshold AND a bound proves every unevaluated pair is
   too: every GT outside the anchor's tier-evaluated top-2 (by key) has
   key <= the anchor's 3rd-best key, and a pair's true IoU <= its slab
   upper bound <= key + the tiebreak slack, so ``v3 + SLACK`` bounds all
   of them (SAT-disjoint pairs are separately certified IoU 0).
   Anchors the bound cannot clear become "ignore" (neither positive nor
   negative) instead of silently mislabeled background — the deviation
   from the reference is only ever extra ignores, never a wrong label.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_3d_tpu.models.anchors import BBoxCoder
from objectdetection_3d_tpu.ops.boxes import (
    box_corners_3d,
    limit_period,
    rotation_matrices,
)
from objectdetection_3d_tpu.ops.iou3d import intersection_volume_3d
from objectdetection_3d_tpu.ops.pallas_iou3d import (
    iou_gathered,
    iou_gathered_pair,
)
# the one shared top-3 merge — the Pallas geometry kernel body folds with
# the same function, keeping tie ordering identical across both
# assignment paths (the scans below and ops/assign_geometry's kernel)
from objectdetection_3d_tpu.ops.assign_geometry import (
    top3_merge as _top3_merge,
)


def _aabb_and_volume(boxes):
    corners = box_corners_3d(boxes)
    return (jnp.min(corners, axis=-2), jnp.max(corners, axis=-2),
            jnp.prod(boxes[..., 3:6], axis=-1))


def make_anchor_layout(anchors, num_combos):
    """Factor a flat grid-anchor array into (cells x combos) structure.

    Anchor flat order is ``((y*W + x)*S + s)*R + r`` (models/anchors.py),
    i.e. cell-major with ``num_combos = S*R`` contiguous combos sharing
    one cell center; every cell repeats the same (size, rotation) combos.

    Args:
        anchors: (N, 9) numpy anchor boxes, N = num_cells * num_combos.
    Returns:
        tuple of numpy arrays
        (cell_centers (Nc, 3) box-bottom centers,
         combo_rot (M, 3, 3) rotation matrices,
         combo_half (M, 3) half dims,
         combo_vol (M,),
         combo_offset (M, 3) bottom-center -> volumetric-center offsets).
    """
    anchors = np.asarray(anchors, np.float32)
    n = anchors.shape[0]
    assert n % num_combos == 0
    a = anchors.reshape(n // num_combos, num_combos, 9)
    assert np.all(a[:, :, :3] == a[:, :1, :3]), \
        "combos of one cell must share the cell center"
    assert np.all(a[:, :, 3:] == a[:1, :, 3:]), \
        "every cell must repeat the same combo (size, rotation) set"
    cell_centers = a[:, 0, :3].copy()
    dims = a[0, :, 3:6]
    rots = a[0, :, 6:9]
    combo_rot = np.asarray(
        rotation_matrices(rots[:, 0], rots[:, 1], rots[:, 2]), np.float32)
    combo_half = (dims / 2).astype(np.float32)
    combo_vol = np.prod(dims, axis=-1).astype(np.float32)
    combo_offset = (combo_rot @ np.array([0.0, 0.0, 1.0], np.float32)
                    * (dims[:, 2:3] / 2)).astype(np.float32)
    return (cell_centers, combo_rot, combo_half, combo_vol, combo_offset)


def _gt_frames(gt_boxes):
    """Per-GT rotation axes, half dims, volumetric centers, volumes."""
    u = rotation_matrices(gt_boxes[:, 6], gt_boxes[:, 7], gt_boxes[:, 8])
    hg = gt_boxes[:, 3:6] / 2
    cg = gt_boxes[:, :3] + u[:, :, 2] * hg[:, 2:3]
    volg = jnp.prod(gt_boxes[:, 3:6], axis=-1)
    return u, hg, cg, volg


#: tiebreak weight on the axis-distance (see _chunk_geometry); the slack
#: it can add to the sound bound is _TIEBREAK_EPS * scene diagonal
_TIEBREAK_EPS = 1e-6
_TIEBREAK_SLACK = _TIEBREAK_EPS * 100.0


def _chunk_geometry(gt_boxes, gt_mask, layout, cell_on_v):
    """All per-(GT, anchor) interval geometry for one GT chunk.

    Everything derives from center-offset projections on the 6 face axes
    (3 GT + 3 anchor), factored over the anchor grid's (cells x combos)
    structure.  Returns a dict of (g, Nc, M) arrays:

    * ``iou``: EXACT IoU where one box fully contains the other
      (``vol_small / vol_big``), 0 elsewhere.
    * ``maybe``: False only when the pair is PROVABLY disjoint (6-axis
      SAT separation) — a sound "true IoU is 0" certificate.
    * ``ub``: slab-overlap IoU upper bound — the product of per-axis
      interval overlaps bounds the intersection volume on each axis set
      (a box is the intersection of its three slabs).  Unlike the AABB
      bound, it DISCRIMINATES position along the box axes, which is what
      makes top-K candidate selection work on tilted tall boxes: with
      the AABB bound, every anchor inside a tree's inflated AABB ties
      and top-K picks an index-ordered corner (~2% of reference
      positives recovered at flagship scale, tools/check_assign_exact.py).
    * ``key``: ``ub`` minus a tiny axis-distance tiebreak, so equal-ub
      anchors rank by proximity to the GT's long axis (where the high-IoU
      anchors live).
    """
    cellc, crot, chalf, cvol, coff = layout
    u, hg, cg, volg = _gt_frames(gt_boxes)

    # |u_i . v_j| cross-projection table per (gt, combo)
    cross = jnp.abs(jnp.einsum("gki,mkj->gmij", u, crot))
    ha_proj = jnp.einsum("gmij,mj->gmi", cross, chalf)  # on gt axes
    hg_proj = jnp.einsum("gmij,gi->gmj", cross, hg)     # on combo axes

    # center offsets projected on gt axes: (c_a - c_g) . u_i with
    # c_a = cell_center + combo_offset
    base = (jnp.einsum("nc,gci->gni", cellc, u)
            - jnp.einsum("gc,gci->gi", cg, u)[:, None, :])  # (g, Nc, 3)
    corr = jnp.einsum("mc,gci->gmi", coff, u)               # (g, M, 3)
    abs_a = jnp.abs(base[:, :, None, :] + corr[:, None, :, :])
    hg_b = hg[:, None, None, :]
    hap_b = ha_proj[:, None, :, :]
    in_a = jnp.all(abs_a <= hg_b - hap_b, axis=-1)
    sep_a = jnp.any(abs_a > hg_b + hap_b, axis=-1)
    wa = jnp.clip(jnp.minimum(jnp.minimum(
        hg_b + hap_b - abs_a, 2 * hg_b), 2 * hap_b), 0.0)

    # ... and on anchor (combo) axes: (c_g - c_a) . v_j
    cg_on_v = jnp.einsum("gc,mcj->gmj", cg, crot)           # (g, M, 3)
    coff_on_v = jnp.einsum("mc,mcj->mj", coff, crot)        # (M, 3)
    abs_b = jnp.abs(cg_on_v[:, None, :, :] - cell_on_v[None, :, :, :]
                    - coff_on_v[None, None, :, :])
    ch_b = chalf[None, None, :, :]
    hgp_b = hg_proj[:, None, :, :]
    in_b = jnp.all(abs_b <= ch_b - hgp_b, axis=-1)
    sep_b = jnp.any(abs_b > ch_b + hgp_b, axis=-1)
    wb = jnp.clip(jnp.minimum(jnp.minimum(
        ch_b + hgp_b - abs_b, 2 * ch_b), 2 * hgp_b), 0.0)

    valid = gt_mask[:, None, None]

    ratio_a = cvol[None, :] / jnp.maximum(volg[:, None], 1e-6)  # (g, M)
    ratio_b = volg[:, None] / jnp.maximum(cvol[None, :], 1e-6)
    iou = jnp.where(in_a, ratio_a[:, None, :],
                    jnp.where(in_b, ratio_b[:, None, :], 0.0))

    inter_ub = jnp.minimum(jnp.prod(wa, -1), jnp.prod(wb, -1))
    inter_ub = jnp.minimum(
        inter_ub, jnp.minimum(volg[:, None, None], cvol[None, None, :]))
    denom = volg[:, None, None] + cvol[None, None, :] - inter_ub
    ub = jnp.where(denom > 1e-6, inter_ub / jnp.maximum(denom, 1e-6), 0.0)
    ub = jnp.where(valid, ub, 0.0)

    # distance to the GT's long (z) axis = the two short-axis components
    d_axis = jnp.sqrt(abs_a[..., 0] ** 2 + abs_a[..., 1] ** 2)

    return {
        "iou": jnp.where(valid, iou, 0.0),
        "maybe": ~(sep_a | sep_b) & valid,
        "ub": ub,
        "key": jnp.where(valid, ub - _TIEBREAK_EPS * d_axis, -1e9),
    }




def _segment_max_small(vals, ids, g):
    """Per-id max of ``vals`` (>= 0) for a SMALL id space, scatter-free.

    ``zeros(g).at[ids].max(vals)`` serializes on TPU (measured ~25 ms per
    scatter-max at N=1.92M); a blocked compare-and-reduce reads the value
    stream once per 8-id block instead (~16 passes x 15 MB at flagship
    scale, ~5 ms total).

    Args:
        vals: (N,) float32, non-negative (0 = no contribution).
        ids: (N,) int32 in [0, g).
    Returns:
        (g,) float32 per-id maxima (0 where an id never appears).
    """
    blk = 8
    gpad = -(-g // blk) * blk
    gids = jnp.arange(gpad, dtype=ids.dtype)

    def chunk_fn(gc):  # (blk,) ids -> (blk,) maxima
        eq = ids[None, :] == gc[:, None]
        return jnp.max(jnp.where(eq, vals[None, :], 0.0), axis=1)

    return jax.lax.map(chunk_fn, gids.reshape(-1, blk)).reshape(-1)[:g]


def _merge_best(m1, b1, m2, b2):
    """Merge two (max, best-gt) pairs; ties prefer the LOWER gt index.

    Callers keep the gt-count sentinel in ``b`` wherever ``m`` is 0, so a
    zero-overlap path can never donate its index.
    """
    better2 = (m2 > m1) | ((m2 == m1) & (b2 < b1))
    return jnp.maximum(m1, m2), jnp.where(better2, b2, b1)


def _tier_exact_pair(gt_boxes, gt_mask, anchors, a1, v1, a2, v2, g,
                     pallas="auto"):
    """Exact IoU of every anchor against its top-2 selected GTs (tier 4).

    One fused aligned (N,) clipper pass for BOTH selections — Pallas on
    TPU with the GT sides gathered IN-KERNEL from the (G, 9) table (an
    XLA ``gt_boxes[ids]`` row gather costs ~67 ms at N=1.92M on this
    chip, and the 24-row fused ring fills native sublane tiles exactly
    where two 12-row passes waste 25%).  Invalid selections (sentinel
    id, masked GT, all-masked key) return 0.
    """
    safe1 = jnp.clip(a1, 0, max(g - 1, 0))
    safe2 = jnp.clip(a2, 0, max(g - 1, 0))
    t1, t2 = iou_gathered_pair(gt_boxes, gt_mask, safe1, safe2, anchors,
                               pallas=pallas)
    t1 = jnp.where((a1 < g) & (v1 > -1e9), t1, 0.0)
    t2 = jnp.where((a2 < g) & (v2 > -1e9), t2, 0.0)
    return t1, t2


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
                          "prefilter", "prefilter_block",
                          "exact_anchor_tier", "geometry", "pallas"))
def assign_targets(anchors, gt_boxes, gt_labels, gt_mask, pos_thr, neg_thr,
                   candidates_per_gt=512, gt_chunk=16, num_classes=1,
                   anchor_aabb=None, prefilter="approx",
                   prefilter_block=128, layout=None,
                   exact_anchor_tier=True, geometry="auto", pallas="auto"):
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
        layout: optional anchor-grid factorization from
            :func:`make_anchor_layout` — enables the exact containment
            fast path (tier 1), which is REQUIRED for reference-faithful
            positives at realistic GT sizes: top-K-by-upper-bound alone
            recovers ~2% of the reference positives at flagship scale
            because contained anchors tie in the upper bound
            (tools/check_assign_exact.py).  Without it, only candidate
            pairs are evaluated (adequate for small GT boxes / tests).
        exact_anchor_tier: (layout path only) clip every anchor exactly
            against its top-2 prefilter-key GTs — 2N aligned pairs
            through the Pallas clipper (ops/pallas_iou3d.py).  Closes
            the partial-overlap positives the per-GT candidate budget
            cannot reach (module docstring, tier 4).
        geometry: chunk-geometry implementation for the layout path.
            "auto" (default) = the fused Pallas kernel
            (ops/assign_geometry.py) on TPU, the XLA formulation
            elsewhere; "xla" / "pallas" force one; "pallas_interpret"
            runs the kernel in interpreter mode (CPU parity tests).
            Both produce identical assignments (tested in
            tests/test_assign_geometry.py / test_assign.py).
        pallas: "off" forces every Pallas dispatch (geometry kernel,
            stage-2 clipper, exact tier, containment rescue) onto the
            XLA formulations even on TPU.  Mesh-sharded callers must use
            this: GSPMD has no partitioning rule for Mosaic custom calls
            (see parallel/data_parallel.py).
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

    # --- stage 1: top-K candidates per GT by an IoU upper bound ----------
    # alongside the indices, each chunk emits the per-anchor bound on
    # UNEVALUATED pairs, max_g min(ub, kth(g)): a non-candidate pair's
    # ranking key never exceeds its GT's k-th key, so this bound proves
    # negatives sound (see module docstring, tier 4).
    #
    # With the anchor-grid ``layout``, the bound is the slab-overlap
    # bound and the same chunk pass yields containment IoUs + SAT
    # disjointness (_chunk_geometry); without it, the looser AABB bound.
    chunk = min(gt_chunk, g)
    pad_g = (-g) % chunk
    gt_idx = jnp.arange(g + pad_g) % jnp.maximum(g, 1)
    chunks = gt_idx.reshape(-1, chunk)
    # padding rows wrap onto real GTs for static shapes; mask them out of
    # the per-anchor top-3 key merge or a duplicated GT occupies BOTH
    # exact-tier slots (t2 is then zeroed as a duplicate and the genuine
    # second-best GT is never exactly clipped)
    chunks_ok = (jnp.arange(g + pad_g) < g).reshape(-1, chunk)

    def select_topk(key):
        if prefilter == "approx" and k < n:
            return jax.lax.approx_max_k(
                key, k, recall_target=0.99, aggregate_to_topk=True)
        if prefilter == "block" and prefilter_block < n:
            idx = _blockwise_topk(key, k, prefilter_block)
            return jnp.take_along_axis(key, idx, axis=1), idx
        return jax.lax.top_k(key, k)

    use_pallas = (geometry in ("pallas", "pallas_interpret")
                  or (geometry == "auto" and pallas != "off"
                      and jax.default_backend() == "tpu"))
    if layout is not None and use_pallas:
        from objectdetection_3d_tpu.ops.assign_geometry import (
            chunk_geometry,
            combo_table_jnp,
            containment_rescue,
            pad_cells_jnp,
        )

        interp = geometry == "pallas_interpret"
        nc_cells = layout[0].shape[0]
        mcombo = layout[1].shape[0]
        assert n == nc_cells * mcombo, \
            "layout does not match the anchor count"
        cellc_pad = pad_cells_jnp(layout[0])
        combo_tab = combo_table_jnp(layout)
        ncp = cellc_pad.shape[1]
        npm = mcombo * ncp  # padded m-major anchor count

        def mm_to_flat(x):
            """(M, Ncp) m-major kernel layout -> (N,) flat cell-major."""
            return x[:, :nc_cells].T.reshape(-1)

        def scan_body(carry, xs):
            idx_chunk, ok_chunk = xs
            (cmax, cbest, anymb, v1, a1, v2, a2, v3, a3) = carry
            out = chunk_geometry(
                gt_boxes[idx_chunk], gt_mask[idx_chunk] & ok_chunk,
                idx_chunk.astype(jnp.int32), layout, cellc_pad,
                combo_tab, g, interpret=interp)
            gch = idx_chunk.shape[0]
            key2d = out["key"].reshape(gch, npm)
            _, idxp = select_topk(key2d)
            # m-major padded ids -> flat cell-major anchor ids; padding
            # cells only ever rank for fully-masked GT rows (their exact
            # IoU is forced to -1 downstream, so id 0 is a safe stand-in)
            cellid = idxp % ncp
            idx = jnp.where(cellid < nc_cells,
                            cellid * mcombo + idxp // ncp, 0)
            cmax, cbest = _merge_best(cmax, cbest, out["cm"], out["cb"])
            anymb = anymb | (out["mb"] > 0)
            for w, gw in ((out["v1"], out["a1"]), (out["v2"], out["a2"]),
                          (out["v3"], out["a3"])):
                v1, a1, v2, a2, v3, a3 = _top3_merge(
                    v1, a1, v2, a2, v3, a3, w, gw)
            r_max = jnp.max(out["rmax"], axis=1)
            new_carry = (cmax, cbest, anymb, v1, a1, v2, a2, v3, a3)
            return new_carry, (idx, r_max)

        shp = (mcombo, ncp)
        neg_inf = jnp.full(shp, -jnp.inf)
        gsent2 = jnp.full(shp, g, jnp.int32)
        carry0 = (jnp.zeros(shp, jnp.float32), gsent2,
                  jnp.zeros(shp, bool),
                  neg_inf, gsent2, neg_inf, gsent2, neg_inf, gsent2)
        carry, (cand_idx, rm) = jax.lax.scan(scan_body, carry0,
                                             (chunks, chunks_ok))
        (cont_max, cont_best, overlap_possible,
         v1, a1, v2, a2, v3, a3) = (mm_to_flat(c) for c in carry)
        cont_row_max = jnp.zeros((g,), jnp.float32).at[
            chunks.reshape(-1)].max(rm.reshape(-1))

        if exact_anchor_tier:
            # tier 4: clip every anchor exactly against its top-2 gts
            t1, t2 = _tier_exact_pair(gt_boxes, gt_mask, anchors,
                                      a1, v1, a2, v2, g, pallas=pallas)
            t2 = jnp.where(a2 == a1, 0.0, t2)  # duplicate slot
            tier_max = jnp.maximum(t1, t2)
            tier_best = jnp.where(
                (t1 > t2) | ((t1 == t2) & (a1 <= a2)), a1, a2)
            tier_best = jnp.where(tier_max > 0, tier_best, g)
            unev_bound = v3 + _TIEBREAK_SLACK
        else:
            t1 = t2 = jnp.zeros((n,), jnp.float32)
            tier_max = jnp.zeros((n,), jnp.float32)
            tier_best = jnp.full((n,), g, jnp.int32)
            unev_bound = v1 + _TIEBREAK_SLACK
        unev_bound = jnp.maximum(unev_bound, 0.0)
    elif layout is not None:
        cellc, crot = layout[0], layout[1]
        assert n == cellc.shape[0] * crot.shape[0], \
            "layout does not match the anchor count"
        cell_on_v = jnp.einsum("nc,mcj->nmj", cellc, crot)

        def chunk_top(vals2d, ids, kmax):
            """Within-chunk per-anchor top-k: [(value, global gt id)]."""
            out = []
            v = vals2d
            for _ in range(kmax):
                am = jnp.argmax(v, axis=0)
                out.append((jnp.max(v, axis=0),
                            ids[am].astype(jnp.int32)))
                v = jnp.where(jnp.arange(v.shape[0])[:, None]
                              == am[None, :], -jnp.inf, v)
            return out

        def scan_body(carry, xs):
            idx_chunk, ok_chunk = xs
            (cmax, cbest, anymb, v1, a1, v2, a2, v3, a3) = carry
            geo = _chunk_geometry(gt_boxes[idx_chunk],
                                  gt_mask[idx_chunk] & ok_chunk,
                                  layout, cell_on_v)
            gch = idx_chunk.shape[0]
            key2d = geo["key"].reshape(gch, n)
            _, idx = select_topk(key2d)
            iou2d = geo["iou"].reshape(gch, n)
            # containment: per-anchor max + first-on-ties best gt
            cm_c = jnp.max(iou2d, axis=0)
            cb_c = jnp.min(jnp.where(iou2d >= cm_c[None],
                                     idx_chunk[:, None], g),
                           axis=0).astype(jnp.int32)
            cb_c = jnp.where(cm_c > 0, cb_c, g)
            cmax, cbest = _merge_best(cmax, cbest, cm_c, cb_c)
            anymb = anymb | jnp.any(geo["maybe"], axis=0).reshape(n)
            # running per-anchor top-3 keys: slots 1-2 are the exact
            # anchor tier's evaluation set, slot 3 bounds every pair
            # evaluated nowhere (ub <= key + SLACK <= v3 + SLACK for all
            # gts outside the top-2)
            for w, gw in chunk_top(key2d, idx_chunk, 3):
                v1, a1, v2, a2, v3, a3 = _top3_merge(
                    v1, a1, v2, a2, v3, a3, w, gw)
            r_max = jnp.max(iou2d, axis=1)  # (gch,) containment row max
            new_carry = (cmax, cbest, anymb, v1, a1, v2, a2, v3, a3)
            return new_carry, (idx, r_max)

        neg_inf = jnp.full((n,), -jnp.inf)
        gsent = jnp.full((n,), g, jnp.int32)
        carry0 = (jnp.zeros((n,), jnp.float32), gsent,
                  jnp.zeros((n,), bool),
                  neg_inf, gsent, neg_inf, gsent, neg_inf, gsent)
        carry, (cand_idx, rm) = jax.lax.scan(scan_body, carry0,
                                             (chunks, chunks_ok))
        (cont_max, cont_best, overlap_possible,
         v1, a1, v2, a2, v3, a3) = carry
        cont_row_max = jnp.zeros((g,), jnp.float32).at[
            chunks.reshape(-1)].max(rm.reshape(-1))

        if exact_anchor_tier:
            # tier 4: clip every anchor exactly against its top-2 gts
            t1, t2 = _tier_exact_pair(gt_boxes, gt_mask, anchors,
                                      a1, v1, a2, v2, g, pallas=pallas)
            t2 = jnp.where(a2 == a1, 0.0, t2)  # duplicate slot
            tier_max = jnp.maximum(t1, t2)
            tier_best = jnp.where(
                (t1 > t2) | ((t1 == t2) & (a1 <= a2)), a1, a2)
            tier_best = jnp.where(tier_max > 0, tier_best, g)
            # sound bound on pairs evaluated NOWHERE: every gt outside
            # the tier-evaluated top-2 has key <= v3, and a pair's true
            # IoU <= its ub <= key + SLACK
            unev_bound = v3 + _TIEBREAK_SLACK
        else:
            t1 = t2 = jnp.zeros((n,), jnp.float32)
            tier_max = jnp.zeros((n,), jnp.float32)
            tier_best = gsent
            unev_bound = v1 + _TIEBREAK_SLACK
        # exact IoUs are >= 0, so the bound never needs to go below 0
        # (it is -inf when no valid GT exists)
        unev_bound = jnp.maximum(unev_bound, 0.0)
    else:
        def ub_topk(idx_chunk):
            ub = _upper_bound_rows(gt_lo[idx_chunk], gt_hi[idx_chunk],
                                   gt_vol[idx_chunk], an_lo, an_hi, an_vol)
            vals, idx = select_topk(ub)
            kth = vals[:, -1]
            return idx, jnp.max(jnp.minimum(ub, kth[:, None]), axis=0)

        cand_idx, unev_chunks = jax.lax.map(ub_topk, chunks)
        cont_max = jnp.zeros((n,), jnp.float32)
        cont_best = jnp.full((n,), g, jnp.int32)
        cont_row_max = jnp.zeros((g,), jnp.float32)
        overlap_possible = jnp.ones((n,), bool)
        t1 = t2 = jnp.zeros((n,), jnp.float32)
        a1 = a2 = cont_best
        tier_max, tier_best = t1, a1
        unev_bound = jnp.max(unev_chunks, axis=0)  # (N,)

    cand_idx = cand_idx.reshape(-1, k)[:g]  # (G, K)

    # --- stage 2: exact IoU on candidates --------------------------------
    if pallas != "off" and jax.default_backend() == "tpu":
        # one aligned pass through the Pallas clipper with the GT side
        # gathered in-kernel (G*K pairs; the chunked XLA clipper below
        # measures ~1.2 M pairs/s — ~55 ms at G=128, K=512)
        rows = jnp.broadcast_to(
            jnp.arange(g, dtype=jnp.int32)[:, None], (g, k)).reshape(-1)
        exact = iou_gathered(
            gt_boxes, gt_mask, rows,
            anchors[cand_idx.reshape(-1)], pallas=pallas).reshape(g, k)
    else:
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
        exact = jnp.where(
            union > 1e-6, inter_gk / jnp.maximum(union, 1e-6), 0.0)
    exact = jnp.where(gt_mask[:, None], exact, -1.0)  # padded GT never wins

    # --- scatter back to full anchor space -------------------------------
    flat_idx = cand_idx.reshape(-1)
    flat_iou = exact.reshape(-1)
    cand_max = jnp.zeros((n,), exact.dtype).at[flat_idx].max(flat_iou)
    cand_max = jnp.maximum(cand_max, 0.0)

    winner = exact >= cand_max[cand_idx]
    winner &= gt_mask[:, None] & (exact > 0)
    g_ids = jnp.broadcast_to(jnp.arange(g)[:, None], (g, k))
    cand_best = jnp.full((n,), g, jnp.int32).at[flat_idx].min(
        jnp.where(winner, g_ids, g).reshape(-1))
    cand_row_max = jnp.max(exact, axis=1)  # (G,), -1 for padded GTs

    # --- merge the three exact paths (ties prefer the lower GT index) ----
    max_overlap, best_gt = _merge_best(cand_max, cand_best,
                                       cont_max, cont_best)
    max_overlap, best_gt = _merge_best(max_overlap, best_gt,
                                       tier_max, tier_best)
    best_gt_clipped = jnp.clip(best_gt, 0, max(g - 1, 0))
    safe1 = jnp.clip(a1, 0, max(g - 1, 0))
    safe2 = jnp.clip(a2, 0, max(g - 1, 0))
    row_max = jnp.maximum(cand_row_max, cont_row_max)  # (G,)
    # tier values contribute to per-GT row maxima too (t1/t2 are 0 for
    # invalid selections, and a max with 0 is a no-op)
    if exact_anchor_tier and layout is not None:
        row_max = jnp.maximum(
            row_max, jnp.maximum(_segment_max_small(t1, safe1, g),
                                 _segment_max_small(t2, safe2, g)))

    # per-class thresholds, indexed by the matched GT's class
    c = max(num_classes, 1)
    pos_thr = (jnp.asarray(pos_thr, jnp.float32)
               * jnp.ones((c,), jnp.float32))
    neg_thr = (jnp.asarray(neg_thr, jnp.float32)
               * jnp.ones((c,), jnp.float32))
    lbl_safe = jnp.clip(gt_labels, 0, c - 1)
    anchor_lbl = lbl_safe[best_gt_clipped]

    pos = max_overlap >= pos_thr[anchor_lbl]
    # sound negatives (tier 4): below threshold among EVALUATED pairs and
    # provably below threshold for every unevaluated pair — either by SAT
    # disjointness (true IoU 0) or by the capped upper bound
    neg = ((max_overlap < neg_thr[anchor_lbl])
           & (~overlap_possible | (unev_bound < jnp.min(neg_thr))))

    # low-quality rescue (reference model/PointPillars.py:976-978), with
    # each GT's own class threshold; achievers of the merged per-GT row
    # max on either path
    rescue_ok = (row_max >= neg_thr[lbl_safe]) & gt_mask  # (G,)
    rescue = (exact >= row_max[:, None]) & rescue_ok[:, None] & (exact > 0)
    pos_extra = jnp.zeros((n,), bool).at[flat_idx].max(rescue.reshape(-1))
    # tier achievers of their GT's row max
    pos_extra |= (t1 >= row_max[safe1]) & rescue_ok[safe1] & (t1 > 0)
    pos_extra |= (t2 >= row_max[safe2]) & rescue_ok[safe2] & (t2 > 0)
    if layout is not None and use_pallas:
        def cont_rescue_chunk(idx_chunk):
            return containment_rescue(
                gt_boxes[idx_chunk], gt_mask[idx_chunk],
                row_max[idx_chunk], rescue_ok[idx_chunk], layout,
                cellc_pad, combo_tab, interpret=interp)

        cr = jax.lax.map(cont_rescue_chunk, chunks)  # (chunks, M, Ncp)
        pos_extra |= mm_to_flat(jnp.any(cr > 0, axis=0))
    elif layout is not None:
        def cont_rescue_chunk(idx_chunk):
            iou = _chunk_geometry(gt_boxes[idx_chunk], gt_mask[idx_chunk],
                                  layout, cell_on_v)["iou"]
            hit = ((iou >= row_max[idx_chunk][:, None, None])
                   & rescue_ok[idx_chunk][:, None, None] & (iou > 0))
            return jnp.any(hit, axis=0)

        cr = jax.lax.map(cont_rescue_chunk, chunks)
        pos_extra |= jnp.any(cr, axis=0).reshape(n)
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
