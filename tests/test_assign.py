"""Target assignment vs a brute-force oracle of the reference rules."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.models.anchors import (  # noqa: E402
    Anchor3DRangeGenerator,
    BBoxCoder,
)
from objectdetection_3d_tpu.models.assign import assign_targets  # noqa: E402
from objectdetection_3d_tpu.ops.iou3d import iou3d  # noqa: E402


def oracle_assign(iou, pos_thr, neg_thr, labels=None):
    """Reference matching rules on a dense (G, N) IoU matrix
    (model/PointPillars.py:964-978).  ``pos_thr``/``neg_thr`` may be
    per-class arrays indexed by each anchor's best-match GT label
    (per-class loop with iou_thr[j], model/PointPillars.py:937-944)."""
    max_overlap = iou.max(axis=0) if iou.shape[0] else np.zeros(iou.shape[1])
    argmax = iou.argmax(axis=0) if iou.shape[0] else np.zeros(
        iou.shape[1], int)
    pos_thr = np.atleast_1d(np.asarray(pos_thr, np.float64))
    neg_thr = np.atleast_1d(np.asarray(neg_thr, np.float64))
    if labels is None:
        labels = np.zeros(max(iou.shape[0], 1), int)
    lbl = np.asarray(labels)[argmax] if iou.shape[0] else np.zeros(
        iou.shape[1], int)
    pt = pos_thr[lbl] if pos_thr.size > 1 else pos_thr[0]
    nt = neg_thr[lbl] if neg_thr.size > 1 else neg_thr[0]
    pos = max_overlap >= pt
    neg = max_overlap < nt
    for g in range(iou.shape[0]):
        gt_max = iou[g].max()
        g_nt = neg_thr[labels[g]] if neg_thr.size > 1 else neg_thr[0]
        if gt_max >= g_nt:
            pos[iou[g] == gt_max] = True
    neg = neg & ~pos
    return pos, neg, argmax, max_overlap


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 8.0, 8.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors = jnp.asarray(gen.flat_anchors((16, 16)))

    g_valid = 3
    gt = np.zeros((4, 9), np.float32)
    gt[:g_valid, :2] = rng.uniform(1, 7, (g_valid, 2))
    gt[:g_valid, 2] = 0.0
    gt[:g_valid, 3:6] = rng.uniform(0.6, 1.2, (g_valid, 3)) * [1, 1, 2.5]
    gt[:g_valid, 8] = rng.uniform(-np.pi, np.pi, g_valid)
    gt_mask = np.arange(4) < g_valid
    labels = np.zeros(4, np.int32)

    out = assign_targets(anchors, jnp.asarray(gt), jnp.asarray(labels),
                         jnp.asarray(gt_mask), pos_thr=0.2, neg_thr=0.08,
                         candidates_per_gt=128, gt_chunk=4)

    dense = np.asarray(iou3d(jnp.asarray(gt[:g_valid]), anchors,
                             row_chunk=4))
    pos, neg, argmax, max_overlap = oracle_assign(dense, 0.2, 0.08)

    np.testing.assert_array_equal(np.asarray(out["pos_mask"]), pos)
    np.testing.assert_array_equal(np.asarray(out["neg_mask"]), neg)
    np.testing.assert_allclose(np.asarray(out["max_overlap"]),
                               max_overlap, atol=1e-5)
    # best gt must agree wherever positive
    np.testing.assert_array_equal(
        np.asarray(out["best_gt"])[pos], argmax[pos])
    assert int(out["num_pos"]) == int(pos.sum())


@pytest.mark.parametrize("seed", [0, 3])
def test_two_classes_distinct_thresholds(seed):
    """Per-class iou_thr: class 0 uses (0.08, 0.2), class 1 a much stricter
    (0.3, 0.55) — the brute-force oracle applies each anchor's matched-GT
    class threshold."""
    rng = np.random.default_rng(seed)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 8.0, 8.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5], [1.4, 1.4, 2.0]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors = jnp.asarray(gen.flat_anchors((16, 16)))

    g_valid = 4
    gt = np.zeros((6, 9), np.float32)
    gt[:g_valid, :2] = rng.uniform(1, 7, (g_valid, 2))
    gt[:g_valid, 2] = 0.0
    gt[:g_valid, 3:6] = rng.uniform(0.6, 1.4, (g_valid, 3)) * [1, 1, 2.2]
    gt[:g_valid, 8] = rng.uniform(-np.pi, np.pi, g_valid)
    gt_mask = np.arange(6) < g_valid
    labels = np.zeros(6, np.int32)
    labels[:g_valid] = rng.integers(0, 2, g_valid)
    labels[0] = 1  # make sure class 1 appears

    pos_thr = np.array([0.2, 0.55], np.float32)
    neg_thr = np.array([0.08, 0.3], np.float32)
    out = assign_targets(anchors, jnp.asarray(gt), jnp.asarray(labels),
                         jnp.asarray(gt_mask),
                         pos_thr=jnp.asarray(pos_thr),
                         neg_thr=jnp.asarray(neg_thr),
                         candidates_per_gt=128, gt_chunk=4, num_classes=2)

    dense = np.asarray(iou3d(jnp.asarray(gt[:g_valid]), anchors,
                             row_chunk=4))
    pos, neg, argmax, max_overlap = oracle_assign(
        dense, pos_thr, neg_thr, labels=labels[:g_valid])

    np.testing.assert_array_equal(np.asarray(out["pos_mask"]), pos)
    np.testing.assert_array_equal(np.asarray(out["neg_mask"]), neg)
    np.testing.assert_array_equal(
        np.asarray(out["best_gt"])[pos], argmax[pos])
    # positive anchors carry their matched GT's label
    np.testing.assert_array_equal(
        np.asarray(out["target_labels"])[pos], labels[argmax[pos]])
    assert int(out["num_pos"]) == int(pos.sum())
    assert pos.sum() > 0


def test_targets_and_dirs():
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 8.0, 8.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5]],
        rotations=[[0.0, 0.0, 0.0]],
    )
    anchors = jnp.asarray(gen.flat_anchors((8, 8)))
    gt = np.zeros((2, 9), np.float32)
    # centered exactly on an anchor (endpoint-inclusive 8-point grid)
    cx = 8.0 * 3 / 7
    gt[0] = [cx, cx, 0.0, 0.8, 0.8, 2.5, 0.0, 0.0, 4.0]  # rz=4 rad
    gt_mask = np.array([True, False])
    labels = np.zeros(2, np.int32)

    out = assign_targets(anchors, jnp.asarray(gt), jnp.asarray(labels),
                         jnp.asarray(gt_mask), pos_thr=0.2, neg_thr=0.08,
                         candidates_per_gt=16, gt_chunk=2)
    pos = np.asarray(out["pos_mask"])
    assert pos.sum() >= 1
    # encoded targets match the coder on positive anchors
    deltas = np.asarray(out["target_deltas"])[pos]
    want = np.asarray(BBoxCoder.encode(
        anchors[np.where(pos)[0]], jnp.asarray(np.tile(gt[0], (pos.sum(),
                                                              1)))))
    np.testing.assert_allclose(deltas, want, atol=1e-5)
    # rz=4 -> wrapped to [0, 2pi) = 4.0, bin = floor(4/pi) % 2 = 1
    dirs = np.asarray(out["dir_targets"])[pos]
    np.testing.assert_array_equal(dirs[:, 2], 1)
    np.testing.assert_array_equal(dirs[:, 0], 0)


def test_no_valid_gt():
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 8.0, 8.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5]],
        rotations=[[0.0, 0.0, 0.0]],
    )
    anchors = jnp.asarray(gen.flat_anchors((8, 8)))
    gt = np.zeros((2, 9), np.float32)
    gt_mask = np.zeros(2, bool)
    labels = np.zeros(2, np.int32)
    out = assign_targets(anchors, jnp.asarray(gt), jnp.asarray(labels),
                         jnp.asarray(gt_mask), pos_thr=0.2, neg_thr=0.08,
                         candidates_per_gt=16, gt_chunk=2)
    assert int(out["num_pos"]) == 0
    assert np.all(np.asarray(out["neg_mask"]))


@pytest.mark.parametrize("seed", [0, 5])
def test_containment_recovers_reference_positives(seed):
    """GT boxes that fully contain many anchors: the upper-bound top-K
    prefilter alone cannot find those positives (flat ties), the
    containment fast path must.  With the anchor-grid layout the output
    matches the brute-force reference oracle; without it positives are
    provably missing (the r2 flagship failure, tools/check_assign_exact.py
    measured 385 of 22,346)."""
    from objectdetection_3d_tpu.models.assign import make_anchor_layout

    rng = np.random.default_rng(seed)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 16.0, 16.0, 6.0]],
        sizes=[[1.2, 1.2, 3.0]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors_np = gen.flat_anchors((32, 32))
    anchors = jnp.asarray(anchors_np)
    layout = tuple(jnp.asarray(a)
                   for a in make_anchor_layout(anchors_np, 2))

    g_valid = 5
    gt = np.zeros((6, 9), np.float32)
    gt[:g_valid, :2] = rng.uniform(3, 13, (g_valid, 2))
    gt[:g_valid, 2] = -0.3
    # ~0.27 volume ratio: contained anchors are positive at thr 0.2
    gt[:g_valid, 3:6] = [2.0, 2.0, 4.0]
    gt[:g_valid, 6:8] = rng.uniform(-0.1, 0.1, (g_valid, 2))
    gt[:g_valid, 8] = rng.uniform(-np.pi, np.pi, g_valid)
    gt_mask = np.arange(6) < g_valid
    labels = np.zeros(6, np.int32)
    args = (anchors, jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(gt_mask))
    kw = dict(pos_thr=0.2, neg_thr=0.08, candidates_per_gt=64, gt_chunk=4)

    out = assign_targets(*args, **kw, layout=layout)
    dense = np.asarray(iou3d(jnp.asarray(gt[:g_valid]), anchors,
                             row_chunk=4))
    pos, neg, argmax, max_overlap = oracle_assign(dense, 0.2, 0.08)
    assert pos.sum() > 10, "scene should have many contained positives"

    np.testing.assert_array_equal(np.asarray(out["pos_mask"]), pos)
    np.testing.assert_allclose(np.asarray(out["max_overlap"])[pos],
                               max_overlap[pos], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["best_gt"])[pos],
                                  argmax[pos])
    # sound negatives: never label an anchor negative that the reference
    # does not (extra ignores are the one permitted deviation)
    ours_neg = np.asarray(out["neg_mask"])
    assert not np.any(ours_neg & ~neg)

    # and the old failure mode really exists: without the layout a tight
    # candidate budget misses contained positives (at flagship scale even
    # K=512 recovers only ~2%), while the containment path is
    # budget-independent
    kw_tight = dict(kw, candidates_per_gt=8)
    out_nolayout = assign_targets(*args, **kw_tight)
    out_tight = assign_targets(*args, **kw_tight, layout=layout)
    assert int(out_nolayout["num_pos"]) < pos.sum()
    # contained positives are candidate-budget-independent: every anchor
    # whose volume ratio clears the threshold while fully inside a GT is
    # found even at K=8 (ring positives legitimately need candidates)
    contained = max_overlap >= 0.2
    vols = np.prod(anchors_np[:, 3:6], -1)
    ratio_pos = np.zeros(len(anchors_np), bool)
    for gi in range(g_valid):
        ratio_pos |= np.isclose(dense[gi], vols / np.prod(gt[gi, 3:6]),
                                atol=1e-5) & (dense[gi] >= 0.2)
    tight_pos = np.asarray(out_tight["pos_mask"])
    assert np.all(tight_pos[ratio_pos & contained])


@pytest.mark.parametrize("seed", [1, 7])
def test_exact_anchor_tier_recovers_ring_positives(seed):
    """Partial-overlap positives beyond the per-GT candidate budget —
    neither contained (tier 1 blind) nor inside the top-K (budget too
    tight) — must be recovered by the exact anchor tier, which clips
    every anchor against its top-2 key GTs (the r3 flagship gap:
    K=2048 still missed 41% of reference positives,
    tools/check_assign_exact.py)."""
    from objectdetection_3d_tpu.models.assign import make_anchor_layout

    rng = np.random.default_rng(seed)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 16.0, 16.0, 6.0]],
        sizes=[[1.2, 1.2, 3.0]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors_np = gen.flat_anchors((32, 32))
    anchors = jnp.asarray(anchors_np)
    layout = tuple(jnp.asarray(a)
                   for a in make_anchor_layout(anchors_np, 2))

    # anchor-sized GTs: the high-IoU ring is pure partial overlap (no
    # containment is possible between equal-volume boxes)
    g_valid = 6
    gt = np.zeros((8, 9), np.float32)
    gt[:g_valid, :2] = rng.uniform(3, 13, (g_valid, 2))
    gt[:g_valid, 2] = rng.uniform(-0.2, 0.2, g_valid)
    gt[:g_valid, 3:6] = [1.4, 1.4, 3.2]
    gt[:g_valid, 6:8] = rng.uniform(-0.05, 0.05, (g_valid, 2))
    gt[:g_valid, 8] = rng.uniform(-np.pi, np.pi, g_valid)
    gt_mask = np.arange(8) < g_valid
    labels = np.zeros(8, np.int32)
    args = (anchors, jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(gt_mask))
    # K=2 starves the candidate path on purpose
    kw = dict(pos_thr=0.2, neg_thr=0.08, candidates_per_gt=2, gt_chunk=4)

    dense = np.asarray(iou3d(jnp.asarray(gt[:g_valid]), anchors,
                             row_chunk=4))
    pos, neg, argmax, max_overlap = oracle_assign(dense, 0.2, 0.08)
    assert pos.sum() > 2 * g_valid * kw["candidates_per_gt"], \
        "scene must have far more ring positives than the budget"

    out_notier = assign_targets(*args, **kw, layout=layout,
                                exact_anchor_tier=False)
    out = assign_targets(*args, **kw, layout=layout)
    assert int(out_notier["num_pos"]) < pos.sum()
    np.testing.assert_array_equal(np.asarray(out["pos_mask"]), pos)
    np.testing.assert_allclose(np.asarray(out["max_overlap"])[pos],
                               max_overlap[pos], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["best_gt"])[pos],
                                  argmax[pos])
    # soundness holds with and without the tier: no anchor the reference
    # keeps (positive or ignore) may be labeled negative
    for o in (out, out_notier):
        assert not np.any(np.asarray(o["neg_mask"]) & ~neg)


def test_blockwise_prefilter_matches_full():
    """The two-level exact top-k prefilter must reproduce the plain
    lax.top_k assignment bit-for-bit (ties aside, which random floats
    make improbable) on a grid large enough for several blocks."""
    rng = np.random.default_rng(11)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 16.0, 16.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5], [1.2, 1.2, 3.0]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors = jnp.asarray(gen.flat_anchors((48, 48)))  # 9216 anchors

    g_valid = 6
    gt = np.zeros((8, 9), np.float32)
    gt[:g_valid, :2] = rng.uniform(1, 15, (g_valid, 2))
    gt[:g_valid, 3:6] = rng.uniform(0.6, 1.4, (g_valid, 3)) * [1, 1, 2.5]
    gt[:g_valid, 8] = rng.uniform(-np.pi, np.pi, g_valid)
    gt_mask = np.arange(8) < g_valid
    labels = np.zeros(8, np.int32)
    args = (anchors, jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(gt_mask))
    kw = dict(pos_thr=0.2, neg_thr=0.08, candidates_per_gt=256, gt_chunk=4)

    full = assign_targets(*args, **kw, prefilter="full")
    # block size that doesn't divide N exercises the padding tail
    blk = assign_targets(*args, **kw, prefilter="block",
                         prefilter_block=100)
    approx = assign_targets(*args, **kw, prefilter="approx")
    for key in full:
        np.testing.assert_array_equal(np.asarray(full[key]),
                                      np.asarray(blk[key]),
                                      err_msg=f"block:{key}")
        np.testing.assert_array_equal(np.asarray(full[key]),
                                      np.asarray(approx[key]),
                                      err_msg=f"approx:{key}")


def test_padded_gt_chunks_match_unpadded():
    """G not divisible by gt_chunk wraps padding rows onto real GTs;
    those duplicates must be masked out of the per-anchor top-3 key
    merge (a duplicated GT would otherwise occupy BOTH exact-tier
    slots and the true second-best GT would never be exactly clipped).
    The padded chunking must reproduce the unpadded assignment."""
    rng = np.random.default_rng(21)
    gen = Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 8.0, 8.0, 4.0]],
        sizes=[[0.8, 0.8, 2.5]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57]],
    )
    anchors = jnp.asarray(gen.flat_anchors((16, 16)))

    g_valid = 7
    gt = np.zeros((7, 9), np.float32)
    # overlapping pairs so anchors genuinely have a 2nd-best GT
    base = rng.uniform(2, 6, (4, 2))
    jitter = np.concatenate([base, base[:3] + rng.uniform(0.2, 0.5, (3, 2))])
    gt[:, :2] = jitter
    gt[:, 3:6] = rng.uniform(0.7, 1.3, (7, 3)) * [1, 1, 2.5]
    gt[:, 8] = rng.uniform(-np.pi, np.pi, 7)
    gt_mask = np.ones(7, bool)
    labels = np.zeros(7, np.int32)
    args = (anchors, jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(gt_mask))
    kw = dict(pos_thr=0.2, neg_thr=0.08, candidates_per_gt=128)

    unpadded = assign_targets(*args, **kw, gt_chunk=7)   # 7 % 7 == 0
    padded = assign_targets(*args, **kw, gt_chunk=3)     # 7 -> pad 2
    for key in unpadded:
        np.testing.assert_array_equal(np.asarray(unpadded[key]),
                                      np.asarray(padded[key]),
                                      err_msg=key)
