"""Interpret-mode parity: fused assignment-geometry kernel vs XLA path.

The Pallas kernel (ops/assign_geometry.py) must reproduce
``models/assign._chunk_geometry`` plus the scan-body reductions exactly
(same containment IoUs, SAT flags, ranking keys, top-3 slots and row
maxima) — it is the TPU fast path of the same tiered assignment
(reference being replaced: model/PointPillars.py:886-1000).
"""

import numpy as np
import jax.numpy as jnp

from objectdetection_3d_tpu.models.assign import (
    _chunk_geometry,
    _top3_merge,
    make_anchor_layout,
)
from objectdetection_3d_tpu.ops.assign_geometry import (
    _combo_table,
    _pad_cells,
    chunk_geometry,
    containment_rescue,
)
from objectdetection_3d_tpu.ops.boxes import rotation_matrices


def _tiny_layout(rng, nc=40):
    sizes = np.array([[0.8, 0.8, 2.0], [1.0, 1.5, 3.0]], np.float32)
    rots = np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.8]], np.float32)
    cells = rng.uniform(0, 8, (nc, 3)).astype(np.float32)
    anchors = []
    for c in range(nc):
        for s in sizes:
            for r in rots:
                anchors.append(np.concatenate([cells[c], s, r]))
    anchors = np.asarray(anchors, np.float32)
    m = len(sizes) * len(rots)
    return anchors, make_anchor_layout(anchors, m), m


def _gt_chunk(rng, gch=5):
    gt = np.zeros((gch, 9), np.float32)
    gt[:, :3] = rng.uniform(0, 8, (gch, 3))
    gt[:, 3:6] = rng.uniform([0.5, 0.5, 1.0], [2.0, 2.0, 4.0], (gch, 3))
    gt[:, 6:9] = rng.uniform(-0.4, 0.4, (gch, 3))
    mask = np.ones((gch,), bool)
    mask[-1] = False
    return gt, mask


def test_geometry_kernel_matches_xla_chunk():
    rng = np.random.default_rng(0)
    anchors, layout, m = _tiny_layout(rng)
    gt, mask = _gt_chunk(rng)
    gch = gt.shape[0]
    nc = layout[0].shape[0]
    n = nc * m
    sentinel = 7  # pretend total GT count

    layout_j = tuple(jnp.asarray(a) for a in layout)
    cellc, crot = layout_j[0], layout_j[1]
    cell_on_v = jnp.einsum("nc,mcj->nmj", cellc, crot)
    geo = _chunk_geometry(jnp.asarray(gt), jnp.asarray(mask), layout_j,
                          cell_on_v)
    # (g, Nc, M) -> m-major (g, M, Nc)
    key_ref = np.asarray(geo["key"]).transpose(0, 2, 1)
    iou_ref = np.asarray(geo["iou"]).transpose(0, 2, 1)
    maybe_ref = np.asarray(geo["maybe"]).transpose(0, 2, 1)

    gid = jnp.arange(gch, dtype=jnp.int32)
    cellc_pad, _ = _pad_cells(layout[0])
    combo = jnp.asarray(_combo_table(layout))
    out = chunk_geometry(jnp.asarray(gt), jnp.asarray(mask), gid,
                         layout, jnp.asarray(cellc_pad), combo,
                         sentinel, interpret=True)

    ncp = out["key"].shape[-1]
    key_k = np.asarray(out["key"])[:, :, :nc]
    np.testing.assert_allclose(key_k, key_ref, rtol=1e-5, atol=1e-6)

    # containment running max/best
    cm_ref = iou_ref.max(axis=0)
    ach = iou_ref >= cm_ref[None]
    cb_ref = np.where(
        cm_ref > 0,
        np.min(np.where(ach, np.arange(gch)[:, None, None], sentinel),
               axis=0), sentinel)
    np.testing.assert_allclose(
        np.asarray(out["cm"])[:, :nc], cm_ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out["cb"])[:, :nc], cb_ref)

    # SAT possible
    np.testing.assert_array_equal(
        np.asarray(out["mb"])[:, :nc].astype(bool),
        maybe_ref.any(axis=0))

    # top-3 by key, replicated with the assign-module merge on flat rows
    neg_inf = jnp.full((n,), -jnp.inf)
    gsent = jnp.full((n,), sentinel, jnp.int32)
    v1, a1, v2, a2, v3, a3 = (neg_inf, gsent, neg_inf, gsent,
                              neg_inf, gsent)
    key_flat = key_ref.reshape(gch, n)  # m-major flat
    for g in range(gch):
        v1, a1, v2, a2, v3, a3 = _top3_merge(
            v1, a1, v2, a2, v3, a3,
            jnp.asarray(key_flat[g]),
            jnp.full((n,), g, jnp.int32))
    for name, ref in (("v1", v1), ("a1", a1), ("v2", v2), ("a2", a2),
                      ("v3", v3), ("a3", a3)):
        got = np.asarray(out[name])[:, :nc].reshape(-1)
        np.testing.assert_allclose(
            got, np.asarray(ref), rtol=1e-5, atol=1e-6,
            err_msg=name)

    # per-GT containment row maxima
    np.testing.assert_allclose(
        np.asarray(out["rmax"])[:, :nc].max(axis=1),
        iou_ref.reshape(gch, -1).max(axis=1), rtol=1e-6, atol=1e-7)

    # padding cells never rank: far below any real anchor's key
    # (>= -1e-6 * scene diagonal) for every valid GT row
    if ncp > nc:
        assert np.all(np.asarray(out["key"])[:, :, nc:] <= -100.0)


def test_rescue_kernel_matches_xla():
    rng = np.random.default_rng(1)
    anchors, layout, m = _tiny_layout(rng)
    gt, mask = _gt_chunk(rng)
    gch = gt.shape[0]
    nc = layout[0].shape[0]

    layout_j = tuple(jnp.asarray(a) for a in layout)
    cellc, crot = layout_j[0], layout_j[1]
    cell_on_v = jnp.einsum("nc,mcj->nmj", cellc, crot)
    iou = np.asarray(
        _chunk_geometry(jnp.asarray(gt), jnp.asarray(mask), layout_j,
                        cell_on_v)["iou"]).transpose(0, 2, 1)

    row_max = iou.reshape(gch, -1).max(axis=1) * 0.99  # achievable
    rescue_ok = np.array([True, True, False, True, True])
    hit_ref = ((iou >= row_max[:, None, None])
               & rescue_ok[:, None, None] & (iou > 0)).any(axis=0)

    cellc_pad, _ = _pad_cells(layout[0])
    combo = jnp.asarray(_combo_table(layout))
    out = containment_rescue(
        jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(row_max),
        jnp.asarray(rescue_ok), layout, jnp.asarray(cellc_pad), combo,
        interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out)[:, :nc].astype(bool), hit_ref)


def test_assign_targets_pallas_geometry_matches_xla():
    """Whole assign_targets: fused-kernel path == XLA path (tiny scale)."""
    from objectdetection_3d_tpu.models.assign import assign_targets

    rng = np.random.default_rng(2)
    anchors, layout, m = _tiny_layout(rng, nc=60)
    gt, mask = _gt_chunk(rng, gch=6)
    labels = np.zeros((6,), np.int32)
    layout_j = tuple(jnp.asarray(a) for a in layout)

    kwargs = dict(
        candidates_per_gt=32, gt_chunk=3, prefilter="full",
        layout=layout_j, exact_anchor_tier=True)
    ref = assign_targets(jnp.asarray(anchors), jnp.asarray(gt),
                         jnp.asarray(labels), jnp.asarray(mask),
                         0.2, 0.08, geometry="xla", **kwargs)
    out = assign_targets(jnp.asarray(anchors), jnp.asarray(gt),
                         jnp.asarray(labels), jnp.asarray(mask),
                         0.2, 0.08, geometry="pallas_interpret", **kwargs)
    np.testing.assert_array_equal(np.asarray(out["pos_mask"]),
                                  np.asarray(ref["pos_mask"]))
    np.testing.assert_array_equal(np.asarray(out["neg_mask"]),
                                  np.asarray(ref["neg_mask"]))
    pos = np.asarray(ref["pos_mask"])
    np.testing.assert_array_equal(np.asarray(out["best_gt"])[pos],
                                  np.asarray(ref["best_gt"])[pos])
    np.testing.assert_allclose(np.asarray(out["max_overlap"]),
                               np.asarray(ref["max_overlap"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["target_labels"]),
                                  np.asarray(ref["target_labels"]))
