"""SCORECARD v2 diagnostics: score_thr sweep + error taxonomy.

The round-4 scorecard pinned P=25 / R=64 / F1=35.96 on the overfit anchor
scene without asking WHY precision sits at 25% after 200 memorization
epochs (VERDICT r4 weak #6).  This tool answers it: it regenerates the
rehearsal's single overfit scene (tools/e2e_rehearsal.write_scene,
seed 7 — train == val == test in overfit mode), runs the trained
checkpoint's predict program ONCE with score_thr 0.01, then

* sweeps the decision threshold on the host (post-NMS approximation of
  the pipeline's pre-NMS threshold; NMS at nms_thresh=1e-5 suppresses by
  ANY overlap, so the approximation only misses resurrection of boxes a
  sub-threshold box suppressed), reporting P/R/F1 per threshold, and
* classifies every detection at the pinned 0.05 operating point:
  TP (best match >= overlap), DUPLICATE (above-overlap match to a GT
  whose best match is another detection), LOCALIZATION (0 < IoU <
  overlap), HALLUCINATION (IoU == 0 against every GT).

Usage: python tools/scorecard_sweep.py
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import __graft_entry__ as g  # noqa: E402
from bench import load_trained_ckpt  # noqa: E402
from e2e_rehearsal import write_scene  # noqa: E402
from objectdetection_3d_tpu.dataset.forest import ForestSplit  # noqa: E402
from objectdetection_3d_tpu.metrics import MetricEvaluator  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402

OVERLAP = 0.1  # the pipeline metric threshold (config.yaml overlaps)
PINNED_THR = 0.05  # the rehearsal's operating point (e2e_rehearsal.py)


def main():
    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        write_scene(d, "anchor", seed=7)
        cloud = np.load(d / "anchor.npy").astype(np.float32)
        boxes = ForestSplit._boxes_from_disk(str(d / "anchor_bbx.npy"))
    shift = cloud[:, :3].min(axis=0)
    cloud[:, :3] -= shift
    boxes[:, :3] -= shift
    boxes = boxes.astype(np.float32)

    trained = load_trained_ckpt()
    model = PointPillars(**g._flagship_cfg())
    model.head_cfg["score_thr"] = 0.01  # sweep floor; host filters above
    tvars = {"params": trained["params"],
             "batch_stats": trained["batch_stats"]}

    data = model.preprocess({"point": cloud, "bboxes": boxes,
                             "labels": np.zeros(len(boxes))},
                            {"split": "test", "name": "anchor"})
    pts = np.asarray(data["point"], np.float32)
    gt = np.asarray(data["bboxes"], np.float32)
    max_pts = int(model.tpu_cfg["max_points_static"])
    assert pts.shape[0] <= max_pts
    batch_pts = np.zeros((1, max_pts, pts.shape[1]), np.float32)
    batch_pts[0, :len(pts)] = pts
    batch = {"points": batch_pts,
             "num_points": np.asarray([len(pts)], np.int32)}

    predict = model.make_predict_fn()
    t0 = time.time()
    out = jax.device_get(predict(tvars, batch))
    print(f"predict (incl compile): {time.time() - t0:.0f}s", flush=True)
    valid = out["valid"][0]
    det_boxes = out["bbox"][0][valid]
    det_scores = out["score"][0][valid]
    det_labels = out["label"][0][valid]
    print(f"scene: {len(pts)} pts, {len(gt)} GT trees, "
          f"{len(det_boxes)} detections at thr 0.01", flush=True)

    me = MetricEvaluator(eval_dim=3)
    target = {"bbox": gt, "label": np.zeros(len(gt), np.int64)}

    print("\n| score_thr | dets | precision | recall | F1 |")
    print("|---|---|---|---|---|")
    rows = []
    for thr in (0.01, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8):
        keep = det_scores >= thr
        pred = {"bbox": det_boxes[keep],
                "score": det_scores[keep],
                "label": det_labels[keep].astype(np.int64)}
        p, r = me.evaluate([pred], [target], [0], [OVERLAP])
        p, r = float(p[0, 0]), float(r[0, 0])
        f1 = 2 * p * r / max(p + r, 1e-9)
        rows.append((thr, int(keep.sum()), p, r, f1))
        print(f"| {thr:.2f} | {int(keep.sum())} | {p:.1f} | {r:.1f} "
              f"| {f1:.2f} |", flush=True)
    best = max(rows, key=lambda r: r[4])
    print(f"\nbest F1 {best[4]:.2f} at thr {best[0]:.2f} "
          f"(P {best[2]:.1f} / R {best[3]:.1f})")

    # ---- error taxonomy at the pinned operating point ----
    keep = det_scores >= PINNED_THR
    db = det_boxes[keep]
    ds = det_scores[keep]
    iou = me._overlap(db, gt)                       # (P, T)
    best_det_of_gt = np.argmax(iou, axis=0) if len(db) else np.array([])
    kinds = []
    for i in range(len(db)):
        row = iou[i]
        if row.max() <= 0.0:
            kinds.append("hallucination")
        elif row.max() < OVERLAP:
            kinds.append("localization")
        elif np.any((best_det_of_gt == i) & (row >= OVERLAP)):
            kinds.append("tp")
        else:
            kinds.append("duplicate")
    kinds = np.asarray(kinds)
    missed = int(np.sum(np.all(iou < OVERLAP, axis=0))) if len(db) \
        else len(gt)
    print(f"\nerror taxonomy at thr {PINNED_THR} "
          f"({len(db)} detections, {len(gt)} GTs):")
    for k in ("tp", "duplicate", "localization", "hallucination"):
        n = int(np.sum(kinds == k))
        sc = ds[kinds == k]
        rng = (f"scores {sc.min():.2f}-{sc.max():.2f}"
               if len(sc) else "")
        print(f"  {k:14s} {n:4d}  {rng}")
    print(f"  {'missed GTs':14s} {missed:4d}")
    if len(db):
        dup_iou = iou[kinds == "duplicate"]
        if len(dup_iou):
            print(f"  duplicate best-IoU range: "
                  f"{dup_iou.max(1).min():.3f}-{dup_iou.max(1).max():.3f}")


if __name__ == "__main__":
    main()
