"""One-off TPU artifact: approx vs block assignment prefilter at flagship
scale (VERDICT r2 weak #6 / next #7b).

Compares `assign_prefilter: approx` (lax.approx_max_k, recall 0.99) against
the exact `block` prefilter on the REAL workload shape — N=1.92M anchors,
G=128 GT boxes — and reports whether the resulting pos/neg masks and
targets differ.  Run on the TPU chip:

    python tools/check_prefilter.py

The result is recorded in ROADMAP.md ("assignment prefilter").
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    from objectdetection_3d_tpu.models import PointPillars
    from objectdetection_3d_tpu.models.assign import assign_targets

    model = PointPillars(**g._flagship_cfg())
    n = model.anchors.shape[0]
    gt_budget = model.tpu_cfg["max_gt_static"]
    print(f"anchors N={n:,}  G={gt_budget}", file=sys.stderr)

    # realistic GT: trees scattered over the scene at reference-like sizes
    rng = np.random.default_rng(0)
    g_boxes = np.zeros((gt_budget, 9), np.float32)
    g_boxes[:, 0] = rng.uniform(2, 38, gt_budget)
    g_boxes[:, 1] = rng.uniform(2, 38, gt_budget)
    g_boxes[:, 2] = 0.0
    g_boxes[:, 3:6] = rng.uniform([0.5, 0.5, 8], [2.0, 2.0, 22],
                                  (gt_budget, 3))
    g_boxes[:, 6:8] = rng.uniform(-0.35, 0.35, (gt_budget, 2))
    g_boxes[:, 8] = rng.uniform(-np.pi, np.pi, gt_budget)
    labels = np.zeros((gt_budget,), np.int32)
    mask = np.ones((gt_budget,), bool)

    def run(prefilter):
        fn = jax.jit(lambda gb, lb, mk: assign_targets(
            model.anchors, gb, lb, mk,
            pos_thr=model._pos_thr, neg_thr=model._neg_thr,
            candidates_per_gt=int(model.tpu_cfg["assign_candidates_per_gt"]),
            num_classes=model.num_classes,
            anchor_aabb=model.anchor_aabb,
            prefilter=prefilter,
            prefilter_block=int(
                model.tpu_cfg.get("assign_prefilter_block", 128))))
        out = fn(jnp.asarray(g_boxes), jnp.asarray(labels),
                 jnp.asarray(mask))
        float(out["num_pos"])  # sync
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = fn(jnp.asarray(g_boxes), jnp.asarray(labels),
                     jnp.asarray(mask))
            float(out["num_pos"])
        dt = (time.time() - t0) / reps
        return {k: np.asarray(v) for k, v in out.items()}, dt

    approx, t_a = run("approx")
    block, t_b = run("block")

    print(f"timing: approx {t_a * 1000:.1f} ms  block {t_b * 1000:.1f} ms "
          "(incl ~27ms RPC sync)", file=sys.stderr)
    report = {}
    for key in ("pos_mask", "neg_mask", "target_labels", "dir_targets"):
        diff = int(np.sum(approx[key] != block[key]))
        report[key] = diff
    report["num_pos_approx"] = int(approx["num_pos"])
    report["num_pos_block"] = int(block["num_pos"])
    d = np.abs(approx["target_deltas"] - block["target_deltas"])
    # deltas only matter where pos agrees
    both_pos = approx["pos_mask"] & block["pos_mask"]
    report["max_delta_diff_at_pos"] = float(
        d[both_pos].max() if both_pos.any() else 0.0)
    print(report)
    identical = (all(report[k] == 0 for k in
                     ("pos_mask", "neg_mask", "target_labels",
                      "dir_targets"))
                 and report["num_pos_approx"] == report["num_pos_block"]
                 and report["max_delta_diff_at_pos"] == 0.0)
    print("IDENTICAL" if identical else "DIFFERS")


if __name__ == "__main__":
    main()
