"""One-off: break down the flagship-scale assignment cost on v5e.

Times assign_targets variants (layout+tier / layout only / no layout)
and the Pallas aligned clipper alone, to locate where the ~624 ms/call
(ROADMAP r3 table) goes.  Pipelined timing: many calls queued, one
scalar readback at the end (axon RPC sync is ~27 ms per synced call).

    python tools/profile_assign.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].sum())


def main():
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    from objectdetection_3d_tpu.models import PointPillars
    from objectdetection_3d_tpu.models.assign import (
        assign_targets, make_anchor_layout)
    from objectdetection_3d_tpu.ops.pallas_iou3d import (
        intersection_volume_aligned)

    model = PointPillars(**g._flagship_cfg())
    anchors = jnp.asarray(model.anchors)
    n = anchors.shape[0]
    gt_budget = model.tpu_cfg["max_gt_static"]
    rng = np.random.default_rng(0)
    g_boxes = np.zeros((gt_budget, 9), np.float32)
    g_boxes[:, 0] = rng.uniform(2, 38, gt_budget)
    g_boxes[:, 1] = rng.uniform(2, 38, gt_budget)
    g_boxes[:, 3:6] = rng.uniform([0.5, 0.5, 8], [2.0, 2.0, 22],
                                  (gt_budget, 3))
    g_boxes[:, 6:8] = rng.uniform(-0.35, 0.35, (gt_budget, 2))
    g_boxes[:, 8] = rng.uniform(-np.pi, np.pi, gt_budget)
    gb = jnp.asarray(g_boxes)
    labels = jnp.zeros((gt_budget,), jnp.int32)
    mask = jnp.ones((gt_budget,), bool)
    pos_thr, neg_thr = model._pos_thr, model._neg_thr
    layout = model.anchor_layout
    aabb = model.anchor_aabb if hasattr(model, "anchor_aabb") else None

    def run(tier, lay, prefilter="approx", geometry="auto"):
        def f(gb):
            return assign_targets(
                anchors, gb, labels, mask, pos_thr, neg_thr,
                anchor_aabb=aabb, prefilter=prefilter,
                layout=lay, exact_anchor_tier=tier,
                geometry=geometry)["num_pos"]
        return jax.jit(f)

    print(f"N={n} G={gt_budget}", flush=True)
    t = timeit(run(True, layout), gb)
    print(f"layout+tier (default): {t*1e3:8.1f} ms", flush=True)
    t = timeit(run(True, layout, geometry="xla"), gb)
    print(f"layout+tier, XLA geo:  {t*1e3:8.1f} ms", flush=True)
    t = timeit(run(False, layout), gb)
    print(f"layout, no tier:       {t*1e3:8.1f} ms", flush=True)
    t = timeit(run(False, None), gb)
    print(f"no layout (r2 path):   {t*1e3:8.1f} ms", flush=True)

    # Pallas clipper alone at 2N aligned pairs (the tier's workload)
    ridx = jnp.asarray(rng.integers(0, gt_budget, n))
    pair_fn = jax.jit(lambda gbx: intersection_volume_aligned(
        gbx[ridx], anchors).sum())
    t = timeit(pair_fn, gb)
    print(f"pallas clipper, N pairs: {t*1e3:8.1f} ms  "
          f"({n/t/1e6:.1f} M pairs/s)", flush=True)


if __name__ == "__main__":
    main()
