"""Phase-level timing of the tiled large-scene path on the real chip.

Usage: python tools/profile_tiled.py
Instruments TiledInference.__call__ phase by phase (bucket sort, crop,
upload, dispatch, drain fetch, merge) on the bench's 160x160 m / 2M-pt
trained-checkpoint workload to attribute the scene wall time.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

import __graft_entry__ as g  # noqa: E402
from bench import _tree_scene, load_trained_ckpt  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.pipeline.tiled_inference import (  # noqa: E402
    TiledInference)


def main():
    trained = load_trained_ckpt()
    model = PointPillars(**g._flagship_cfg())
    model.head_cfg["score_thr"] = float(trained.get("score_thr", 0.3))
    tvars = {"params": trained["params"],
             "batch_stats": trained["batch_stats"]}
    predict = model.make_predict_fn()
    scene = _tree_scene()
    print(f"scene: {scene.shape}", flush=True)

    # ---- fused whole-scene program (the default): cold then warm ----
    tiled = TiledInference(model, tvars, overlap=5.0, batch_tiles=1)
    assert tiled.fused
    t0 = time.time()
    dets = tiled(scene)
    print(f"fused cold (incl compile): {time.time() - t0:.2f} s, "
          f"{len(dets)} dets", flush=True)
    for rep in range(3):
        t0 = time.time()
        dets = tiled(scene)
        print(f"fused warm: {time.time() - t0:.2f} s, "
              f"{len(dets)} dets", flush=True)

    # ---- host-crop path for comparison ----
    tiled_host = TiledInference(model, tvars, overlap=5.0, batch_tiles=1,
                                predict_fn=predict, device_crop=False)
    t0 = time.time()
    dets = tiled_host(scene)
    print(f"host-crop warm-programs: {time.time() - t0:.2f} s, "
          f"{len(dets)} dets", flush=True)

    # ---- phase-instrumented replay of __call__ ----
    points = np.asarray(scene, np.float32)
    lo = points[:, :3].min(axis=0)
    hi = points[:, :3].max(axis=0)
    xs = tiled._tile_origins(lo[0], hi[0], tiled.tile_x, tiled.overlap)
    ys = tiled._tile_origins(lo[1], hi[1], tiled.tile_y, tiled.overlap)

    t0 = time.time()
    sorted_pts, starts, grid = tiled._bucket_sort(points, lo)
    t_sort = time.time() - t0

    max_pts = int(model.tpu_cfg["max_points_static"])
    max_gt = int(model.tpu_cfg["max_gt_static"])
    pcr = np.asarray(model.point_cloud_range)
    tiles = [(x0, y0) for x0 in xs for y0 in ys]

    t_crop = t_upload = t_dispatch = 0.0
    pending = []
    t_loop0 = time.time()
    for (x0, y0) in tiles:
        t0 = time.time()
        local = tiled._crop_tile(sorted_pts, starts, grid, lo, pcr,
                                 x0, y0, max_pts)
        batch_pts = np.zeros((1, max_pts, points.shape[1]), np.float32)
        batch_pts[0, :local.shape[0]] = local
        t_crop += time.time() - t0

        t0 = time.time()
        batch = {
            "points": jnp.asarray(batch_pts),
            "num_points": jnp.asarray(
                np.array([local.shape[0]], np.int32)),
            "bboxes": jnp.zeros((1, max_gt, 9), jnp.float32),
            "labels": jnp.zeros((1, max_gt), jnp.int32),
            "gt_mask": jnp.zeros((1, max_gt), bool),
        }
        t_upload += time.time() - t0

        t0 = time.time()
        preds = predict(tvars, batch)
        t_dispatch += time.time() - t0
        pending.append(preds)
    t_loop = time.time() - t_loop0

    t0 = time.time()
    packed = tiled._pack(pending)
    packed = jax.device_get(packed)
    t_drain = time.time() - t0

    # merge phase on the already-fetched results (replicates __call__)
    t0 = time.time()
    n_boxes = int(packed["valid"].sum())
    t_merge = time.time() - t0

    total = t_sort + t_loop + t_drain
    print(f"tiles: {len(tiles)}   boxes pre-merge: {n_boxes}")
    print(f"bucket sort : {t_sort * 1000:9.1f} ms")
    print(f"crop (host) : {t_crop * 1000:9.1f} ms")
    print(f"upload      : {t_upload * 1000:9.1f} ms")
    print(f"dispatch    : {t_dispatch * 1000:9.1f} ms")
    print(f"enqueue loop: {t_loop * 1000:9.1f} ms  (crop+upload+dispatch)")
    print(f"drain fetch : {t_drain * 1000:9.1f} ms  (device compute "
          f"drains here)")
    print(f"merge count : {t_merge * 1000:9.1f} ms")
    print(f"TOTAL       : {total:9.2f} s", flush=True)


if __name__ == "__main__":
    main()
