"""Decompose the fused whole-scene tiled program on the real chip.

Times three jitted pieces separately (sort; crop-all-tiles; predict-all-
tiles on fixed inputs) to attribute the fused program's wall time.

Usage: python tools/profile_fused_tiled.py
"""

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


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def timeit(tag, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        times.append(time.time() - t0)
    print(f"{tag:28s} {min(times) * 1000:9.1f} ms (min of {reps}; "
          f"median {np.median(times) * 1000:.1f})", flush=True)
    return out


def main():
    trained = load_trained_ckpt()
    model = PointPillars(**g._flagship_cfg())
    model.head_cfg["score_thr"] = float(trained.get("score_thr", 0.3))
    tvars = {"params": trained["params"],
             "batch_stats": trained["batch_stats"]}
    scene = _tree_scene()
    ti = TiledInference(model, tvars, overlap=5.0, batch_tiles=1)

    points = np.asarray(scene, np.float32)
    lo = points[:, :3].min(axis=0)
    hi = points[:, :3].max(axis=0)
    xs = ti._tile_origins(lo[0], hi[0], ti.tile_x, ti.overlap)
    ys = ti._tile_origins(lo[1], hi[1], ti.tile_y, ti.overlap)
    tiles = [(x0, y0) for x0 in xs for y0 in ys]
    shifts = jnp.asarray([[x0, y0, lo[2]] for (x0, y0) in tiles],
                         np.float32)
    print(f"tiles: {len(tiles)}  rb={ti.rb} n_runs={ti.n_runs}",
          flush=True)

    scene_dev = ti._upload_scene(points)
    lo0 = jnp.float32(lo[0])

    sort_jit = jax.jit(lambda s: ti._sort_scene_cols(s, lo0, ti.xcell))
    ss, cols, ys_d = timeit("sort (shuffle+2 argsorts)", sort_jit,
                            scene_dev)

    crop_all = jax.jit(lambda ss_, cols_, ys_, sh: jax.lax.map(
        lambda s1: ti._crop_cols(ss_, cols_, ys_, s1, lo0), sh))
    cropped = timeit("crop x25 (lax.map)", crop_all, ss, cols, ys_d,
                     shifts)
    print(f"cropped: {cropped.shape}", flush=True)

    max_pts = int(model.tpu_cfg["max_points_static"])
    num = jnp.full((1,), max_pts, jnp.int32)

    def pred_one(pts):
        batch = {"points": pts[None], "num_points": num}
        return model.predict(tvars, batch, model.anchors)

    pred_all = jax.jit(lambda cr: jax.lax.map(pred_one, cr))
    timeit("predict x25 (lax.map)", pred_all, cropped)

    # single-tile predict for scale
    pred1 = jax.jit(lambda pts: pred_one(pts))
    timeit("predict x1", pred1, cropped[0], reps=5)

    # how many candidate rows actually reach each tile?
    nval = jax.jit(lambda cr: jnp.sum(
        jnp.all(cr[..., :3] < 1e8, axis=-1), axis=-1))(cropped)
    print("valid candidate rows per tile:",
          np.asarray(nval).tolist(), flush=True)


if __name__ == "__main__":
    main()
