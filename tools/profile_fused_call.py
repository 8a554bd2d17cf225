"""Split the fused tiled __call__ wall time: device program vs host side.

Usage: python tools/profile_fused_call.py
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
    shifts_np = np.asarray([[x0, y0, lo[2]] for (x0, y0) in tiles],
                           np.float32)
    n_chunks = len(tiles)

    t0 = time.time()
    scene_dev = ti._upload_scene(points)
    float(scene_dev[0, 0])  # force the transfer
    t_up = time.time() - t0
    print(f"scene upload+pad: {t_up * 1000:.0f} ms", flush=True)

    prog = ti._fused_program(scene_dev.shape[0], scene_dev.shape[1],
                             n_chunks)
    args = (scene_dev, jnp.asarray(shifts_np), jnp.float32(lo[0]),
            ti.variables, ti.model.anchors)
    t0 = time.time()
    out = prog(*args)
    float(out["score"].sum())
    print(f"monolith cold: {time.time() - t0:.1f} s", flush=True)
    for _ in range(3):
        t0 = time.time()
        out = prog(*args)
        float(out["score"].sum())
        print(f"monolith warm: {time.time() - t0:.2f} s", flush=True)

    t0 = time.time()
    packed = jax.device_get(out)
    print(f"readback: {(time.time() - t0) * 1000:.0f} ms "
          f"({sum(v.nbytes for v in packed.values())} B)", flush=True)

    for _ in range(2):
        t0 = time.time()
        dets = ti(scene)
        print(f"full __call__: {time.time() - t0:.2f} s, "
              f"{len(dets)} dets", flush=True)


if __name__ == "__main__":
    main()
