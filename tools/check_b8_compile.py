"""Bisect the batch-8 flagship compile failure (remote_compile HTTP 500).

Usage: python tools/check_b8_compile.py [variant ...]
Variants: auto (default config), noscatter (XLA grid scatter, Pallas voxel
scan kept), off (every Pallas kernel off).  Each compiles + runs ONE B=8
predict on tiny point counts and reports pass/fail, isolating whether the
Mosaic kernels or the XLA program are what the compile helper dies on.
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

import __graft_entry__ as g  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402

VARIANTS = sys.argv[1:] or ["noscatter", "off", "auto"]


def try_variant(name):
    overrides = {}
    pallas = "auto"
    if name == "noscatter":
        overrides["pallas_grid_scatter"] = False
    elif name == "off":
        pallas = "off"
    model = PointPillars(**g._flagship_cfg(overrides))
    variables = model.init_variables(jax.random.PRNGKey(0))
    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    batch = g._synth_batch(8, model.tpu_cfg["max_points_static"],
                           model.tpu_cfg["max_gt_static"],
                           model.point_cloud_range, n_points=100_000)
    fn = jax.jit(lambda v, b: model.predict(v, b, pallas=pallas))
    t0 = time.time()
    try:
        out = fn(pvars, batch)
        s = float(np.asarray(out["score"]).sum())
        print(f"[{name}] OK in {time.time() - t0:.0f}s (score sum {s:.3f})",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] FAILED in {time.time() - t0:.0f}s: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        return False


for v in VARIANTS:
    try_variant(v)
