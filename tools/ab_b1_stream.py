"""Attribute the r3->r4 B=1 stream regression (173.6 -> 198.8 ms/cloud).

Round 4's only in-program change on the inference path was the fused
Pallas voxel scan (ops/voxel_scan.py, commit c38bbc7); the bench's stream
methodology is unchanged (identical jit drain in r3 and r4 bench.py).  So
the candidates are (a) the voxel-scan kernel's interaction with the full
program and (b) tunnel weather.  This tool measures the identical 8-cloud
B=1 pipelined stream with the scan ON and OFF in one process, many reps,
and prints medians + spreads so variance is visible.

Usage: python tools/ab_b1_stream.py [reps]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 9


def measure(tag, tpu_overrides):
    model = PointPillars(**g._flagship_cfg(tpu_overrides))
    variables = model.init_variables(jax.random.PRNGKey(0))
    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    predict = model.make_predict_fn()
    batches = [g._synth_batch(1, model.tpu_cfg["max_points_static"],
                              model.tpu_cfg["max_gt_static"],
                              model.point_cloud_range, seed=s,
                              n_points=100_000) for s in range(8)]
    drain = jax.jit(lambda outs: sum(o["score"].sum() for o in outs))

    def run_stream():
        outs = [predict(pvars, bt) for bt in batches]
        return float(drain(outs))

    t0 = time.time()
    run_stream()
    print(f"[{tag}] warm+compile {time.time() - t0:.0f}s", flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        run_stream()
        times.append((time.time() - t0) / 8 * 1000)
    arr = np.asarray(times)
    print(f"[{tag}] ms/cloud median {np.median(arr):.1f}  "
          f"min {arr.min():.1f}  max {arr.max():.1f}  "
          f"mean {arr.mean():.1f}  std {arr.std():.1f}", flush=True)
    print(f"[{tag}] raw: {[round(t, 1) for t in times]}", flush=True)
    return float(np.median(arr))


scan_on = measure("scan-on (r4 default)", {})
scan_off = measure("scan-off (r3 voxel tail)", {"pallas_voxel_scan": False})
print(f"delta (on - off): {scan_on - scan_off:+.1f} ms/cloud", flush=True)
