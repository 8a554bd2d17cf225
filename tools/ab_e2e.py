"""A/B end-to-end predict timing for tpu-config variants.

Usage: python tools/ab_e2e.py key=val [key=val ...] -- key=val ...
Each ' -- '-separated group is one tpu-override dict; every group gets a
fresh model + jitted predict and a median timing on the real chip.
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


def parse(tokens):
    groups, cur = [], {}
    for t in tokens:
        if t == "--":
            groups.append(cur)
            cur = {}
            continue
        k, v = t.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            v = {"true": True, "false": False}.get(v.lower(), v)
        cur[k] = v
    groups.append(cur)
    return groups


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.sum()))


def main():
    groups = parse(sys.argv[1:])
    for overrides in groups:
        batch_size = int(overrides.pop("batch_size", 1))
        model = PointPillars(**g._flagship_cfg(overrides))
        variables = model.init_variables(jax.random.PRNGKey(0))
        batch = g._synth_batch(batch_size,
                               model.tpu_cfg["max_points_static"],
                               model.tpu_cfg["max_gt_static"],
                               model.point_cloud_range)
        predict = model.make_predict_fn()
        pvars = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        t0 = time.time()
        out = predict(pvars, batch)
        sync(out)
        first = time.time() - t0
        ts = []
        for _ in range(8):
            t0 = time.time()
            out = predict(pvars, batch)
            sync(out)
            ts.append(time.time() - t0)
        med = float(np.median(ts)) * 1000
        print(f"B={batch_size} {overrides}: {med:.1f} ms/call "
              f"= {1000.0 * batch_size / med:.2f} clouds/s "
              f"(first {first:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
