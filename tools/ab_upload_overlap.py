"""A/B the host-upload share of the pipelined B=1 stream.

VERDICT r4 #7 named "double-buffered host uploads" as an un-landed
headline lever.  This measures it directly on the real chip: the same
8-cloud B=1 stream timed (a) exactly as bench.py runs it — per-call
host-numpy batches, upload left to jax dispatch — and (b) with every
batch `jax.device_put` ahead of the timed region (the upper bound any
double-buffering scheme could reach; a serving deployment overlaps
uploads with compute, so (b) is the honest serving number and (a) - (b)
is the maximum win double-buffering could buy).

Run on a CLEAN host (no concurrent CPU jobs — CLAUDE.md).
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

N_CALLS = 8
REPS = 7


def main():
    model = PointPillars(**g._flagship_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    predict = model.make_predict_fn()

    host_batches = [
        g._synth_batch(1, model.tpu_cfg["max_points_static"],
                       model.tpu_cfg["max_gt_static"],
                       model.point_cloud_range, seed=s, n_points=100_000)
        for s in range(N_CALLS)]
    dev_batches = [{k: jax.device_put(v) for k, v in bt.items()}
                   for bt in host_batches]

    def drain(outs):
        return sum(float(np.asarray(o["score"]).sum()) for o in outs)

    def stream(batches):
        outs = [predict(pvars, bt) for bt in batches]
        return drain(outs)

    def stream_dbuf(batches):
        """Double-buffered: upload batch i+1 AFTER dispatching predict on
        batch i, so the tunnel transfer rides under the device compute.
        Only batch 0's upload is exposed."""
        dev = {k: jax.device_put(v) for k, v in batches[0].items()}
        outs = []
        for i in range(len(batches)):
            outs.append(predict(pvars, dev))
            if i + 1 < len(batches):
                dev = {k: jax.device_put(v)
                       for k, v in batches[i + 1].items()}
        return drain(outs)

    stream(host_batches)  # warm/compile
    for label, fn, batches in (
            ("host-numpy per call", stream, host_batches),
            ("double-buffered upload", stream_dbuf, host_batches),
            ("device-resident", stream, dev_batches)):
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn(batches)
            times.append((time.time() - t0) / N_CALLS * 1000)
        print(f"[{label}] ms/cloud median {np.median(times):.1f}  "
              f"min {min(times):.1f}  max {max(times):.1f}  raw "
              + str([round(t, 1) for t in times]), flush=True)


if __name__ == "__main__":
    main()
