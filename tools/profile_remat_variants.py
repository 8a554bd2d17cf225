"""One-off: full flagship train step across remat variants on the real chip.

Variants: "all" (r2 default), "rpn" (encoder residuals resident, RPN
recomputed), "middle" (the inverse), False (no remat).

Measured 2026-08-18 (v5e-1, flagship 400x400x100 / batch 1):
  all     960 ms   (the only variant that fits)
  rpn     FAILED   remote_compile HTTP 500 (compile-helper death — the
                   resident encoder residuals are ~300-380 MB *per
                   stage tensor*; the program is unschedulable in 16 GB)
  middle  FAILED   RESOURCE_EXHAUSTED at run time
  False   FAILED   RESOURCE_EXHAUSTED at run time
Conclusion: flagship keeps remat: true ("all"); the per-stage knob is
for smaller grids / bigger-HBM chips where fwd+bwd measured 546 vs
734 ms (tools/profile_train_breakdown.py) shows ~190 ms recompute on
the table.

    python tools/profile_remat_variants.py
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jax.device_get(leaves[0])).sum())


def timeit(name, fn, *args, iters=6, warmup=1):
    t0 = time.time()
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    med = (time.time() - t0) / iters * 1000
    print(f"{name:48s} {med:9.1f} ms  (first {first:.1f}s)", flush=True)
    return med


def main():
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    from objectdetection_3d_tpu.models import PointPillars

    base = PointPillars(**g._flagship_cfg())
    variables = base.init_variables(jax.random.PRNGKey(0))
    batch = g._synth_batch(1, base.tpu_cfg["max_points_static"],
                           base.tpu_cfg["max_gt_static"],
                           base.point_cloud_range, n_points=100_000)

    for variant in ("all", "rpn", "middle", False):
        try:
            model = PointPillars(**g._flagship_cfg({"remat": variant}))
            tx = model.get_optimizer(dict(lr=1e-4, betas=[0.95, 0.99],
                                          weight_decay=0.01),
                                     grad_clip_value=2.0)
            state = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"],
                     "opt_state": tx.init(variables["params"])}
            step = model.make_train_step(tx, donate=False)
            timeit(f"train step (remat={variant!r})", step, state, batch)
        except Exception as e:  # noqa: BLE001 — OOM expected for some
            msg = str(e).splitlines()[0][:160]
            print(f"train step (remat={variant!r}) FAILED: "
                  f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
