"""Probe the batch-8 gradient-accumulation train step on the real chip.

The monolithic B=8 step RESOURCE_EXHAUSTs (tools/bisect_b8.py: the dense
grid scatter + encoder stages alone exceed HBM).  This probes
``make_train_step(tx, microbatch=mb)`` — lax.scan over B/mb microbatches
inside one jit, one AdamW update, pooled avg_factor (exact, see
tests/test_train_accum.py) — to find the largest microbatch that
compiles and its step time.  Run each mb in a FRESH process: a compile
failure can poison the tunnel client.

Usage: python tools/probe_b8_accum.py <microbatch> [batch]
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

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 2
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import jax.tree_util as jtu

    model = PointPillars(**g._flagship_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    tx = model.get_optimizer(dict(lr=1e-4, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    state = jtu.tree_map(lambda x: x.copy(),
                         {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    state["opt_state"] = tx.init(state["params"])
    step = model.make_train_step(tx, donate=True, microbatch=MB)
    bt = g._synth_batch(B, model.tpu_cfg["max_points_static"],
                        model.tpu_cfg["max_gt_static"],
                        model.point_cloud_range, n_points=100_000)

    t0 = time.time()
    state, losses = step(state, bt)
    vals = {k: float(v) for k, v in losses.items()}
    print(f"[probe_b8_accum] mb={MB} B={B}: compile+warm "
          f"{time.time() - t0:.0f}s, losses "
          + ", ".join(f"{k}={v:.4f}" for k, v in vals.items()),
          flush=True)
    assert all(np.isfinite(v) for v in vals.values())

    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(2):
            state, losses = step(state, bt)
        _ = float(losses["loss_cls"])   # forced readback sync
        times.append((time.time() - t0) / 2)
    med = float(np.median(times))
    print(f"[probe_b8_accum] mb={MB} B={B}: OK {med:.3f} s/step "
          f"({med / B:.3f} s/cloud), raw "
          f"{[round(t, 3) for t in times]}", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the failure IS the answer
        print(f"[probe_b8_accum] mb={MB} B={B}: FAILED "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        sys.exit(1)
