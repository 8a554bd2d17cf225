"""One-off: full flagship train step across remat variants on the real chip.

Variants: "all" (r2 default), "rpn" (encoder residuals resident, RPN
recomputed), "middle" (the inverse), False (no remat).

Each variant runs in a FRESH subprocess — the full-grid step is
HBM-pressure sensitive, and variants that fit on fresh HBM
RESOURCE_EXHAUST after any prior big program in the same process (an
in-process loop produces contaminated verdicts).

Measured 2026-08-18 (v5e-1, flagship 400x400x100 / batch 1), donate=True,
per-step readback (~+0.1 s RPC vs the pipelined number):
  all     1079 ms
  middle  1078 ms  (RPN residuals resident buy nothing — its recompute
                    is cheap relative to the encoder's)
  rpn     FAILED   remote_compile HTTP 500 — the resident encoder
                   residuals are ~300-380 MB *per stage tensor*; the
                   program is unschedulable in 16 GB
  False   FAILED   same (with donate=False and zero prior allocations it
                   HAS run at 949 ms — i.e. no-remat ties remat when it
                   schedules at all: XLA spills/rematerializes under
                   pressure on its own)
Conclusion: flagship pins remat: true; the per-stage knob is for
smaller grids / bigger-HBM chips where net-only fwd+bwd measured 546 vs
734 ms (tools/profile_train_breakdown.py) shows ~190 ms recompute on
the table.

    python tools/profile_remat_variants.py
"""

import subprocess
import sys

_CHILD = '''
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
import __graft_entry__ as g
from objectdetection_3d_tpu.models import PointPillars

variant = {variant!r}
model = PointPillars(**g._flagship_cfg({{"remat": variant}}))
variables = model.init_variables(jax.random.PRNGKey(0))
batch = g._synth_batch(1, model.tpu_cfg["max_points_static"],
                       model.tpu_cfg["max_gt_static"],
                       model.point_cloud_range, n_points=100_000)
tx = model.get_optimizer(dict(lr=1e-4, betas=[0.95, 0.99],
                              weight_decay=0.01), grad_clip_value=2.0)
state = {{"params": variables["params"],
          "batch_stats": variables["batch_stats"],
          "opt_state": tx.init(variables["params"])}}
step = model.make_train_step(tx, donate=True)
t0 = time.time()
state, losses = step(state, batch)
float(np.asarray(jax.device_get(losses["loss_cls"])).sum())
first = time.time() - t0
ts = []
for _ in range(6):
    t0 = time.time()
    state, losses = step(state, batch)
    float(np.asarray(jax.device_get(losses["loss_cls"])).sum())
    ts.append(time.time() - t0)
print(f"RESULT {{np.median(ts) * 1000:.1f}} ms  (first {{first:.1f}}s)",
      flush=True)
'''


def main():
    for variant in ("all", "rpn", "middle", False):
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.format(variant=variant)],
            capture_output=True, text=True, timeout=1800)
        result = [ln for ln in proc.stdout.splitlines()
                  if ln.startswith("RESULT ")]
        if proc.returncode == 0 and result:
            print(f"train step (remat={variant!r})  "
                  f"{result[0][7:]}", flush=True)
        else:
            tail = (proc.stderr.strip().splitlines() or ["?"])[-1][:160]
            print(f"train step (remat={variant!r}) FAILED: {tail}",
                  flush=True)


if __name__ == "__main__":
    main()
