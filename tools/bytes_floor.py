"""Bytes-floor analysis of the flagship inference program (PERF.md input).

Enumerates every major activation of the flagship predict program at its
static shapes (``jax.eval_shape`` — no device, runs on CPU in seconds),
charges each pipeline stage its HBM reads + writes under the measured
fusion behavior, and divides by the MEASURED realized bandwidth of this
chip (~75-90 GB/s, CLAUDE.md) to get the platform-maximum clouds/s.

This is the arithmetic that makes the >=10x north-star question decidable:
if the floor itself sits below 10 clouds/s on this silicon, the wall is
the platform, not the program.

Usage: JAX_PLATFORMS=cpu python tools/bytes_floor.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # shape analysis only — never
os.environ["JAX_PLATFORM_NAME"] = "cpu"  # touch the TPU tunnel

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402,F401

sys.path.insert(0, ".")

import __graft_entry__ as g  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402

GBPS_LO, GBPS_HI = 75.0, 90.0  # measured realized HBM BW (CLAUDE.md)


def gb(nbytes):
    return nbytes / 1e9


def main():
    model = PointPillars(**g._flagship_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = g._synth_batch(1, model.tpu_cfg["max_points_static"],
                           model.tpu_cfg["max_gt_static"],
                           model.point_cloud_range, n_points=100_000)

    # ---- capture every intermediate's shape/dtype without executing ----
    def fwd(variables, batch):
        net = model._net_for("auto")
        vox = model.voxel_layer.points_batch(batch["points"],
                                             batch["num_points"],
                                             pallas="off")
        outs, inter = net.apply(
            variables, None, vox["num_points_per_voxel"], vox["coords"],
            vox["voxel_mask"], False,
            points=vox["points"], pt_voxel=vox["pt_voxel"],
            pt_valid=vox["pt_valid"],
            max_slots=model.voxel_layer.max_voxel_points,
            capture_intermediates=True)
        return outs, inter

    (outs, inter) = jax.eval_shape(fwd, variables, batch)

    flat = jax.tree_util.tree_leaves_with_path(inter)
    print("== captured intermediates (>= 8 MB) ==")
    acts = []
    for path, leaf in flat:
        if not hasattr(leaf, "shape"):
            continue
        nb = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        name = jax.tree_util.keystr(path)
        acts.append((name, leaf.shape, leaf.dtype, nb))
        if nb >= 8e6:
            print(f"  {gb(nb) * 1000:9.1f} MB  {str(leaf.dtype):9s} "
                  f"{str(leaf.shape):28s} {name}")

    # ---- stage-level byte budget (B=1) ---------------------------------
    # Charged as HBM reads+writes with elementwise producers fused into
    # their conv consumers (XLA does this; measured in ROADMAP's stage
    # tables).  Weights are negligible (<6 MB total).
    p = int(model.tpu_cfg["max_points_static"])
    v = int(model.tpu_cfg["max_voxels_static"])
    d, h, w = model.grid_dhw
    cf = int(model.net.pfn_channels[-1])
    a = model.num_anchors
    c = max(model.num_classes, 1)
    f32, bf16 = 4, 2

    stages = {}
    # voxelize: read points (P,4 f32); sort passes over (P) keys+payload
    # (radix sort makes ~4 passes over key+index = ~8 B/row/pass), one
    # gather reorder of the (P,4) payload, scan tail writes ids/slots
    stages["voxelize"] = (p * 4 * f32            # read points
                          + 4 * p * 8            # sort passes
                          + 2 * p * 4 * f32      # reorder gather r+w
                          + 3 * p * 4)           # ids/slots/valid writes
    # PFN: read sorted points + decorated 10-col features, segment max,
    # write (V, 20) voxel feats; matmul reads (P,10)->(P,20)
    stages["pfn"] = (p * 4 * f32 + p * 10 * f32 + p * 20 * bf16
                     + v * cf * bf16)
    # grid scatter: write the dense grid + mask once, read voxel feats
    stages["grid_scatter"] = ((d * h * w * cf) * bf16
                              + (d * h * w) * bf16
                              + v * cf * bf16)
    # encoder: each conv reads its input and writes its output; z-fold
    # lowering reads each folded input once.  Use captured conv outputs.
    enc_bytes = 0
    for name, shape, dtype, nb in acts:
        if "pseudoimage_generator" in name and "__call__" in name:
            enc_bytes += 2 * nb  # read by next stage + written
    stages["encoder(conv stack)"] = enc_bytes or 8_000_000_000
    # rpn + head: (H, W, 392) input, three 128-ch stages, head outputs
    rpn_bytes = 0
    for name, shape, dtype, nb in acts:
        if "sparse_rpn" in name or "bbox_head" in name:
            rpn_bytes += 2 * nb
    stages["rpn+head"] = rpn_bytes
    # decode+nms: read cls/reg/dirs (f32 head outputs), blockwise top-k
    # reads cls once more
    out_bytes = sum(int(np.prod(o.shape)) * o.dtype.itemsize for o in outs)
    stages["decode+nms"] = out_bytes + h * w * a * c * f32

    total = sum(stages.values())
    print("\n== stage byte budget (B=1, reads+writes, fused) ==")
    for k, b in stages.items():
        lo, hi = b / (GBPS_HI * 1e9) * 1e3, b / (GBPS_LO * 1e9) * 1e3
        print(f"  {k:22s} {gb(b) * 1000:9.1f} MB   "
              f"floor {lo:6.1f}-{hi:6.1f} ms")
    lo_s = total / (GBPS_HI * 1e9)
    hi_s = total / (GBPS_LO * 1e9)
    print(f"  {'TOTAL':22s} {gb(total) * 1000:9.1f} MB   "
          f"floor {lo_s * 1e3:6.1f}-{hi_s * 1e3:6.1f} ms/cloud")
    print(f"\nplatform-max throughput at {GBPS_LO:.0f}-{GBPS_HI:.0f} GB/s "
          f"realized: {1 / hi_s:.1f}-{1 / lo_s:.1f} clouds/s")
    print("(spec-sheet 819 GB/s would put the same program at "
          f"{1 / (total / 819e9):.0f} clouds/s)")


if __name__ == "__main__":
    main()
