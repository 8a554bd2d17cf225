"""Measure the reference's CPU-runnable components on THIS host.

The torch reference publishes no end-to-end numbers (BASELINE.md), so
``bench.py``'s ``vs_baseline`` denominator is an estimate.  This tool
grounds the estimate by timing, on this machine, the pieces of the
reference that run without CUDA:

1. ``points_to_voxel`` algorithm (reference ops/ops_numba.py:171-308) —
   numba is not installed here, so two proxies bracket it: the pure-Python
   per-point loop (``tests/oracles.py::voxelize_np``, the upper bound) and
   a vectorized numpy formulation (the lower bound; the reference's own
   comment claims ~4.2 ms with numba JIT, ops/ops_numba.py:118-120).
2. Per-call anchor regeneration: 3 sizes x 4 rotations x 400x400 grid =
   1.92M anchors rebuilt inside EVERY loss/get_bboxes call (reference
   model/PointPillars.py:907-911,1041; model/utils.py:168-264), torch CPU.
3. The greedy NMS Python while-loop shape over ``nms_pre=500`` sorted
   candidates (reference model/utils.py:398-424), torch CPU with the
   AABB-envelope IoU per iteration (the CUDA kernel's host-loop structure
   is what's being measured, not the kernel).

Run: ``python tools/measure_baseline_components.py`` (CPU-only; ~1 min).
"""

import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def timed(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    pts = np.concatenate(
        [rng.uniform([0, 0, 0], [40, 40, 30], (n, 3)),
         rng.uniform(0, 1, (n, 1))], axis=1).astype(np.float32)
    pc_range = [0.0, 0.0, 0.0, 40.0, 40.0, 30.0]
    vsz = [0.1, 0.1, 0.3]

    # --- 1a. reference voxelize, pure-Python per-point loop --------------
    from oracles import voxelize_np

    t_vox_py = timed(lambda: voxelize_np(pts, vsz, pc_range, 50,
                                         7_500_000, True), reps=3)
    print(f"voxelize 100k pts, per-point Python loop "
          f"(reference algorithm, un-JITted): {t_vox_py * 1e3:.1f} ms")

    # --- 1b. vectorized numpy voxelize (lower bound for the CPU path) ----
    def vox_numpy():
        lo = np.asarray(pc_range[:3])
        cell = np.floor((pts[:, :3] - lo) / np.asarray(vsz)).astype(np.int64)
        grid = np.asarray([400, 400, 100])
        ok = np.all((cell >= 0) & (cell < grid), axis=1)
        flat = (cell[:, 0] * grid[1] + cell[:, 1]) * grid[2] + cell[:, 2]
        order = np.lexsort((-pts[:, 3], np.where(ok, flat, -1)))
        fs = flat[order]
        first = np.concatenate([[True], fs[1:] != fs[:-1]])
        vox_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(len(fs)) - starts[vox_id]
        return fs, vox_id, rank < 50

    t_vox_np = timed(vox_numpy, reps=5)
    print(f"voxelize 100k pts, vectorized numpy (sort-based): "
          f"{t_vox_np * 1e3:.1f} ms  "
          f"(reference's numba-JIT comment claims ~4.2 ms)")

    # --- 2. per-call anchor regeneration, torch CPU -----------------------
    def torch_anchors():
        zs = torch.linspace(0, 30, 1)
        ys = torch.linspace(0, 40, 400)
        xs = torch.linspace(0, 40, 400)
        out = []
        sizes = torch.tensor([[0.4, 0.4, 20.0], [0.8, 0.8, 25.0],
                              [1.2, 1.2, 30.0]])
        rots = torch.tensor([[0.0, 0.0, 0.0], [0.0, 0.0, 1.57],
                             [1.57, 0, 0], [0, 1.57, 0]])
        gz, gy, gx = torch.meshgrid(zs, ys, xs, indexing="ij")
        cent = torch.stack([gx, gy, gz], -1).reshape(-1, 3)
        for s in sizes:
            for r in rots:
                out.append(torch.cat(
                    [cent, s.expand(cent.shape[0], 3),
                     r.expand(cent.shape[0], 3)], -1))
        return torch.cat(out, 0).reshape(1, 400, 400, 3, 4, 9)

    t_anchor = timed(torch_anchors, reps=5)
    print(f"anchor regeneration 1.92M x 9, torch CPU "
          f"(reference rebuilds per call): {t_anchor * 1e3:.1f} ms")

    # --- 3. greedy NMS Python while-loop, 500 candidates ------------------
    boxes = torch.tensor(rng.uniform(0, 40, (500, 4)).astype(np.float32))
    env = torch.cat([boxes[:, :2], boxes[:, :2] + 1.5], dim=1)
    scores = torch.tensor(rng.uniform(0, 1, 500).astype(np.float32))

    def aabb_iou(a, b):
        lt = torch.maximum(a[:, None, :2], b[None, :, :2])
        rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)

    def nms_loop():
        order = torch.argsort(scores, descending=True)
        sorted_env = env[order]
        box_indices = torch.arange(0, 500)
        suppressed = []
        while box_indices.shape[0] > 0:
            if box_indices[0] not in suppressed:
                sel = box_indices[0]
                iou = aabb_iou(sorted_env[box_indices],
                               sorted_env[sel].unsqueeze(0))
                mask_iou = (iou > 1e-5).squeeze(-1)
                mask = mask_iou & (box_indices != sel)
                suppressed.extend(box_indices[mask].tolist())
            box_indices = box_indices[torch.logical_not(mask)]
            box_indices = box_indices[1:]
        return suppressed

    t_nms = timed(nms_loop, reps=5)
    print(f"greedy NMS Python while-loop, 500 candidates, torch CPU "
          f"(reference model/utils.py:398-424 shape): {t_nms * 1e3:.1f} ms")

    print()
    print("summary (median ms):", {
        "voxelize_python_loop_ms": round(t_vox_py * 1e3, 1),
        "voxelize_numpy_vectorized_ms": round(t_vox_np * 1e3, 1),
        "anchor_regen_torch_cpu_ms": round(t_anchor * 1e3, 1),
        "nms_python_loop_ms": round(t_nms * 1e3, 1),
    })


if __name__ == "__main__":
    main()
