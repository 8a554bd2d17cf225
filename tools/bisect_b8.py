"""Name the op that kills the B=8 flagship compile (remote_compile HTTP 500).

Round-4 established (tools/check_b8_compile.py): the failure is the XLA
program, not Mosaic (it reproduces with every Pallas kernel off), and not
raw tensor size (a trivial op on the same (8,100,400,400,20) grid shape
compiles).  This tool compiles each pipeline stage IN ISOLATION at B=8 so
the failing stage — and the op inside it — gets a name.

Usage: python tools/bisect_b8.py <stage> [batch]
Stages:
  vox      device voxelizer (points_batch) at B
  scatter  XLA grid scatter (B, 100, 400, 400, 20) build + mask
  encoder  vertical encoder (z-fold conv stack) on the dense grid
  rpn      submanifold RPN on the (B, 400, 400, 392) pseudo-image
  head     anchor head convs
  decode   per-item top-k + bbox decode + exact-IoU NMS, vmapped over B
  forward  full apply() (voxelize -> head), no decode
  predict  the full predict program (the known-failing one)

Run each stage in a FRESH process — a helper crash can poison the client:
  for s in vox scatter encoder rpn head decode forward predict; do
      timeout 1200 python tools/bisect_b8.py $s; done
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
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402

STAGE = sys.argv[1] if len(sys.argv) > 1 else "predict"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def report(ok, detail=""):
    status = "OK" if ok else "FAILED"
    print(f"[bisect_b8] stage={STAGE} B={B}: {status} {detail}", flush=True)


def main():
    model = PointPillars(**g._flagship_cfg())
    d, h, w = model.grid_dhw
    v = int(model.tpu_cfg["max_voxels_static"])
    p = int(model.tpu_cfg["max_points_static"])
    cf = int(model.net.pfn_channels[-1])
    dt = model.compute_dtype
    key = jax.random.PRNGKey(0)

    t0 = time.time()

    if STAGE == "vox":
        pts = jax.random.uniform(
            key, (B, p, 4), jnp.float32) * jnp.asarray(
            [40.0, 40.0, 30.0, 1.0])
        num = jnp.full((B,), 100_000, jnp.int32)
        fn = jax.jit(lambda a, n: model.voxel_layer.points_batch(a, n))
        out = fn(pts, num)
        s = float(out["coords"].sum())

    elif STAGE == "scatter":
        feats = jax.random.normal(key, (B * v, cf), dt)
        # valid raster-sorted coords: first v cells of the (d, h, w) grid
        flat = jnp.arange(v, dtype=jnp.int32)
        fc = jnp.stack([flat // (h * w), (flat // w) % h, flat % w], -1)
        fc = jnp.tile(fc, (B, 1))
        fm = jnp.ones((B * v,), bool)
        bi = jnp.repeat(jnp.arange(B), v)
        zi = jnp.where(fm, fc[:, 0], d)
        yi = jnp.where(fm, fc[:, 1], h)
        xi = jnp.where(fm, fc[:, 2], w)

        def build(feats):
            mask = jnp.zeros((B, d, h, w), feats.dtype).at[
                bi, zi, yi, xi].set(1.0, mode="drop", unique_indices=True,
                                    indices_are_sorted=True)
            grid = jnp.zeros((B, d, h, w, cf), feats.dtype).at[
                bi, zi, yi, xi].set(feats, mode="drop", unique_indices=True,
                                    indices_are_sorted=True)
            return grid, mask

        grid, mask = jax.jit(build)(feats)
        s = float(mask.sum())

    elif STAGE in ("encoder", "rpn", "head"):
        from objectdetection_3d_tpu.models.layers import (
            Anchor3DHead,
            SparseMiddleExtractor,
            SubmanifoldSparseRPN,
        )

        if STAGE == "encoder":
            mod = SparseMiddleExtractor(
                in_channels=model.net.middle_in_channels,
                out_channels=model.net.middle_channels,
                dtype=dt, zfold_convs=model.net.zfold_convs)
            vars_ = mod.init(key, jnp.zeros((1, d, 16, 16, cf), dt),
                             jnp.ones((1, d, 16, 16), dt), False)
            grid = jax.random.normal(key, (B, d, h, w, cf), dt)
            mask = (jax.random.uniform(key, (B, d, h, w)) < 0.01).astype(dt)
            fn = jax.jit(lambda vv, gg, mm: mod.apply(vv, gg, mm, False))
            out, _ = fn(vars_, grid, mask)
        elif STAGE == "rpn":
            cin = int(model.net.middle_channels[-1] * 2)  # 196*2 = 392
            mod = SubmanifoldSparseRPN(
                out_channels=model.net.rpn_channels,
                layer_nums=model.net.rpn_layer_nums, dtype=dt)
            vars_ = mod.init(key, jnp.zeros((1, 16, 16, cin), dt),
                             jnp.ones((1, 16, 16), bool), False)
            x = jax.random.normal(key, (B, h, w, cin), dt)
            m = jax.random.uniform(key, (B, h, w)) < 0.05
            fn = jax.jit(lambda vv, xx, mm: mod.apply(vv, xx, mm, False))
            out = fn(vars_, x, m)
        else:
            cin = int(model.net.rpn_channels[-1])
            mod = Anchor3DHead(
                num_classes=model.num_classes,
                num_anchors=model.num_anchors,
                box_params_num=model.box_params_num, dtype=dt)
            vars_ = mod.init(key, jnp.zeros((1, 16, 16, cin), dt))
            x = jax.random.normal(key, (B, h, w, cin), dt)
            fn = jax.jit(lambda vv, xx: mod.apply(vv, xx))
            out = fn(vars_, x)
        s = float(jax.tree_util.tree_leaves(out)[0].sum())

    elif STAGE == "decode":
        a = model.num_anchors
        c = max(model.num_classes, 1)
        cls = jax.random.normal(key, (B, h, w, a * c), jnp.float32)
        reg = jax.random.normal(key, (B, h, w, a * model.box_params_num),
                                jnp.float32) * 0.1
        dirs = jax.random.normal(key, (B, h, w, a * 6), jnp.float32)
        fn = jax.jit(lambda cc, rr, dd, an: jax.vmap(
            model._predict_single, in_axes=(0, 0, 0, None))(cc, rr, dd, an))
        out = fn(cls, reg, dirs, model.anchors)
        s = float(out["score"].sum())

    elif STAGE in ("forward", "predict"):
        variables = model.init_variables(key)
        pvars = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        batch = g._synth_batch(B, p, model.tpu_cfg["max_gt_static"],
                               model.point_cloud_range, n_points=100_000)
        if STAGE == "forward":
            fn = jax.jit(lambda vv, bb: model.apply(vv, bb, train=False)[0])
            out = fn(pvars, batch)
            s = float(out[0].sum())
        else:
            fn = jax.jit(
                lambda vv, bb, an: model.predict(vv, bb, an))
            out = fn(pvars, batch, model.anchors)
            s = float(out["score"].sum())
    else:
        raise SystemExit(f"unknown stage {STAGE!r}")

    report(True, f"in {time.time() - t0:.0f}s (checksum {s:.3e})")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — any failure is the answer
        report(False, f"{type(e).__name__}: {str(e)[:500]}")
        sys.exit(1)
