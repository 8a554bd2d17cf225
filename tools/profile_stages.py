"""Stage-level profiling of flagship inference on the real chip.

Usage: python tools/profile_stages.py [section ...]
Sections: vox fwd pfn pointpfn scatter2 enc encz fwdz s1parts rpn tail
          zfoldin
          s1 sparse train trainz batched zf
Each timing is a separate jit program; first call includes (remote) compile.
Timings use a forced scalar readback (block_until_ready no-ops on axon);
every number therefore carries ~27 ms of RPC sync overhead.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

SECTIONS = set(sys.argv[1:]) or {"vox", "fwd", "enc", "rpn", "tail"}


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def timed(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        ts.append(time.time() - t0)
    med = float(np.median(ts)) * 1000
    print(f"{name:44s} {med:9.2f} ms   (first call {first:.1f}s)",
          flush=True)
    return med


import __graft_entry__ as g  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402

model = PointPillars(**g._flagship_cfg())
variables = model.init_variables(jax.random.PRNGKey(0))
batch = g._synth_batch(1, model.tpu_cfg["max_points_static"],
                       model.tpu_cfg["max_gt_static"],
                       model.point_cloud_range)
D, H, W = model.grid_dhw
V = model.tpu_cfg["max_voxels_static"]
BF = jnp.bfloat16
print(f"backend={jax.default_backend()} grid={(D, H, W)} V={V}", flush=True)


def synth_grid(c, occupancy=0.0075, seed=0):
    """Generated ON DEVICE: a host-side grid is ~1.3 GB and takes minutes
    to push through the axon tunnel."""
    @partial(jax.jit, static_argnames=("c",))
    def make(key, c):
        k1, k2 = jax.random.split(key)
        m = (jax.random.uniform(k1, (1, D, H, W)) < occupancy).astype(BF)
        x = jax.random.normal(k2, (1, D, H, W, c), BF) * m[..., None]
        return x, m
    x, m = make(jax.random.PRNGKey(seed), c)
    sync(x)
    return x, m


if "vox" in SECTIONS:
    fn = jax.jit(lambda p, n: model.voxelize_batch(p, n))
    timed("voxelize", fn, batch["points"], batch["num_points"], reps=10)

if "fwd" in SECTIONS:
    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)[0])
    timed("full forward (vox+net)", fwd, pvars, batch)
    predict = model.make_predict_fn()
    timed("full predict (fwd+decode+NMS)", predict, pvars, batch)

if "pfn" in SECTIONS:
    from objectdetection_3d_tpu.models.layers import PillarFeatureNet

    vox = jax.jit(lambda p, n: model.voxelize_batch(p, n))(
        batch["points"], batch["num_points"])
    sync(vox["voxels"])
    pfn = PillarFeatureNet(
        feat_channels=(20,), voxel_size=(0.1, 0.1, 0.3),
        point_cloud_range=tuple(model.point_cloud_range), dtype=BF)
    pv = {"params": variables["params"]["voxel_encoder"],
          "batch_stats": variables["batch_stats"]["voxel_encoder"]}

    def pfn_scatter(pv, vox):
        f = pfn.apply(pv, vox["voxels"][0], vox["num_points_per_voxel"][0],
                      vox["coords"][0], vox["voxel_mask"][0], False)
        f = f.astype(BF)
        fm = vox["voxel_mask"][0]
        zi = jnp.where(fm, vox["coords"][0][:, 0], D)
        yi = jnp.where(fm, vox["coords"][0][:, 1], H)
        xi = jnp.where(fm, vox["coords"][0][:, 2], W)
        grid = jnp.zeros((D, H, W, f.shape[-1]), BF).at[zi, yi, xi].set(
            f, mode="drop", unique_indices=True, indices_are_sorted=True)
        return grid

    timed("PFN + scatter", jax.jit(pfn_scatter), pv, vox)

    def pfn_only(pv, vox):
        return pfn.apply(pv, vox["voxels"][0], vox["num_points_per_voxel"][0],
                         vox["coords"][0], vox["voxel_mask"][0], False)

    feats20 = jax.jit(pfn_only)(pv, vox)
    sync(feats20)
    timed("PFN only", jax.jit(pfn_only), pv, vox)

    def scatter_only(f, vox):
        fm = vox["voxel_mask"][0]
        zi = jnp.where(fm, vox["coords"][0][:, 0], D)
        yi = jnp.where(fm, vox["coords"][0][:, 1], H)
        xi = jnp.where(fm, vox["coords"][0][:, 2], W)
        return jnp.zeros((D, H, W, f.shape[-1]), BF).at[zi, yi, xi].set(
            f.astype(BF), mode="drop", unique_indices=True,
            indices_are_sorted=True)

    timed("scatter only", jax.jit(scatter_only), feats20, vox)

    # point-level segment-max prototype cost (the PFN refactor candidate)
    P = model.tpu_cfg["max_points_static"]
    y = jax.jit(lambda k: jax.random.normal(k, (P, 20), BF))(
        jax.random.PRNGKey(1))
    seg = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (P,), 0, V))
    sync(y)

    def segmax(y, seg):
        return jax.ops.segment_max(y, seg, num_segments=V,
                                   indices_are_sorted=True)

    timed("segment_max (200k pts -> 120k vox)", jax.jit(segmax), y, seg)

if "enc" in SECTIONS:
    from objectdetection_3d_tpu.models.layers import SparseMiddleExtractor

    full = (20, 32, 64, 128, 196)
    grid, mask = synth_grid(20)
    for k in range(1, len(full) + 1):
        enc = SparseMiddleExtractor(in_channels=20,
                                    out_channels=full[:k], dtype=BF)
        ev = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, D, 16, 16, 20), BF),
                      jnp.ones((1, D, 16, 16), BF), False)
        fn = jax.jit(lambda v, x, m, e=enc: e.apply(v, x, m, False)[0])
        timed(f"encoder stages 1..{k}", fn, ev, grid, mask)

if "pointpfn" in SECTIONS:
    # point-path pieces: voxelize_points, PFN segment path, grid scatter
    vp = jax.jit(jax.vmap(model.voxel_layer.points))
    vox = vp(batch["points"], batch["num_points"])
    sync(vox["points"])
    timed("voxelize_points (sort+ids)", vp, batch["points"],
          batch["num_points"])

    def pfn_scatter_point(variables, vox):
        from objectdetection_3d_tpu.models.layers import PillarFeatureNet
        b, p, c = vox["points"].shape
        v = vox["num_points_per_voxel"].shape[1]
        nvp = v + 1
        seg = (jnp.arange(b)[:, None] * nvp + vox["pt_voxel"]).reshape(-1)
        counts_p = jnp.pad(vox["num_points_per_voxel"],
                           ((0, 0), (0, 1))).reshape(-1)
        coords_p = jnp.pad(vox["coords"],
                           ((0, 0), (0, 1), (0, 0))).reshape(b * nvp, 3)
        mask_p = jnp.pad(vox["voxel_mask"], ((0, 0), (0, 1))).reshape(-1)
        pfn = PillarFeatureNet(
            feat_channels=(20,), voxel_size=model.voxel_layer.voxel_size,
            point_cloud_range=model.point_cloud_range, dtype=BF,
            name="voxel_encoder")
        feats = pfn.apply(
            {"params": variables["params"]["voxel_encoder"],
             "batch_stats": variables["batch_stats"]["voxel_encoder"]},
            None, counts_p, coords_p, mask_p, False,
            points=vox["points"].reshape(b * p, -1), seg=seg,
            pt_valid=vox["pt_valid"].reshape(-1),
            max_slots=model.voxel_layer.max_voxel_points)
        return feats

    fn = jax.jit(pfn_scatter_point)
    timed("PFN point path (segment ops)", fn, variables, vox)

    feats = fn(variables, vox)
    sync(feats)

    def scatter_grid(feats, vox):
        b, v = vox["voxel_mask"].shape
        f = feats.reshape(1, -1, 20)[:, :v].reshape(b * v, 20)
        fc = vox["coords"].reshape(b * v, 3)
        fm = vox["voxel_mask"].reshape(b * v)
        bi = jnp.repeat(jnp.arange(b), v)
        zi = jnp.where(fm, fc[:, 0], D)
        yi = jnp.where(fm, fc[:, 1], H)
        xi = jnp.where(fm, fc[:, 2], W)
        return jnp.zeros((b, D, H, W, 20), BF).at[bi, zi, yi, xi].set(
            f.astype(BF), mode="drop", unique_indices=True,
            indices_are_sorted=True)

    timed("grid scatter (B=1)", jax.jit(scatter_grid), feats, vox)

if "scatter2" in SECTIONS:
    # alternatives for the voxel->grid materialization and the
    # voxelize_points internals (both far above their traffic floor)
    vp = jax.jit(jax.vmap(model.voxel_layer.points))
    vox = vp(batch["points"], batch["num_points"])
    sync(vox["points"])
    feats = jax.jit(lambda k: jax.random.normal(k, (V, 20), BF))(
        jax.random.PRNGKey(3))
    sync(feats)
    cc = vox["coords"][0]
    fm = vox["voxel_mask"][0]
    cell_flat = jnp.where(
        fm, (cc[:, 0] * H + cc[:, 1]) * W + cc[:, 2], D * H * W)

    def scat_4d(f, cc, fm):
        zi = jnp.where(fm, cc[:, 0], D)
        yi = jnp.where(fm, cc[:, 1], H)
        xi = jnp.where(fm, cc[:, 2], W)
        return jnp.zeros((D, H, W, 20), BF).at[zi, yi, xi].set(
            f, mode="drop", unique_indices=True, indices_are_sorted=True)

    timed("scatter 4d-idx (baseline)", jax.jit(scat_4d), feats, cc, fm)

    def scat_flat(f, cell):
        return jnp.zeros((D * H * W, 20), BF).at[cell].set(
            f, mode="drop", unique_indices=True,
            indices_are_sorted=True).reshape(D, H, W, 20)

    timed("scatter flat-1d", jax.jit(scat_flat), feats, cell_flat)

    def scat_flat128(f, cell):
        fpad = jnp.pad(f, ((0, 0), (0, 108)))
        return jnp.zeros((D * H * W, 128), BF).at[cell].set(
            fpad, mode="drop", unique_indices=True,
            indices_are_sorted=True)

    timed("scatter flat-1d 128ch", jax.jit(scat_flat128), feats,
          cell_flat)

    def scat_4d_pad32(f, cc, fm):
        zi = jnp.where(fm, cc[:, 0], D)
        yi = jnp.where(fm, cc[:, 1], H)
        xi = jnp.where(fm, cc[:, 2], W)
        fpad = jnp.pad(f, ((0, 0), (0, 12)))
        g = jnp.zeros((D, H, W, 32), BF).at[zi, yi, xi].set(
            fpad, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return g[..., :20]

    timed("scatter 4d 32ch-pad + slice", jax.jit(scat_4d_pad32), feats,
          cc, fm)

    def inverse_gather(f, cell):
        qi = jnp.arange(D * H * W)
        pos = jnp.searchsorted(cell, qi, side="left")
        posc = jnp.clip(pos, 0, V - 1)
        hit = cell[posc] == qi
        out = jnp.where(hit[:, None], f[posc], 0)
        return out.reshape(D, H, W, 20)

    timed("inverse searchsorted+gather", jax.jit(inverse_gather), feats,
          cell_flat)

    # voxelize_points internals
    pts = batch["points"][0]
    n = batch["num_points"][0]

    def sort_only(points, num_points):
        p = points.shape[0]
        idx = jnp.arange(p)
        cell = jnp.where(idx < num_points, idx // 3, p)
        return jax.lax.sort((cell.astype(jnp.int32), -points[:, 3],
                             idx.astype(jnp.int32)), num_keys=2,
                            is_stable=True)

    timed("3-key sort only (P=200k)", jax.jit(sort_only), pts, n)

    def gather_rows(points, order):
        return points[order]

    _, _, order = jax.jit(sort_only)(pts, n)
    sync(order)
    timed("row gather (P=200k, C=4)", jax.jit(gather_rows), pts, order)

if "encz" in SECTIONS:
    from objectdetection_3d_tpu.models.layers import SparseMiddleExtractor

    full = (20, 32, 64, 128, 196)
    grid, mask = synth_grid(20)
    for k in range(1, len(full) + 1):
        enc = SparseMiddleExtractor(in_channels=20,
                                    out_channels=full[:k], dtype=BF,
                                    zfold_convs=True)
        ev = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, D, 16, 16, 20), BF),
                      jnp.ones((1, D, 16, 16), BF), False)
        fn = jax.jit(lambda v, x, m, e=enc: e.apply(v, x, m, False)[0])
        timed(f"zfold encoder stages 1..{k}", fn, ev, grid, mask)

if "fwdz" in SECTIONS:
    zmodel = PointPillars(**g._flagship_cfg({"zfold_convs": True}))
    zvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    predict = zmodel.make_predict_fn()
    timed("zfold full predict (fwd+decode+NMS)", predict, zvars, batch)

if "s1parts" in SECTIONS:
    # where does stage-1 time actually go?  isolated pieces of
    # subm->mask->BN->relu->down->BN on the (1,100,400,400,20) grid
    grid, mask = synth_grid(20)
    scale = jnp.ones((20,), jnp.float32)

    def elemwise(x, m):
        y = (x * m[..., None] - 0.1) * scale.astype(x.dtype) + 0.2
        return jax.nn.relu(y)

    timed("s1 mask+bn+relu pass (C=20)", jax.jit(elemwise), grid, mask)

    kd = jnp.asarray(np.random.standard_normal((3, 1, 1, 20, 32)) * .1, BF)

    def down_native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    timed("s1 down conv native (20->32, z100->49)", jax.jit(down_native),
          grid, kd)

    def down_fold(x, k, zb=4):
        # fold zb output z-steps (2*zb+1 input slices) into channels:
        # out[a] = sum_t k[t] x[2a+t]
        b, d, h, w, c = x.shape
        co = k.shape[-1]
        d_out = (d - 3) // 2 + 1
        dblk = -(-d_out // zb)
        span = 2 * zb + 1
        xp = jnp.pad(x, ((0, 0), (0, 2 * zb * dblk + 3 - d), (0, 0),
                         (0, 0), (0, 0)))
        xo = jnp.stack([xp[:, 2 * zb * i:2 * zb * i + span]
                        for i in range(dblk)], axis=1)
        xo = jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, span * c)
        kf = jnp.zeros((1, 1, span * c, zb * co), k.dtype)
        for a in range(zb):
            for t in range(3):
                j = 2 * a + t
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * co:(a + 1) * co].set(k[t, 0, 0])
        y = jax.lax.conv_general_dilated(
            xo, kf, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(
            b, dblk * zb, h, w, co)
        return y[:, :d_out]

    ref = jax.jit(down_native)(grid[:, :, :32, :32], kd)
    got = jax.jit(down_fold)(grid[:, :, :32, :32], kd)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"down_fold correctness: max err {err:.2e}", flush=True)
    timed("s1 down conv folded GEMM (zb=4)", jax.jit(down_fold), grid, kd)

    # unfold/refold relayout cost alone
    def unfold_refold(x):
        b, d, h, w, c = x.shape
        zb = 4
        dblk = d // zb
        y = x[:, :dblk * zb].reshape(b, dblk, zb, h, w, c)
        y = jnp.transpose(y, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, zb * c)
        z = y.reshape(b, dblk, h, w, zb, c)
        z = jnp.transpose(z, (0, 1, 4, 2, 3, 5)).reshape(
            b, dblk * zb, h, w, c)
        return z

    timed("fold+unfold relayout roundtrip", jax.jit(unfold_refold), grid)

if "rpn" in SECTIONS:
    from objectdetection_3d_tpu.models.layers import SubmanifoldSparseRPN

    rpn = SubmanifoldSparseRPN(out_channels=(196, 128, 128),
                               layer_nums=(1, 1, 1), dtype=BF)
    x = jax.jit(lambda k: jax.random.normal(k, (1, H, W, 392), BF))(
        jax.random.PRNGKey(0))
    m = jnp.ones((1, H, W), BF)
    sync(x)
    rv = rpn.init(jax.random.PRNGKey(0), x[:, :16, :16], m[:, :16, :16],
                  False)
    fn = jax.jit(lambda v, x, m: rpn.apply(v, x, m, False))
    timed("RPN (6 convs, 392->...->128)", fn, rv, x, m)

if "tail" in SECTIONS:
    A = model.num_anchors

    @jax.jit
    def make_tail(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return (jax.random.normal(k1, (1, H, W, A * 1)),
                jax.random.normal(k2, (1, H, W, A * 9)) * 0.05,
                jax.random.normal(k3, (1, H, W, A * 6)))

    cls, reg, dirs = make_tail(jax.random.PRNGKey(0))
    sync(cls)

    def tail(cls, reg, dirs, anchors):
        return jax.vmap(model._predict_single,
                        in_axes=(0, 0, 0, None))(cls, reg, dirs, anchors)

    fn = jax.jit(tail)
    timed("decode + NMS tail", fn, cls, reg, dirs, model.anchors)

if "s1" in SECTIONS:
    # stage-1 subm conv formulations, 20 -> 20 channels on the full grid
    grid, mask = synth_grid(20)
    kern = jnp.asarray(
        np.random.standard_normal((3, 3, 3, 20, 20)) * 0.1, BF)

    def xla3d(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    timed("s1 conv3d XLA NDHWC", jax.jit(xla3d), grid, kern)

    def decomp(x, k):
        b, d, h, w, c = x.shape
        flat = x.reshape(b * d, h, w, c)
        outs = []
        for i in range(3):
            y = jax.lax.conv_general_dilated(
                flat, k[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y.reshape(b, d, h, w, -1))
        zero = jnp.zeros_like(outs[0][:, :1])
        return (jnp.concatenate([zero, outs[0][:, :-1]], 1) + outs[1]
                + jnp.concatenate([outs[2][:, 1:], zero], 1))

    timed("s1 conv3d decomposed 2D", jax.jit(decomp), grid, kern)

    def fold_kernel(k):
        """(3,3,3,C,Co) -> (3,3,3,4C,4Co) space-to-depth folded over H,W."""
        k = np.asarray(k, np.float32)
        c, co = k.shape[3], k.shape[4]
        kf = np.zeros((3, 3, 3, 4, c, 4, co), np.float32)
        for a in range(2):       # output sub-row
            for bb in range(2):  # output sub-col
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        t, u = a + dy, bb + dx
                        p, a2 = t >> 1, t & 1
                        q, b2 = u >> 1, u & 1
                        kf[:, p + 1, q + 1, a2 * 2 + b2, :,
                           a * 2 + bb, :] += k[:, dy + 1, dx + 1]
        return jnp.asarray(kf.reshape(3, 3, 3, 4 * c, 4 * co), BF)

    kf = fold_kernel(kern)

    def s2d(x, kf):
        b, d, h, w, c = x.shape
        xf = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
        xf = xf.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, d, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xf, kf, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y.reshape(b, d, h // 2, w // 2, 2, 2, c)
        return y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d, h, w, c)

    timed("s1 conv3d space-to-depth 2x2", jax.jit(s2d), grid, kf)

    if jax.default_backend() == "tpu":
        from objectdetection_3d_tpu.ops.pallas_conv import subm_conv3d_pallas

        timed("s1 pallas im2col", jax.jit(subm_conv3d_pallas), grid, kern)

if "sparse" in SECTIONS:
    from objectdetection_3d_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(D * H * W, size=V, replace=False)).astype(
        np.int32)
    xo = ids % W
    yo = (ids // W) % H
    zo = ids // (W * H)
    coords = jnp.asarray(np.stack([zo, yo, xo], -1), jnp.int32)
    cell_flat = jnp.asarray(ids)
    amask = jnp.ones((V,), bool)
    feats = jnp.asarray(rng.standard_normal((V, 20)), BF)
    kern = jnp.asarray(np.random.standard_normal((3, 3, 3, 20, 20)) * 0.1,
                       BF)

    imap = jax.jit(lambda cf: sc.build_index_map(cf, (D, H, W)))(cell_flat)
    sync(imap)
    fn = jax.jit(lambda f, c, im, m, k: sc.subm_conv3d_sparse(
        f, c, im, m, k, (D, H, W)))
    timed("sparse subm conv 20->20 (V=120k)", fn, feats, coords, imap,
          amask, kern)
    timed("sparse: build_index_map", jax.jit(
        lambda cf: sc.build_index_map(cf, (D, H, W))), cell_flat)

    from objectdetection_3d_tpu.models.sparse_middle import (
        SparseMiddleExtractorGather)
    enc = SparseMiddleExtractorGather(
        in_channels=20, out_channels=(20, 32, 64, 128, 196),
        grid=(D, H, W), budget=V, dtype=BF)
    ev = enc.init(jax.random.PRNGKey(0), feats[None, :256],
                  coords[None, :256], cell_flat[None, :256],
                  amask[None, :256], False)
    fn2 = jax.jit(lambda v, f, c, cf, m, e=enc: e.apply(
        v, f, c, cf, m, False))
    timed("sparse encoder FULL (5 stages)", fn2, ev, feats[None],
          coords[None], cell_flat[None], amask[None])

    def lookups_only(c, cf, m):
        z, y, x = c[:, 0], c[:, 1], c[:, 2]
        acc = jnp.zeros((V,), jnp.int32)
        sentinel = jnp.int32(W * H * D)
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    zz, yy, xx = z + dz, y + dy, x + dx
                    ok = (m & (zz >= 0) & (zz < D) & (yy >= 0) & (yy < H)
                          & (xx >= 0) & (xx < W))
                    q = jnp.where(ok, (zz * H + yy) * W + xx, sentinel)
                    idx, found = sc._neighbor_lookup(cf, q)
                    acc += idx * found
        return acc

    timed("sparse: 27x searchsorted only", jax.jit(lookups_only), coords,
          cell_flat, amask)

    idx0 = jnp.asarray(rng.integers(0, V, size=(27, V)), jnp.int32)

    def gathers_only(f, idx):
        outs = [f[idx[k]] for k in range(27)]
        return sum(outs)

    timed("sparse: 27x row gather only", jax.jit(gathers_only), feats, idx0)

if "train" in SECTIONS:
    import optax
    from objectdetection_3d_tpu.models.assign import assign_targets

    G = batch["bboxes"].shape[1]
    anchors = model.anchors
    aabb = model.anchor_aabb

    fn = jax.jit(lambda gt, lbl, msk: assign_targets(
        anchors, gt, lbl, msk, pos_thr=model._pos_thr,
        neg_thr=model._neg_thr,
        candidates_per_gt=int(model.tpu_cfg["assign_candidates_per_gt"]),
        num_classes=model.num_classes, anchor_aabb=aabb))
    timed("assign_targets (full)", fn, batch["bboxes"][0],
          batch["labels"][0], batch["gt_mask"][0])

    # prefilter alone: upper bound + top_k over 1.92M anchors
    from objectdetection_3d_tpu.models.assign import (_aabb_and_volume,
                                                      _upper_bound_rows)
    an_lo, an_hi, an_vol = aabb
    K = int(model.tpu_cfg["assign_candidates_per_gt"])

    def prefilter(gt):
        gt_lo, gt_hi, gt_vol = _aabb_and_volume(gt)
        ub = _upper_bound_rows(gt_lo, gt_hi, gt_vol, an_lo, an_hi, an_vol)
        return jax.lax.top_k(ub, K)[1]

    timed(f"prefilter ub+top_k (G={G}, K={K})", jax.jit(prefilter),
          batch["bboxes"][0])

    def prefilter_approx(gt):
        gt_lo, gt_hi, gt_vol = _aabb_and_volume(gt)
        ub = _upper_bound_rows(gt_lo, gt_hi, gt_vol, an_lo, an_hi, an_vol)
        return jax.lax.approx_max_k(ub, K)[1]

    timed("prefilter ub+approx_max_k", jax.jit(prefilter_approx),
          batch["bboxes"][0])

    from objectdetection_3d_tpu.models.assign import _blockwise_topk

    def prefilter_block(gt):
        gt_lo, gt_hi, gt_vol = _aabb_and_volume(gt)
        ub = _upper_bound_rows(gt_lo, gt_hi, gt_vol, an_lo, an_hi, an_vol)
        return _blockwise_topk(ub, K, 128)

    timed("prefilter ub+blockwise exact topk", jax.jit(prefilter_block),
          batch["bboxes"][0])

    pvars = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}

    def fwd_loss(v, b):
        outs, _ = model.apply(v, b, train=False)
        return sum(model.loss(outs, b, anchors, aabb).values())

    timed("forward + loss (no grad)", jax.jit(fwd_loss), pvars, batch)

    # the realistic training memory mode (native conv3d training OOMs)
    tmodel = PointPillars(**g._flagship_cfg(
        {"decompose_convs": True, "remat": True}))
    tx = tmodel.get_optimizer({"lr": 1e-4}, grad_clip_value=1.0)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    step = tmodel.make_train_step(tx, donate=False)
    timed("train step (decompose+remat)", step, state, batch)

if "trainz" in SECTIONS:
    # can zfold replace the decomposition for training memory AND win time?
    zt = PointPillars(**g._flagship_cfg(
        {"decompose_convs": False, "zfold_convs": True, "remat": True}))
    tx = zt.get_optimizer({"lr": 1e-4}, grad_clip_value=1.0)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    step = zt.make_train_step(tx, donate=False)
    timed("train step (zfold+remat)", step, state, batch)

if "batched" in SECTIONS:
    for bsz in (2, 4):
        bb = g._synth_batch(bsz, model.tpu_cfg["max_points_static"],
                            model.tpu_cfg["max_gt_static"],
                            model.point_cloud_range)
        predict = model.make_predict_fn()
        ms = timed(f"zfold predict B={bsz}", predict,
                   {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}, bb, reps=3)
        print(f"  -> {bsz * 1000.0 / ms:.2f} clouds/s", flush=True)

if "zf" in SECTIONS:
    # z-folded wide-channel formulations of the stage-1 subm conv:
    # burn (zb+2)/3 x FLOPs on banded weights to lift the channel dims
    # from 20 to ~160 where XLA's conv emitter is ~10x more efficient
    grid, mask = synth_grid(20)
    kern = jnp.asarray(
        np.random.standard_normal((3, 3, 3, 20, 20)) * 0.1, BF)

    def fold_explicit(x, kernel, zb):
        b, d, h, w, c = x.shape
        co = kernel.shape[-1]
        dblk = -(-d // zb)
        dpad = dblk * zb
        xp = jnp.pad(x, ((0, 0), (1, dpad - d + 1), (0, 0), (0, 0),
                         (0, 0)))
        # overlap blocks: block k holds z slices [k*zb-1, k*zb+zb+1)
        xo = jnp.stack([xp[:, k * zb:k * zb + zb + 2] for k in range(dblk)],
                       axis=1)                     # (b, dblk, zb+2, h, w, c)
        xo = jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, (zb + 2) * c)
        kf = jnp.zeros((3, 3, (zb + 2) * c, zb * co), kernel.dtype)
        for a in range(zb):
            for dz in range(3):
                j = a + dz
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * co:(a + 1) * co].set(kernel[dz])
        y = jax.lax.conv_general_dilated(
            xo, kf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(
            b, dpad, h, w, co)
        return y[:, :d]

    def fold_strided(x, kernel, zb):
        b, d, h, w, c = x.shape
        co = kernel.shape[-1]
        dblk = -(-d // zb)
        dpad = dblk * zb
        xp = jnp.pad(x, ((0, 0), (1, dpad - d + 1), (0, 0), (0, 0),
                         (0, 0)))
        kf = jnp.zeros((zb + 2, 3, 3, c, zb * co), kernel.dtype)
        for a in range(zb):
            for dz in range(3):
                kf = kf.at[a + dz, :, :, :,
                           a * co:(a + 1) * co].set(kernel[dz])
        y = jax.lax.conv_general_dilated(
            xp, kf, (zb, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y.reshape(b, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, dpad, h, w, co)
        return y[:, :d]

    def xla3d(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    ref = jax.jit(xla3d)(grid[:, :, :32, :32], kern)
    for zb in (4, 6, 10):
        got = jax.jit(lambda x, k, f=fold_explicit, z=zb: f(x, k, z))(
            grid[:, :, :32, :32], kern)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-2, (zb, err)
    print("zfold correctness vs conv3d: OK", flush=True)

    for zb in (4, 6, 10):
        timed(f"s1 zfold explicit zb={zb}",
              jax.jit(lambda x, k, z=zb: fold_explicit(x, k, z)), grid, kern)
    for zb in (4, 6, 10):
        timed(f"s1 zfold strided-conv3d zb={zb}",
              jax.jit(lambda x, k, z=zb: fold_strided(x, k, z)), grid, kern)

if "zfoldin" in SECTIONS:
    # How much of the z-folded stage-1 subm conv is the INPUT fold
    # relayout (pad + stack + transpose + reshape of the full grid)?
    # If it is a large share, a folded-layout grid scatter (writing the
    # (dblk, H, W, (zb+2)C) buffer directly from voxel features) would
    # save a full round trip over the largest tensor.
    grid, mask = synth_grid(20)
    kern = jnp.asarray(
        np.random.standard_normal((3, 3, 3, 20, 20)) * 0.1, BF)
    ZB = 4

    def fold_input(x, zb=ZB):
        b, d, h, w, c = x.shape
        dblk = -(-d // zb)
        dpad = dblk * zb
        xp = jnp.pad(x, ((0, 0), (1, dpad - d + 1), (0, 0), (0, 0),
                         (0, 0)))
        xo = jnp.stack([xp[:, k * zb:k * zb + zb + 2]
                        for k in range(dblk)], axis=1)
        return jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, (zb + 2) * c)

    def banded_kernel(kernel, zb=ZB):
        c, co = kernel.shape[-2], kernel.shape[-1]
        kf = jnp.zeros((3, 3, (zb + 2) * c, zb * co), kernel.dtype)
        for a in range(zb):
            for dz in range(3):
                j = a + dz
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * co:(a + 1) * co].set(kernel[dz])
        return kf

    def conv_on_folded(xo, kf):
        return jax.lax.conv_general_dilated(
            xo, kf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def unfold_output(y, d, co, zb=ZB):
        bd, h, w, _ = y.shape
        dblk = bd  # b = 1
        y = y.reshape(1, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(
            1, dblk * zb, h, w, co)
        return y[:, :d]

    def full_zfold(x, kernel):
        xo = fold_input(x)
        y = conv_on_folded(xo, banded_kernel(kernel).astype(x.dtype))
        return unfold_output(y, x.shape[1], kernel.shape[-1])

    timed("s1 zfold FULL (fold+conv+unfold)", jax.jit(full_zfold),
          grid, kern)

    xo_dev = jax.jit(fold_input)(grid)
    sync(xo_dev)
    kf_dev = jax.jit(lambda k: banded_kernel(k).astype(BF))(kern)
    sync(kf_dev)
    print(f"folded input: {xo_dev.shape} {xo_dev.dtype}", flush=True)

    timed("s1 conv on PRE-FOLDED input", jax.jit(conv_on_folded),
          xo_dev, kf_dev)

    def conv_unfold(xo, kf):
        return unfold_output(conv_on_folded(xo, kf), 100, 20)

    timed("s1 conv+unfold on PRE-FOLDED input", jax.jit(conv_unfold),
          xo_dev, kf_dev)
    timed("s1 fold_input alone", jax.jit(fold_input), grid)
