"""Full-chain golden parity: one imported torch state_dict driven through
the ENTIRE forward chain.

The torch/numpy composite below independently reproduces the reference's
forward semantics (model/PointPillars.py:94-140): voxelize -> decorated
PFN -> grid scatter -> spconv-semantics vertical encoder (dense conv3d +
active-set masking) -> submanifold RPN -> head convs, then decode + greedy
NMS (model/PointPillars.py:1025-1094, model/utils.py:353-426).  Our model
consumes the SAME weights via ``pointpillars_variables_from_torch`` and
must match end-to-end — head outputs to float tolerance and final
detections box-for-box.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import jax  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.models.torch_import import (  # noqa: E402
    pointpillars_variables_from_torch,
)
from oracles import box_corners_np, greedy_nms_np, voxelize_np  # noqa: E402
from test_torch_import import _rand_bn  # noqa: E402
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


# -------------------------------------------------------------------------
# fixture: tiny model + a full reference-shaped state_dict
# -------------------------------------------------------------------------
def _cfg():
    cfg = tiny_model_cfg()
    # 2D NMS path: its AABB-envelope IoU has an exact numpy oracle (the 3D
    # clipping kernel is Monte-Carlo-oracle-tested in test_iou3d.py)
    cfg["head"]["nms_dim"] = 2
    # keep the voxel budget above the scene's occupancy: when the cap is
    # hit, the reference drops voxels in reflectance-visit order while the
    # device voxelizer drops in raster order (cap semantics are pinned in
    # test_voxelize.py; this test pins the network chain)
    cfg["tpu"]["max_voxels_static"] = 1024
    cfg["voxelize"]["max_voxels"] = 1024
    return cfg


def _state_dict(rng):
    """Reference-shaped random weights for the tiny config (same recipe as
    test_torch_import.test_full_tree_structure_matches_init)."""
    sd = {"voxel_encoder.pfn_layers.0.linear.weight":
          rng.normal(0, 0.5, (15, 9)).astype(np.float32)}
    sd.update(_rand_bn(rng, 15, "voxel_encoder.pfn_layers.0.norm"))
    sd["pseudoimage_generator.middle_conv.0.weight"] = rng.normal(
        0, 0.3, (16, 3, 3, 3, 16)).astype(np.float32)
    sd.update(_rand_bn(rng, 16, "pseudoimage_generator.middle_conv.1"))
    sd["pseudoimage_generator.middle_conv.3.weight"] = rng.normal(
        0, 0.3, (16, 3, 1, 1, 16)).astype(np.float32)
    sd.update(_rand_bn(rng, 16, "pseudoimage_generator.middle_conv.4"))
    c_prev = 16  # C * D_final (tiny grid z collapses 4 -> 1)
    for k in range(4):
        sd[f"sparse_rpn.blocks.{3 * k}.weight"] = rng.normal(
            0, 0.3, (16, 3, 3, c_prev)).astype(np.float32)
        sd.update(_rand_bn(rng, 16, f"sparse_rpn.blocks.{3 * k + 1}"))
        c_prev = 16
    # reg weights at realistic (trained) magnitude: decode exponentiates
    # the size deltas, so large random weights overflow float32 for both
    # implementations and the comparison would be nan vs nan
    for name, out, std in (("conv_cls", 4, 0.1), ("conv_reg", 36, 0.01)):
        sd[f"bbox_head.{name}.weight"] = rng.normal(
            0, std, (out, 16, 1, 1)).astype(np.float32)
        sd[f"bbox_head.{name}.bias"] = rng.normal(
            0, std, out).astype(np.float32)
    for ax in "xyz":
        sd[f"bbox_head.conv_dir_cls_{ax}.weight"] = rng.normal(
            0, 0.1, (8, 16, 1, 1)).astype(np.float32)
        sd[f"bbox_head.conv_dir_cls_{ax}.bias"] = rng.normal(
            0, 0.1, 8).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def chain():
    rng = np.random.default_rng(11)
    sd = _state_dict(rng)
    model = PointPillars(**_cfg())
    variables = pointpillars_variables_from_torch(
        sd, num_pfn_layers=1, num_middle_stages=1, num_rpn_convs=4)
    batch = tiny_batch(batch_size=1, num_gt=3, seed=21)
    return model, sd, variables, batch


def _bn_affine(x, sd, prefix, eps):
    return ((x - sd[prefix + ".running_mean"])
            / np.sqrt(sd[prefix + ".running_var"] + eps)
            * sd[prefix + ".weight"] + sd[prefix + ".bias"])


# -------------------------------------------------------------------------
# torch/numpy composite of the reference forward chain
# -------------------------------------------------------------------------
def reference_head_outputs(model, sd, batch):
    """(cls, reg, dirs) numpy head outputs of the torch composite chain."""
    pcr = np.asarray(model.point_cloud_range)
    vsz = np.asarray(model.voxel_layer.voxel_size)
    m_slots = model.voxel_layer.max_voxel_points
    d, h, w = model.grid_dhw

    pts = batch["points"][0][:batch["num_points"][0]]
    voxels, coords = voxelize_np(pts, vsz, pcr, m_slots,
                                 model.voxel_layer.max_voxels,
                                 reflectance_sampling=True)

    # ---- PillarFeatureNet (reference model/PointPillars.py:426-526) -----
    w_pfn = sd["voxel_encoder.pfn_layers.0.linear.weight"]  # (15, 9)
    pad_feat = np.maximum(  # the transformed all-zero padding slot
        _bn_affine(np.zeros((1, 15), np.float32), sd,
                   "voxel_encoder.pfn_layers.0.norm", eps=1e-3), 0.0)[0]

    grid = np.zeros((1, d, h, w, 16), np.float32)
    active3d = np.zeros((1, d, h, w), bool)
    for (cx, cy, cz), plist in voxels.items():
        arr = np.stack(plist)  # (n, 4) in x-fastest coord order
        n = len(arr)
        centroid = arr[:, :3].mean(0)
        px = arr[:, 0] - (cx * vsz[0] + vsz[0] / 2 + pcr[0])
        py = arr[:, 1] - (cy * vsz[1] + vsz[1] / 2 + pcr[1])
        dec = np.concatenate(
            [arr, arr[:, :3] - centroid, px[:, None], py[:, None]], -1)
        y = np.maximum(_bn_affine(dec @ w_pfn.T, sd,
                                  "voxel_encoder.pfn_layers.0.norm",
                                  eps=1e-3), 0.0)
        pooled = y.max(0)
        if n < m_slots:  # padding slots participate in the max (quirk)
            pooled = np.maximum(pooled, pad_feat)
        grid[0, cz, cy, cx] = np.concatenate([pooled, [float(n)]])
        active3d[0, cz, cy, cx] = True

    # ---- vertical encoder: spconv semantics via dense conv + masks ------
    # (reference model/PointPillars.py:529-573)
    tx = torch.tensor(np.transpose(grid, (0, 4, 1, 2, 3)))
    w_subm = torch.tensor(np.transpose(
        sd["pseudoimage_generator.middle_conv.0.weight"], (0, 4, 1, 2, 3)))
    y = np.transpose(np.asarray(
        torch.nn.functional.conv3d(tx, w_subm, padding=1).detach()),
        (0, 2, 3, 4, 1))
    # submanifold: outputs only at active input sites; BN affine likewise
    y = np.where(active3d[..., None],
                 np.maximum(_bn_affine(
                     y, sd, "pseudoimage_generator.middle_conv.1",
                     eps=1e-5), 0.0), 0.0)

    w_down = torch.tensor(np.transpose(
        sd["pseudoimage_generator.middle_conv.3.weight"], (0, 4, 1, 2, 3)))
    y2 = np.transpose(np.asarray(torch.nn.functional.conv3d(
        torch.tensor(np.transpose(y, (0, 4, 1, 2, 3))).float(), w_down,
        stride=(2, 1, 1)).detach()), (0, 2, 3, 4, 1))
    # regular sparse conv: output site active iff any input site in its
    # receptive field is
    mask_in = torch.tensor(active3d[:, None].astype(np.float32))
    mask_out = np.asarray(torch.nn.functional.conv3d(
        mask_in, torch.ones((1, 1, 3, 1, 1)), stride=(2, 1, 1)).detach()
    )[:, 0] > 0
    y2 = np.where(mask_out[..., None],
                  np.maximum(_bn_affine(
                      y2, sd, "pseudoimage_generator.middle_conv.4",
                      eps=1e-5), 0.0), 0.0)
    bo, do, ho, wo, co = y2.shape
    # .dense() (N,C,D,H,W) then view(N, C*D, H, W): (c, d) flatten order
    pseudo = np.transpose(y2, (0, 2, 3, 4, 1)).reshape(bo, ho, wo, co * do)

    # ---- submanifold RPN (reference model/PointPillars.py:714-793) ------
    active2d = np.any(pseudo != 0, axis=-1)
    x2 = pseudo
    for k in range(4):
        wk = np.transpose(sd[f"sparse_rpn.blocks.{3 * k}.weight"],
                          (0, 3, 1, 2))
        y = np.asarray(torch.nn.functional.conv2d(
            torch.tensor(np.transpose(x2, (0, 3, 1, 2))).float(),
            torch.tensor(wk), padding=1).detach())
        y = np.transpose(y, (0, 2, 3, 1))
        x2 = np.where(active2d[..., None],
                      np.maximum(_bn_affine(
                          y, sd, f"sparse_rpn.blocks.{3 * k + 1}",
                          eps=1e-3), 0.0), 0.0)

    # ---- head (reference model/PointPillars.py:843-884) -----------------
    tin = torch.tensor(np.transpose(x2, (0, 3, 1, 2))).float()

    def conv1x1(name):
        return np.transpose(np.asarray(torch.nn.functional.conv2d(
            tin, torch.tensor(sd[f"bbox_head.{name}.weight"]),
            torch.tensor(sd[f"bbox_head.{name}.bias"])).detach()),
            (0, 2, 3, 1))

    cls = conv1x1("conv_cls")
    reg = conv1x1("conv_reg")
    dx, dy, dz = (conv1x1(f"conv_dir_cls_{ax}") for ax in "xyz")
    # interleave (x0,x1,y0,y1,z0,z1) per anchor like our conv_dir layout
    a = dx.shape[-1] // 2
    dirs = np.stack([t.reshape(*dx.shape[:-1], a, 2)
                     for t in (dx, dy, dz)], axis=-2)  # (..., A, 3, 2)
    dirs = dirs.reshape(*dx.shape[:-1], a * 6)
    return cls, reg, dirs


def reference_predict(model, cls, reg, dirs):
    """Numpy decode + greedy NMS on the composite head outputs (reference
    get_bboxes_single, model/PointPillars.py:1025-1094)."""
    hc = model.head_cfg
    nms_pre = int(hc["nms_pre"])
    score_thr = float(hc["score_thr"])
    iou_thr = float(hc["nms_thresh"])
    anchors = np.asarray(model.anchors)

    logits = cls.reshape(-1, max(model.num_classes, 1))
    row = logits.max(-1)
    top = np.argsort(-row, kind="stable")[:min(nms_pre, len(row))]

    an = anchors[top]
    de = reg.reshape(-1, 9)[top]
    # BBoxCoder.decode (reference model/utils.py:308-337, z-center quirk)
    diag = np.sqrt(an[:, 3] ** 2 + an[:, 4] ** 2)
    boxes = np.stack([
        de[:, 0] * diag + an[:, 0],
        de[:, 1] * diag + an[:, 1],
        de[:, 2] * an[:, 5] + an[:, 2] + an[:, 5] / 2,
        np.exp(de[:, 3]) * an[:, 3],
        np.exp(de[:, 4]) * an[:, 4],
        np.exp(de[:, 5]) * an[:, 5],
        de[:, 6] + an[:, 6],
        de[:, 7] + an[:, 7],
        de[:, 8] + an[:, 8],
    ], -1)
    scores = 1 / (1 + np.exp(-logits[top]))
    bins = np.argmax(dirs.reshape(-1, 3, 2)[top], axis=-1)

    # 2D path: AABB envelope of the rotated corners (model/utils.py:368-374)
    env = np.stack([np.concatenate([
        box_corners_np(b)[:, :2].min(0), box_corners_np(b)[:, :2].max(0)])
        for b in boxes])
    ix1 = np.maximum(env[:, None, 0], env[None, :, 0])
    iy1 = np.maximum(env[:, None, 1], env[None, :, 1])
    ix2 = np.minimum(env[:, None, 2], env[None, :, 2])
    iy2 = np.minimum(env[:, None, 3], env[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area = (env[:, 2] - env[:, 0]) * (env[:, 3] - env[:, 1])
    iou = inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-12)

    keep = greedy_nms_np(iou, scores[:, 0], score_thr, iou_thr)

    # direction recovery (model/PointPillars.py:1085-1092):
    # limit_period(val, offset=1, period=pi) + pi * bin
    rot = boxes[:, 6:9]
    rot = rot - np.floor(rot / np.pi + 1.0) * np.pi + np.pi * bins
    boxes = np.concatenate([boxes[:, :6], rot], -1)
    out = [(float(scores[i, 0]), boxes[i]) for i in keep]
    out.sort(key=lambda t: -t[0])
    return out


# -------------------------------------------------------------------------
# the tests
# -------------------------------------------------------------------------
def test_head_outputs_match_torch_composite(chain):
    model, sd, variables, batch = chain
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    (cls, reg, dirs), _ = model.apply(variables, dev, train=False)

    ref_cls, ref_reg, ref_dirs = reference_head_outputs(model, sd, batch)
    assert np.any(ref_cls != 0), "composite produced an empty scene"
    np.testing.assert_allclose(np.asarray(cls), ref_cls,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg), ref_reg,
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dirs), ref_dirs,
                               rtol=1e-3, atol=2e-4)


def test_final_boxes_match_numpy_predict_oracle(chain):
    """End-to-end: our jitted predict (voxelize -> net -> decode -> NMS)
    must produce the same final detections as the independent composite."""
    model, sd, variables, batch = chain
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    preds = model.predict(variables, dev)
    valid = np.asarray(preds["valid"][0])
    got_boxes = np.asarray(preds["bbox"][0])[valid]
    got_scores = np.asarray(preds["score"][0])[valid]

    ref_cls, ref_reg, ref_dirs = reference_head_outputs(model, sd, batch)
    want = reference_predict(model, ref_cls[0], ref_reg[0], ref_dirs[0])

    assert len(want) > 0, "oracle found no detections — test is vacuous"
    assert len(got_boxes) == len(want)
    # our predict returns score-desc order (top_k); oracle sorted the same
    for i, (ws, wb) in enumerate(want):
        np.testing.assert_allclose(got_scores[i], ws, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got_boxes[i], wb, rtol=1e-3, atol=2e-3)
