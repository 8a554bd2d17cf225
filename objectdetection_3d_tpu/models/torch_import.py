"""Import reference PyTorch checkpoints into this framework's flax trees.

The reference ships torch ``.pth`` pickles — the foreground-filter MLP at
``model/models/mlp.pth`` (loaded by reference model/utils.py:107-124) and
training checkpoints ``{epoch, model_state_dict, optimizer_state_dict}``
(reference pipeline/pipeline.py:36-50).  This module converts those
state_dicts to the parameter/batch-stats trees of the flax modules in
``models/layers.py`` so pretrained reference weights can be consumed
directly (and so golden forward-parity tests can pin layer semantics).

Layout conversions (torch -> flax):

* ``nn.Linear``    weight (out, in)            -> Dense kernel (in, out)
* ``nn.Conv2d``    weight (out, in, kh, kw)    -> Conv kernel (kh, kw, in, out)
* ``spconv.SubMConv3d`` (v2.x KRSC layout)
                   weight (out, kd, kh, kw, in) -> kernel (kd, kh, kw, in, out)
* ``spconv.SubMConv2d`` weight (out, kh, kw, in) -> kernel (kh, kw, in, out)
* ``spconv.SparseConv3d`` (3,1,1) weight (out, 3, 1, 1, in) -> (3, in, out)
* ``nn.BatchNorm``  weight/bias/running_mean/running_var ->
                    scale/bias (params) + mean/var (batch_stats)

torch is used only to deserialize; everything becomes numpy immediately.
"""

import numpy as np


def load_torch_state_dict(path):
    """Load a torch ``.pth`` pickle and return a flat {name: numpy} dict.

    Accepts both a bare state_dict and the reference's
    ``{'model_state_dict': ...}`` checkpoint wrapper
    (reference pipeline/pipeline.py:44-49, model/utils.py:115-116).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in ckpt.items() if hasattr(v, "detach")}


def _bn(sd, prefix):
    """(params, stats) pair of one torch BatchNorm."""
    params = {"scale": sd[prefix + ".weight"].astype(np.float32),
              "bias": sd[prefix + ".bias"].astype(np.float32)}
    stats = {"mean": sd[prefix + ".running_mean"].astype(np.float32),
             "var": sd[prefix + ".running_var"].astype(np.float32)}
    return params, stats


def mlp_variables_from_torch(state_dict_or_path):
    """Reference foreground-filter MLP (model/mlp.py:4-88) -> flax
    variables for ``models.layers.MLP``.

    Torch names ``hidden{1..5}/bn{1..5}/hidden6`` map onto our
    ``dense_{0..4}/bn_{0..4}/out``.
    """
    sd = (load_torch_state_dict(state_dict_or_path)
          if isinstance(state_dict_or_path, str) else
          {k: np.asarray(v) for k, v in state_dict_or_path.items()})

    params, stats = {}, {}
    for i in range(5):
        params[f"dense_{i}"] = {
            "kernel": sd[f"hidden{i + 1}.weight"].T.astype(np.float32),
            "bias": sd[f"hidden{i + 1}.bias"].astype(np.float32),
        }
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn(sd, f"bn{i + 1}")
    params["out"] = {
        "kernel": sd["hidden6.weight"].T.astype(np.float32),
        "bias": sd["hidden6.bias"].astype(np.float32),
    }
    return {"params": params, "batch_stats": stats}


def _conv2d_kernel(w):
    """torch / spconv-2d weight -> flax (kh, kw, in, out).

    torch nn.Conv2d stores (out, in, kh, kw); spconv v2 SubMConv2d stores
    channels-last (out, kh, kw, in).  The two are distinguished by which
    axes hold the (square, small) kernel taps.
    """
    w = np.asarray(w, np.float32)
    if w.shape[1] == w.shape[2]:  # (out, kh, kw, in) spconv KRSC
        return np.transpose(w, (1, 2, 3, 0))
    return np.transpose(w, (2, 3, 1, 0))  # (out, in, kh, kw) torch


def pointpillars_variables_from_torch(state_dict_or_path, num_pfn_layers,
                                      num_middle_stages, num_rpn_convs):
    """Reference ``PointPillars`` state_dict -> flax variables for
    ``models.network.PointPillarsNet`` (active path: voxel_encoder ->
    pseudoimage_generator -> sparse_rpn -> bbox_head; the bypassed dense
    backbone/neck weights are ignored, reference model/PointPillars.py:101-103).

    Args:
        num_pfn_layers: len(pfn feat_channels).
        num_middle_stages: len(vertical_encoder out_channels).
        num_rpn_convs: sum(1 + n for n in backbone layer_nums).
    Returns:
        {'params': ..., 'batch_stats': ...} ready for ``net.apply``.
    """
    sd = (load_torch_state_dict(state_dict_or_path)
          if isinstance(state_dict_or_path, str) else
          {k: np.asarray(v) for k, v in state_dict_or_path.items()})

    params, stats = {}, {}

    # --- PillarFeatureNet: pfn_layers.{i}.linear/.norm ------------------
    ve_p, ve_s = {}, {}
    for i in range(num_pfn_layers):
        base = f"voxel_encoder.pfn_layers.{i}"
        ve_p[f"pfn_{i}"] = {
            "linear": {"kernel":
                       sd[base + ".linear.weight"].T.astype(np.float32)},
        }
        bn_p, bn_s = _bn(sd, base + ".norm")
        ve_p[f"pfn_{i}"]["norm"] = bn_p
        ve_s[f"pfn_{i}"] = {"norm": bn_s}
    params["voxel_encoder"] = ve_p
    stats["voxel_encoder"] = ve_s

    # --- vertical encoder: middle_conv SparseSequential ------------------
    # stage i occupies indices [6i..6i+5]: SubMConv3d, BN, ReLU,
    # SparseConv3d, BN, ReLU (reference model/PointPillars.py:545-558)
    mid_p, mid_s = {}, {}
    for i in range(num_middle_stages):
        base = f"pseudoimage_generator.middle_conv.{6 * i}"
        w = np.asarray(sd[base + ".weight"], np.float32)
        # spconv v2 KRSC (out, kd, kh, kw, in) -> (kd, kh, kw, in, out)
        mid_p[f"subm_{i}_kernel"] = np.transpose(w, (1, 2, 3, 4, 0))
        bn_p, bn_s = _bn(sd, f"pseudoimage_generator.middle_conv.{6 * i + 1}")
        mid_p[f"subm_bn_{i}"] = bn_p
        mid_s[f"subm_bn_{i}"] = bn_s

        wd = np.asarray(
            sd[f"pseudoimage_generator.middle_conv.{6 * i + 3}.weight"],
            np.float32)
        # (out, 3, 1, 1, in) -> (3, in, out)
        mid_p[f"down_{i}_kernel"] = np.transpose(wd[:, :, 0, 0, :],
                                                 (1, 2, 0))
        bn_p, bn_s = _bn(sd, f"pseudoimage_generator.middle_conv.{6 * i + 4}")
        mid_p[f"down_bn_{i}"] = bn_p
        mid_s[f"down_bn_{i}"] = bn_s
    params["pseudoimage_generator"] = mid_p
    stats["pseudoimage_generator"] = mid_s

    # --- sparse RPN: blocks.{3k} conv / {3k+1} BN -------------------------
    rpn_p, rpn_s = {}, {}
    for k in range(num_rpn_convs):
        rpn_p[f"conv_{k}"] = {
            "kernel": _conv2d_kernel(sd[f"sparse_rpn.blocks.{3 * k}.weight"])}
        bn_p, bn_s = _bn(sd, f"sparse_rpn.blocks.{3 * k + 1}")
        rpn_p[f"bn_{k}"] = bn_p
        rpn_s[f"bn_{k}"] = bn_s
    params["sparse_rpn"] = rpn_p
    stats["sparse_rpn"] = rpn_s

    # --- head: conv_cls / conv_reg / 3 direction convs --------------------
    head = {}
    for ours, theirs in (("conv_cls", "bbox_head.conv_cls"),
                         ("conv_reg", "bbox_head.conv_reg")):
        head[ours] = {
            "kernel": _conv2d_kernel(sd[theirs + ".weight"]),
            "bias": sd[theirs + ".bias"].astype(np.float32),
        }
    # our single conv_dir orders channels per anchor as
    # (x0, x1, y0, y1, z0, z1); the reference concatenates three (A*2)
    # convs along channels (model/PointPillars.py:884) — interleave them
    wx = _conv2d_kernel(sd["bbox_head.conv_dir_cls_x.weight"])
    wy = _conv2d_kernel(sd["bbox_head.conv_dir_cls_y.weight"])
    wz = _conv2d_kernel(sd["bbox_head.conv_dir_cls_z.weight"])
    bx = sd["bbox_head.conv_dir_cls_x.bias"].astype(np.float32)
    by = sd["bbox_head.conv_dir_cls_y.bias"].astype(np.float32)
    bz = sd["bbox_head.conv_dir_cls_z.bias"].astype(np.float32)
    a2 = wx.shape[-1]
    num_anchors = a2 // 2
    cin = wx.shape[2]
    wk = np.stack([w.reshape(cin, num_anchors, 2)
                   for w in (wx[0, 0], wy[0, 0], wz[0, 0])],
                  axis=2)  # (in, A, 3, 2)
    bk = np.stack([b.reshape(num_anchors, 2) for b in (bx, by, bz)],
                  axis=1)  # (A, 3, 2)
    head["conv_dir"] = {
        "kernel": wk.reshape(1, 1, cin, num_anchors * 6).astype(np.float32),
        "bias": bk.reshape(num_anchors * 6).astype(np.float32),
    }
    params["bbox_head"] = head

    return {"params": params, "batch_stats": stats}
