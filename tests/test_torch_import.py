"""torch->flax weight-importer parity tests.

Golden forward parity: imported reference weights must reproduce the torch
semantics of each layer family (Linear+BN1d PFN, spconv-style vertical
encoder stage, SubMConv2d RPN, Conv2d head with the 3-way direction
interleave) and the shipped ``mlp.pth`` foreground filter exactly.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import jax  # noqa: E402

from objectdetection_3d_tpu.models.layers import (  # noqa: E402
    MLP,
    Anchor3DHead,
    PFNLayer,
    SparseMiddleExtractor,
    SubmanifoldSparseRPN,
)
from objectdetection_3d_tpu.models.torch_import import (  # noqa: E402
    mlp_variables_from_torch,
    pointpillars_variables_from_torch,
)

REF_MLP = "/root/reference/model/models/mlp.pth"


def _bn_eval(x, sd, prefix, eps=1e-5):
    """Numpy eval-mode BatchNorm from a torch state_dict."""
    return ((x - sd[prefix + ".running_mean"])
            / np.sqrt(sd[prefix + ".running_var"] + eps)
            * sd[prefix + ".weight"] + sd[prefix + ".bias"])


def _rand_bn(rng, c, prefix):
    return {
        prefix + ".weight": rng.normal(1, 0.1, c).astype(np.float32),
        prefix + ".bias": rng.normal(0, 0.1, c).astype(np.float32),
        prefix + ".running_mean": rng.normal(0, 0.5, c).astype(np.float32),
        prefix + ".running_var": rng.uniform(0.5, 2, c).astype(np.float32),
    }


@pytest.mark.skipif(not os.path.exists(REF_MLP),
                    reason="reference mlp.pth not mounted")
def test_mlp_import_matches_shipped_checkpoint():
    """Flax MLP with imported mlp.pth == numpy oracle of the reference
    architecture (model/mlp.py:4-88) under the SAME shipped weights."""
    variables = mlp_variables_from_torch(REF_MLP)
    ckpt = torch.load(REF_MLP, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in ckpt["model_state_dict"].items()}

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (64, 37)).astype(np.float32)

    ref = x
    for i in range(1, 6):
        ref = ref @ sd[f"hidden{i}.weight"].T + sd[f"hidden{i}.bias"]
        ref = np.maximum(_bn_eval(ref, sd, f"bn{i}"), 0.0)
    ref = ref @ sd["hidden6.weight"].T + sd["hidden6.bias"]
    ref = 1 / (1 + np.exp(-ref))

    mlp = MLP(input_channels=37)
    got = np.asarray(mlp.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pfn_layer_import_parity():
    """PFNLayer with an imported torch Linear+BN1d reproduces the torch
    eval forward (reference model/PointPillars.py:357-423) on fully-valid
    voxels."""
    rng = np.random.default_rng(1)
    cin, units, v, m = 9, 8, 6, 5
    sd = {"voxel_encoder.pfn_layers.0.linear.weight":
          rng.normal(0, 0.5, (units, cin)).astype(np.float32)}
    sd.update(_rand_bn(rng, units, "voxel_encoder.pfn_layers.0.norm"))

    variables = pointpillars_variables_from_torch(
        sd | _full_ref_sd(rng, skip_pfn=True), num_pfn_layers=1,
        num_middle_stages=1, num_rpn_convs=2)
    pfn_vars = {
        "params": variables["params"]["voxel_encoder"]["pfn_0"],
        "batch_stats": variables["batch_stats"]["voxel_encoder"]["pfn_0"],
    }

    x = rng.normal(0, 1, (v, m, cin)).astype(np.float32)
    ref = x @ sd["voxel_encoder.pfn_layers.0.linear.weight"].T
    ref = _bn_eval(ref, sd, "voxel_encoder.pfn_layers.0.norm", eps=1e-3)
    ref = np.maximum(ref, 0.0).max(axis=1)

    layer = PFNLayer(units=units, last_layer=True)
    got = np.asarray(layer.apply(
        pfn_vars, jnp.asarray(x), jnp.ones((v, 1, 1)), False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _full_ref_sd(rng, cin_mid=8, ch_mid=8, rpn_chans=(8, 8), head_in=8,
                 num_anchors=2, num_classes=1, skip_pfn=False,
                 pfn_cin=9, pfn_units=8):
    """Synthesize a reference-shaped state_dict (random weights) covering
    the active path for a 1-stage encoder / 2-conv RPN tiny net."""
    sd = {}
    if not skip_pfn:
        sd["voxel_encoder.pfn_layers.0.linear.weight"] = rng.normal(
            0, 0.5, (pfn_units, pfn_cin)).astype(np.float32)
        sd.update(_rand_bn(rng, pfn_units,
                           "voxel_encoder.pfn_layers.0.norm"))
    # stage 0: SubMConv3d KRSC (out, 3,3,3, in) + BN; SparseConv3d
    # (out, 3,1,1, in) + BN
    sd["pseudoimage_generator.middle_conv.0.weight"] = rng.normal(
        0, 0.3, (ch_mid, 3, 3, 3, cin_mid)).astype(np.float32)
    sd.update(_rand_bn(rng, ch_mid, "pseudoimage_generator.middle_conv.1"))
    sd["pseudoimage_generator.middle_conv.3.weight"] = rng.normal(
        0, 0.3, (ch_mid, 3, 1, 1, ch_mid)).astype(np.float32)
    sd.update(_rand_bn(rng, ch_mid, "pseudoimage_generator.middle_conv.4"))
    # RPN: 2 SubMConv2d KRSC (out, 3, 3, in) + BN
    c_prev = None
    for k, ch in enumerate(rpn_chans):
        cin_rpn = c_prev if c_prev is not None else head_in
        sd[f"sparse_rpn.blocks.{3 * k}.weight"] = rng.normal(
            0, 0.3, (ch, 3, 3, cin_rpn)).astype(np.float32)
        sd.update(_rand_bn(rng, ch, f"sparse_rpn.blocks.{3 * k + 1}"))
        c_prev = ch
    # head: torch Conv2d (out, in, 1, 1)
    for name, out in (("conv_cls", num_anchors * num_classes),
                      ("conv_reg", num_anchors * 9)):
        sd[f"bbox_head.{name}.weight"] = rng.normal(
            0, 0.1, (out, c_prev, 1, 1)).astype(np.float32)
        sd[f"bbox_head.{name}.bias"] = rng.normal(
            0, 0.1, out).astype(np.float32)
    for ax in "xyz":
        sd[f"bbox_head.conv_dir_cls_{ax}.weight"] = rng.normal(
            0, 0.1, (num_anchors * 2, c_prev, 1, 1)).astype(np.float32)
        sd[f"bbox_head.conv_dir_cls_{ax}.bias"] = rng.normal(
            0, 0.1, num_anchors * 2).astype(np.float32)
    return sd


def test_middle_stage_import_parity():
    """Vertical-encoder stage with imported spconv-layout weights matches
    the torch dense oracle on a fully-active grid (where submanifold ==
    dense; reference model/PointPillars.py:529-573)."""
    rng = np.random.default_rng(2)
    cin = ch = 8
    sd = _full_ref_sd(rng, cin_mid=cin, ch_mid=ch)
    variables = pointpillars_variables_from_torch(
        sd, num_pfn_layers=1, num_middle_stages=1, num_rpn_convs=2)
    mid_vars = {
        "params": variables["params"]["pseudoimage_generator"],
        "batch_stats": variables["batch_stats"]["pseudoimage_generator"],
    }

    b, d, h, w = 1, 5, 6, 6
    x = rng.normal(0, 1, (b, d, h, w, cin)).astype(np.float32)

    # torch oracle: NCDHW dense conv3d == spconv subm on a full grid
    tx = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    w_subm = torch.tensor(np.transpose(
        sd["pseudoimage_generator.middle_conv.0.weight"],
        (0, 4, 1, 2, 3)))  # KRSC -> (out, in, kd, kh, kw)
    y = torch.nn.functional.conv3d(tx, w_subm, padding=1)
    y = np.asarray(y.detach())
    y = np.transpose(y, (0, 2, 3, 4, 1))
    y = np.maximum(_bn_eval(y, sd, "pseudoimage_generator.middle_conv.1"),
                   0.0)
    w_down = torch.tensor(np.transpose(
        sd["pseudoimage_generator.middle_conv.3.weight"],
        (0, 4, 1, 2, 3)))
    y2 = torch.nn.functional.conv3d(
        torch.tensor(np.transpose(y, (0, 4, 1, 2, 3))), w_down,
        stride=(2, 1, 1))
    y2 = np.transpose(np.asarray(y2.detach()), (0, 2, 3, 4, 1))
    y2 = np.maximum(
        _bn_eval(y2, sd, "pseudoimage_generator.middle_conv.4"), 0.0)
    bo, do, ho, wo, co = y2.shape
    ref = np.transpose(y2, (0, 2, 3, 4, 1)).reshape(bo, ho, wo, co * do)

    enc = SparseMiddleExtractor(in_channels=cin, out_channels=[ch])
    got, _ = enc.apply(mid_vars, jnp.asarray(x),
                       jnp.ones((b, d, h, w)), False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_rpn_and_head_import_parity():
    """RPN convs + head convs (incl. the x/y/z direction interleave) match
    the torch oracle under imported weights."""
    rng = np.random.default_rng(3)
    num_anchors, num_classes = 2, 1
    sd = _full_ref_sd(rng, num_anchors=num_anchors)
    variables = pointpillars_variables_from_torch(
        sd, num_pfn_layers=1, num_middle_stages=1, num_rpn_convs=2)

    b, h, w, cin = 1, 6, 6, 8
    x = rng.normal(0, 1, (b, h, w, cin)).astype(np.float32)

    ref = np.transpose(x, (0, 3, 1, 2))
    for k in range(2):
        wk = np.transpose(sd[f"sparse_rpn.blocks.{3 * k}.weight"],
                          (0, 3, 1, 2))
        ref = np.asarray(torch.nn.functional.conv2d(
            torch.tensor(ref), torch.tensor(wk), padding=1).detach())
        ref = np.transpose(ref, (0, 2, 3, 1))
        ref = np.maximum(
            _bn_eval(ref, sd, f"sparse_rpn.blocks.{3 * k + 1}", eps=1e-3),
            0.0)
        ref = np.transpose(ref, (0, 3, 1, 2))
    rpn_out_ref = np.transpose(ref, (0, 2, 3, 1))

    rpn = SubmanifoldSparseRPN(out_channels=(8, 8), layer_nums=(0, 0))
    rpn_vars = {"params": variables["params"]["sparse_rpn"],
                "batch_stats": variables["batch_stats"]["sparse_rpn"]}
    rpn_out = np.asarray(rpn.apply(rpn_vars, jnp.asarray(x),
                                   jnp.ones((b, h, w)), False))
    np.testing.assert_allclose(rpn_out, rpn_out_ref, rtol=1e-4, atol=1e-4)

    # head
    head = Anchor3DHead(num_classes=num_classes, num_anchors=num_anchors)
    head_vars = {"params": variables["params"]["bbox_head"]}
    cls, reg, dirs = head.apply(head_vars, jnp.asarray(rpn_out))

    tin = torch.tensor(np.transpose(rpn_out_ref, (0, 3, 1, 2)))
    for name, ours in (("conv_cls", cls), ("conv_reg", reg)):
        tw = torch.tensor(sd[f"bbox_head.{name}.weight"])
        tb = torch.tensor(sd[f"bbox_head.{name}.bias"])
        tref = np.transpose(np.asarray(
            torch.nn.functional.conv2d(tin, tw, tb).detach()), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), tref,
                                   rtol=1e-4, atol=1e-5)

    # direction interleave: our dirs.reshape(..., A, 3, 2)[..., a, ax, :]
    # must equal the reference's per-axis conv output channels [2a:2a+2]
    dref = {}
    for ax in "xyz":
        tw = torch.tensor(sd[f"bbox_head.conv_dir_cls_{ax}.weight"])
        tb = torch.tensor(sd[f"bbox_head.conv_dir_cls_{ax}.bias"])
        dref[ax] = np.transpose(np.asarray(
            torch.nn.functional.conv2d(tin, tw, tb).detach()), (0, 2, 3, 1))
    got = np.asarray(dirs).reshape(b, h, w, num_anchors, 3, 2)
    for i, ax in enumerate("xyz"):
        for a in range(num_anchors):
            np.testing.assert_allclose(
                got[..., a, i, :], dref[ax][..., 2 * a:2 * a + 2],
                rtol=1e-4, atol=1e-5)


def test_full_tree_structure_matches_init():
    """Imported tree has exactly the structure/shapes of net.init for a
    matching config (catches param-name drift)."""
    from objectdetection_3d_tpu.models import PointPillars
    from tiny import tiny_model_cfg

    cfg = tiny_model_cfg()
    model = PointPillars(**cfg)
    want = model.init_variables(jax.random.PRNGKey(0))

    rng = np.random.default_rng(4)
    # tiny cfg: pfn [16] on 4 input features -> decorated cin 9, units 15;
    # middle in 16 ch 16; rpn [16,16] layer_nums [1,1] -> 4 convs;
    # head in 16, anchors 4 (2 sizes x 2 rots), 1 class
    sd = {"voxel_encoder.pfn_layers.0.linear.weight":
          rng.normal(0, 0.5, (15, 9)).astype(np.float32)}
    sd.update(_rand_bn(rng, 15, "voxel_encoder.pfn_layers.0.norm"))
    sd["pseudoimage_generator.middle_conv.0.weight"] = rng.normal(
        0, 0.3, (16, 3, 3, 3, 16)).astype(np.float32)
    sd.update(_rand_bn(rng, 16, "pseudoimage_generator.middle_conv.1"))
    sd["pseudoimage_generator.middle_conv.3.weight"] = rng.normal(
        0, 0.3, (16, 3, 1, 1, 16)).astype(np.float32)
    sd.update(_rand_bn(rng, 16, "pseudoimage_generator.middle_conv.4"))
    cin_rpn = 16 * 1  # C * D_final (tiny grid z collapses 4->1)
    c_prev = cin_rpn
    for k in range(4):
        sd[f"sparse_rpn.blocks.{3 * k}.weight"] = rng.normal(
            0, 0.3, (16, 3, 3, c_prev)).astype(np.float32)
        sd.update(_rand_bn(rng, 16, f"sparse_rpn.blocks.{3 * k + 1}"))
        c_prev = 16
    for name, out in (("conv_cls", 4), ("conv_reg", 36)):
        sd[f"bbox_head.{name}.weight"] = rng.normal(
            0, 0.1, (out, 16, 1, 1)).astype(np.float32)
        sd[f"bbox_head.{name}.bias"] = rng.normal(
            0, 0.1, out).astype(np.float32)
    for ax in "xyz":
        sd[f"bbox_head.conv_dir_cls_{ax}.weight"] = rng.normal(
            0, 0.1, (8, 16, 1, 1)).astype(np.float32)
        sd[f"bbox_head.conv_dir_cls_{ax}.bias"] = rng.normal(
            0, 0.1, 8).astype(np.float32)

    got = pointpillars_variables_from_torch(
        sd, num_pfn_layers=1, num_middle_stages=1, num_rpn_convs=4)

    want_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), want)
    got_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), got)
    assert (jax.tree_util.tree_structure(want_shapes)
            == jax.tree_util.tree_structure(got_shapes))
    assert want_shapes == got_shapes
