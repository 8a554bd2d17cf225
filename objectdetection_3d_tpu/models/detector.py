"""PointPillars detector: the framework-level model object.

Owns the flax network, the device voxelizer, the anchor constants, the
losses and the jitted train / predict functions.  Mirrors the reference's
``PointPillars(BaseModel)`` surface (model/PointPillars.py:21-302):
``preprocess`` / ``transform`` / ``loss`` / ``inference_end`` /
``get_optimizer`` — re-designed so that everything between host
preprocessing and host unpadding is a single static-shape XLA program.
"""

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from objectdetection_3d_tpu.augment import ObjdetAugmentation, global_outlier_check
from objectdetection_3d_tpu.config import DEFAULT_TPU_CFG
from objectdetection_3d_tpu.losses import (
    CrossEntropyLoss,
    FocalLoss,
    SmoothL1Loss,
)
from objectdetection_3d_tpu.models.anchors import (
    Anchor3DRangeGenerator,
    BBoxCoder,
)
from objectdetection_3d_tpu.models.assign import assign_targets
from objectdetection_3d_tpu.models.base import BaseModel
from objectdetection_3d_tpu.models.network import PointPillarsNet
from objectdetection_3d_tpu.ops.boxes import limit_period
from objectdetection_3d_tpu.ops.nms import multiclass_nms
from objectdetection_3d_tpu.ops.voxelize import Voxelizer

log = logging.getLogger(__name__)


def _parse_remat(value):
    """Normalize the ``tpu: remat`` config value.

    Accepts booleans plus the per-stage strings ``"all"``, ``"middle"``
    and ``"rpn"`` (see PointPillarsNet.remat for the trade-offs).
    """
    if value in (False, True, "all", "middle", "rpn"):
        return value
    raise ValueError(
        f"tpu.remat must be true/false/'all'/'middle'/'rpn', got {value!r}")


class PointPillars(BaseModel):
    """TPU-native PointPillars with 9-parameter fully-rotated boxes."""

    def __init__(self,
                 name="PointPillars",
                 device="tpu",
                 classes=(),
                 input_features=(),
                 point_cloud_range=(),
                 preprocess=None,
                 augment=None,
                 voxelize=None,
                 voxel_encoder=None,
                 vertical_encoder=None,
                 backbone=None,
                 neck=None,
                 head=None,
                 loss=None,
                 tpu=None,
                 use_dense_backbone=False,
                 device_augment=None,
                 **kwargs):
        super().__init__(name=name,
                         point_cloud_range=list(point_cloud_range),
                         device=device,
                         **kwargs)

        self.point_cloud_range = [float(v) for v in point_cloud_range]
        self.classes = list(classes)
        self.name2lbl = {n: i for i, n in enumerate(self.classes)}
        self.lbl2name = {i: n for i, n in enumerate(self.classes)}
        self.classes_ids = list(range(len(self.classes)))
        self.num_classes = len(self.classes)
        self.input_features = list(input_features) or [0, 1, 2, 3]
        self.device = device

        self.tpu_cfg = dict(DEFAULT_TPU_CFG)
        self.tpu_cfg.update(dict(tpu or {}))
        self.compute_dtype = (
            jnp.bfloat16
            if str(self.tpu_cfg["compute_dtype"]) in ("bfloat16", "bf16")
            else jnp.float32)

        voxelize = dict(voxelize or {})
        head = dict(head or {})
        loss = dict(loss or {})
        self.head_cfg = head
        self.box_params_num = int(head.get("box_params_num", 9))
        self.nms_dim = int(head.get("nms_dim", 3))

        pcr = np.asarray(self.point_cloud_range, np.float64)
        vsize = np.asarray(voxelize["voxel_size"], np.float64)
        gx, gy, gz = (np.round((pcr[3:] - pcr[:3]) / vsize)).astype(int)
        self.grid_size = (int(gx), int(gy), int(gz))
        # dense grid layout (D=z, H=y, W=x)
        self.grid_dhw = (int(gz), int(gy), int(gx))

        max_voxels = min(int(voxelize.get("max_voxels", 10 ** 9)),
                         int(self.tpu_cfg["max_voxels_static"]))
        # reflectance_sampling is hardcoded True in the reference voxel
        # layer (model/PointPillars.py:348)
        self.voxel_layer = Voxelizer(
            voxel_size=voxelize["voxel_size"],
            point_cloud_range=self.point_cloud_range,
            max_voxel_points=int(voxelize["max_voxel_points"]),
            max_voxels=max_voxels,
            reflectance_sampling=True,
        )

        vertical = dict(vertical_encoder or {})
        backbone = dict(backbone or {})
        neck = dict(neck or {})
        ve_cfg = dict(voxel_encoder or {})
        self.use_dense_backbone = bool(use_dense_backbone)

        self.anchor_generator = Anchor3DRangeGenerator(
            ranges=head["ranges"], sizes=head["sizes"],
            rotations=head["rotations"],
            box_params_num=self.box_params_num)
        self.num_anchors = self.anchor_generator.num_base_anchors
        d, h, w = self.grid_dhw
        if self.use_dense_backbone:
            # dense SECOND backbone downsamples by the stage strides and
            # the FPN upsamples each scale back to a common resolution
            strides = [int(v) for v in backbone.get("layer_strides",
                                                    [2, 2, 2])]
            ups = [int(v) for v in neck.get("upsample_strides", [1, 2, 4])]
            factor = int(np.prod(strides)) // ups[-1]
            self.featmap = (h // factor, w // factor)
        else:
            self.featmap = (h, w)
        anchors_np = self.anchor_generator.flat_anchors(self.featmap)
        self.anchors = jnp.asarray(anchors_np)
        from objectdetection_3d_tpu.models.assign import (
            _aabb_and_volume,
            make_anchor_layout,
        )
        self.anchor_aabb = tuple(
            jnp.asarray(a) for a in _aabb_and_volume(self.anchors))
        # (cells x combos) factorization powering the exact containment
        # fast path of target assignment (models/assign.py tier 1).  The
        # factorization requires a regular grid (every cell repeats one
        # combo set) — multi-range anchor configs with differing centers
        # or per-range combo sets are legal for the generator but not
        # factorable, so they fall back to the layout-free candidate
        # assignment instead of crashing at model construction.
        try:
            self.anchor_layout = tuple(
                jnp.asarray(a) for a in make_anchor_layout(
                    anchors_np, self.num_anchors))
        except AssertionError as e:
            log.warning(
                "anchor grid is not (cells x combos)-factorable (%s); "
                "target assignment runs without the containment fast "
                "path / exact anchor tier — expect lower positive recall "
                "for GTs much larger than the anchors", e)
            self.anchor_layout = None
        self.bbox_coder = BBoxCoder()

        self.net = PointPillarsNet(
            grid=self.grid_dhw,
            pfn_channels=tuple(ve_cfg["feat_channels"]),
            voxel_size=tuple(float(v) for v in ve_cfg["voxel_size"]),
            point_cloud_range=tuple(self.point_cloud_range),
            middle_channels=tuple(vertical["out_channels"]),
            middle_in_channels=int(vertical["in_channels"]),
            rpn_channels=tuple(backbone["out_channels"]),
            rpn_layer_nums=tuple(backbone["layer_nums"]),
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            box_params_num=self.box_params_num,
            dtype=self.compute_dtype,
            use_dense_backbone=self.use_dense_backbone,
            backbone_strides=tuple(
                int(v) for v in backbone.get("layer_strides", [2, 2, 2])),
            neck_channels=tuple(
                int(v) for v in neck.get("out_channels", [])),
            neck_upsample_strides=tuple(
                int(v) for v in neck.get("upsample_strides", [])),
            sparse_middle=bool(self.tpu_cfg.get("sparse_middle", False)),
            sparse_budget=int(self.tpu_cfg.get("sparse_budget", 0)),
            # False | True/"all" | "middle" | "rpn" (see PointPillarsNet)
            remat=_parse_remat(self.tpu_cfg.get("remat", False)),
            # bool = all stages; int n = first n stages only
            decompose_convs=self.tpu_cfg.get("decompose_convs", False),
            pallas_subm=bool(
                self.tpu_cfg.get("pallas_subm_conv", False)),
            zfold_convs=bool(self.tpu_cfg.get("zfold_convs", False)),
            zfold_pallas=bool(self.tpu_cfg.get("zfold_pallas", False)),
            fused_stages=bool(self.tpu_cfg.get("fused_stages", False)),
            pallas_grid_scatter=bool(
                self.tpu_cfg.get("pallas_grid_scatter", True)),
        )

        self.augmentor = ObjdetAugmentation(dict(augment or {}),
                                            seed=self.rng)
        from objectdetection_3d_tpu.augment.device_ops import (
            parse_device_augment_cfg)
        self.device_augment = parse_device_augment_cfg(device_augment)

        self.loss_cls = FocalLoss(**dict(loss.get("focal", {})))
        self.loss_bbox = SmoothL1Loss(**dict(loss.get("smooth_l1", {})))
        self.loss_dir = CrossEntropyLoss(**dict(loss.get("cross_entropy",
                                                         {})))
        iou_thr = head.get("iou_thr", [[0.08, 0.2]])
        if len(iou_thr) != max(self.num_classes, 1):
            assert len(iou_thr) == 1
            iou_thr = iou_thr * max(self.num_classes, 1)
        self.iou_thr = iou_thr
        thr = np.asarray(iou_thr, np.float32).reshape(-1, 2)
        self._neg_thr = jnp.asarray(thr[:, 0])
        self._pos_thr = jnp.asarray(thr[:, 1])

        self._jit_cache = {}

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------
    def init_variables(self, key):
        """Initialize network variables.

        Conv/Dense parameters are independent of the spatial grid, so init
        runs on a thin (D, 4, 4) twin of the network to avoid materializing
        the full 400x400 grid on the host.
        """
        d, _, _ = self.grid_dhw
        # 16x16 keeps every backbone stride/neck upsample combination valid
        small = self.net.clone(grid=(d, 16, 16))
        m = self.voxel_layer.max_voxel_points
        c = len(self.input_features)
        voxels = jnp.zeros((1, 8, m, c), jnp.float32)
        num_points = jnp.ones((1, 8), jnp.int32)
        coords = jnp.zeros((1, 8, 3), jnp.int32)
        mask = jnp.ones((1, 8), bool)
        return small.init(key, voxels, num_points, coords, mask, train=False)

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def voxelize_batch(self, points, num_points):
        """vmapped device voxelization of a padded point batch."""
        return jax.vmap(self.voxel_layer)(points, num_points)

    @property
    def _use_point_pfn(self):
        """Point-granularity PFN: skip the (V, M, C) buffers entirely
        (single-layer PFN stacks only — the flagship shape)."""
        return (bool(self.tpu_cfg.get("point_pfn", True))
                and len(self.net.pfn_channels) == 1
                and not self.net.sparse_middle)

    def _net_for(self, pallas="auto"):
        """The network module to apply.  ``pallas="off"`` returns a clone
        with every Pallas lowering disabled (identical parameters and
        numerics, XLA-only program) — mesh-sharded callers need it
        because GSPMD has no partitioning rule for Mosaic custom calls
        (parallel/data_parallel.py)."""
        if pallas != "off":
            return self.net
        if not hasattr(self, "_net_xla"):
            self._net_xla = self.net.clone(
                pallas_grid_scatter=False, zfold_pallas=False,
                pallas_subm=False, fused_stages=False)
        return self._net_xla

    def apply(self, variables, batch, train=False, pallas="auto"):
        """Full forward: voxelize -> network.

        Returns ((cls, reg, dirs), new_batch_stats_or_None).
        ``pallas="off"`` routes around every Pallas kernel (mesh-sharded
        callers — see :meth:`_net_for`).
        """
        net = self._net_for(pallas)
        if self._use_point_pfn:
            # pallas="auto" routes the post-sort tail through the fused
            # Pallas scan on TPU (ops/voxel_scan.py); "off" keeps the
            # XLA tail for GSPMD mesh programs.  `tpu: pallas_voxel_scan:
            # false` pins the XLA tail independently (perf A/B knob).
            vox_pallas = pallas
            if (pallas == "auto"
                    and not bool(self.tpu_cfg.get("pallas_voxel_scan",
                                                  True))):
                vox_pallas = "off"
            vox = self.voxel_layer.points_batch(
                batch["points"], batch["num_points"], pallas=vox_pallas)
            kwargs = dict(points=vox["points"], pt_voxel=vox["pt_voxel"],
                          pt_valid=vox["pt_valid"],
                          max_slots=self.voxel_layer.max_voxel_points)
            net_args = (None, vox["num_points_per_voxel"], vox["coords"],
                        vox["voxel_mask"])
        else:
            vox = self.voxelize_batch(batch["points"], batch["num_points"])
            kwargs = {}
            net_args = (vox["voxels"], vox["num_points_per_voxel"],
                        vox["coords"], vox["voxel_mask"])
        if train:
            outs, mut = net.apply(
                variables, *net_args, train=True,
                mutable=["batch_stats"], **kwargs)
            return outs, mut["batch_stats"]
        outs = net.apply(variables, *net_args, train=False, **kwargs)
        return outs, None

    # ------------------------------------------------------------------
    # loss
    # ------------------------------------------------------------------
    def loss(self, results, inputs, anchors=None, anchor_aabb=None,
             pallas="auto", assign_shard=None, with_num_pos=False):
        """Training losses (reference model/PointPillars.py:147-226).

        Args:
            results: (cls, reg, dirs) head outputs.
            inputs: batch dict with 'bboxes' (B,G,9), 'labels' (B,G),
                'gt_mask' (B,G).
            anchors / anchor_aabb: pass these as jit ARGUMENTS in jitted
                callers — baking the 1.9M-anchor constant into the program
                balloons compile time badly.
            assign_shard: optional ``(mesh, axis_name)``.  Wraps the
                assignment in ``jax.shard_map`` over the batch axis so
                each device runs it on its LOCAL items — Mosaic custom
                calls never reach GSPMD (which has no partitioning rule
                for them), so mesh training keeps the fused Pallas
                assignment (~250 ms/step single-chip) instead of the
                blanket ``pallas="off"`` XLA fallback.  Assignment is
                per-item independent: no collectives are needed inside.
            with_num_pos: also return the raw positive-anchor count (the
                un-clamped ``avg_factor`` numerator) — gradient
                accumulation needs it to recover the pooled-batch
                normalization exactly (see :meth:`train_step_accum_fn`).
        Returns:
            dict of scalar losses, or ``(losses, num_pos)`` when
            ``with_num_pos``.
        """
        cls, reg, dirs = results
        b = cls.shape[0]
        c = max(self.num_classes, 1)
        if anchors is None:
            anchors = self.anchors
        if anchor_aabb is None:
            anchor_aabb = self.anchor_aabb

        # inside a shard_map island the Pallas gate may re-open even when
        # the surrounding mesh program routes pallas="off"
        assign_pallas = "auto" if assign_shard is not None else pallas

        def assign_batch(anchors_, anchor_aabb_, gt, lbl, msk):
            return jax.vmap(
                lambda g_, l_, m_: assign_targets(
                    anchors_, g_, l_, m_,
                    pos_thr=self._pos_thr, neg_thr=self._neg_thr,
                    candidates_per_gt=int(
                        self.tpu_cfg["assign_candidates_per_gt"]),
                    num_classes=self.num_classes,
                    anchor_aabb=anchor_aabb_,
                    prefilter=str(
                        self.tpu_cfg.get("assign_prefilter", "approx")),
                    prefilter_block=int(
                        self.tpu_cfg.get("assign_prefilter_block", 128)),
                    layout=self.anchor_layout,
                    exact_anchor_tier=bool(
                        self.tpu_cfg.get("assign_exact_anchor_tier",
                                         True)),
                    geometry=str(
                        self.tpu_cfg.get("assign_geometry", "auto")),
                    pallas=assign_pallas)
            )(gt, lbl, msk)

        if assign_shard is None:
            assign = assign_batch(anchors, anchor_aabb, inputs["bboxes"],
                                  inputs["labels"], inputs["gt_mask"])
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            mesh, axis = assign_shard
            # check_vma=False: scan carries inside the assignment mix
            # replicated (anchor-derived) and sharded (GT-derived)
            # operands, which the varying-axis checker rejects despite
            # being per-device-pure here
            assign = shard_map(
                assign_batch, mesh=mesh,
                in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                out_specs=P(axis), check_vma=False,
            )(anchors, anchor_aabb, inputs["bboxes"],
              inputs["labels"], inputs["gt_mask"])

        # padded repeat items (short final batches) carry zero weight so
        # eval/train losses average only over real clouds
        item_valid = inputs.get("item_valid")
        if item_valid is None:
            item_valid = jnp.ones((b,), jnp.float32)
        else:
            item_valid = item_valid.astype(jnp.float32)

        pos_f = (assign["pos_mask"].astype(jnp.float32)
                 * item_valid[:, None]).reshape(-1)
        neg_f = (assign["neg_mask"].astype(jnp.float32)
                 * item_valid[:, None]).reshape(-1)
        num_pos = jnp.sum(assign["num_pos"].astype(jnp.float32) * item_valid)
        # avg_factor = total positive count; 1 when empty reproduces the
        # reference's unreduced-sum fallback (model/PointPillars.py:213-218)
        avg = jnp.maximum(num_pos, 1.0)

        cls_flat = cls.reshape(-1, c)
        target_labels = assign["target_labels"].reshape(-1)
        wmask = (pos_f + neg_f)[:, None]
        loss_cls = self.loss_cls(cls_flat, target_labels, weight=wmask,
                                 avg_factor=avg)

        reg_flat = reg.reshape(-1, self.box_params_num)
        tgt = assign["target_deltas"].reshape(-1, self.box_params_num)
        # sin-difference rotation encoding
        # (reference model/PointPillars.py:206-210)
        pred_r = reg_flat[:, -3:]
        tgt_r = tgt[:, -3:]
        pred_sin = jnp.concatenate(
            [reg_flat[:, :-3], jnp.sin(pred_r) * jnp.cos(tgt_r)], axis=-1)
        tgt_sin = jnp.concatenate(
            [tgt[:, :-3], jnp.cos(pred_r) * jnp.sin(tgt_r)], axis=-1)
        posw = pos_f[:, None]
        loss_bbox = self.loss_bbox(pred_sin, tgt_sin, weight=posw,
                                   avg_factor=avg)

        # Direction CE in the head's native raster layout.  The obvious
        # dirs.reshape(-1, 3, 2) materializes f32[1.92M, 3, 2] whose TPU
        # tiling pads 44 MB to 3.66 GB (85x) as a saved backward residual
        # — both an HBM blowout and ~90 ms of wasted bytes.  The pairwise
        # log-softmax below is the same CrossEntropyLoss math (reference
        # model/PointPillars.py:187-202) computed on (..., A*3) arrays
        # whose channel order [anchor, axis] matches dir_targets' flat
        # (h, w, anchor, axis) order; per-axis sums slice channels i::3.
        d0 = dirs[..., 0::2]                     # bin-0 logits (..., A*3)
        d1 = dirs[..., 1::2]                     # bin-1 logits
        lse = jnp.logaddexp(d0, d1)
        dir_tgt = assign["dir_targets"].reshape(d0.shape)
        logp_sel = jnp.where(dir_tgt == 1, d1, d0) - lse
        pos_w3 = jnp.repeat(
            (assign["pos_mask"].astype(jnp.float32)
             * item_valid[:, None]).reshape(d0.shape[:-1]
                                            + (d0.shape[-1] // 3,)),
            3, axis=-1)
        dir_ce = -logp_sel * pos_w3 * self.loss_dir.loss_weight
        loss_dir = {ax: jnp.sum(dir_ce[..., i::3]) / avg
                    for i, ax in enumerate("xyz")}

        losses = {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_dir_x": loss_dir["x"],
            "loss_dir_y": loss_dir["y"],
            "loss_dir_z": loss_dir["z"],
        }
        if with_num_pos:
            return losses, num_pos
        return losses

    # ------------------------------------------------------------------
    # train step
    # ------------------------------------------------------------------
    def get_optimizer(self, cfg, grad_clip_value=None):
        """AdamW matching the reference (model/PointPillars.py:142-145 +
        pipeline value-clipping, pipeline/pipeline.py:496-498)."""
        cfg = dict(cfg or {})
        betas = cfg.get("betas", (0.9, 0.999))
        tx = optax.adamw(
            learning_rate=cfg.get("lr", 1e-3),
            b1=float(betas[0]), b2=float(betas[1]),
            eps=1e-8,
            weight_decay=cfg.get("weight_decay", 1e-2))
        if grad_clip_value is not None and grad_clip_value > 0:
            tx = optax.chain(optax.clip(float(grad_clip_value)), tx)
        return tx

    def train_step_fn(self, tx, out_constraint=None, pallas="auto",
                      assign_shard=None):
        """The un-jitted training step closure shared by every execution
        mode (single-chip jit, data-parallel mesh, 2-D data x space mesh —
        parallel/data_parallel.py jits this same function with sharding
        annotations, so on-device augmentation and rng threading behave
        identically everywhere).

        Args:
            tx: optax transform.
            out_constraint: optional fn mapping the (cls, reg, dirs) head
                outputs to sharding-constrained versions (spatial
                partitioning hint; XLA propagates it backward through the
                conv stack).
            pallas: "off" routes forward + assignment around every
                Pallas kernel — REQUIRED when this step is jitted over a
                mesh (GSPMD cannot partition Mosaic custom calls;
                parallel/data_parallel.py passes it).
            assign_shard: optional ``(mesh, axis_name)`` — reopens the
                Pallas assignment inside a ``shard_map`` island over the
                batch axis even when ``pallas="off"`` (see
                :meth:`loss`); parallel/data_parallel.py passes it so
                mesh training keeps the fast assignment.
        Returns:
            step(state, batch, anchors, anchor_aabb) -> (state, losses).
        """
        device_augment = self.device_augment

        def step(state, batch, anchors, anchor_aabb):
            if device_augment:
                from objectdetection_3d_tpu.augment.device_ops import (
                    augment_batch)
                rng, sub = jax.random.split(state["rng"])
                batch = augment_batch(batch, sub, device_augment)

            def loss_closure(params):
                variables = {"params": params,
                             "batch_stats": state["batch_stats"]}
                outs, new_bs = self.apply(variables, batch, train=True,
                                          pallas=pallas)
                if out_constraint is not None:
                    outs = out_constraint(outs)
                losses = self.loss(outs, batch, anchors, anchor_aabb,
                                   pallas=pallas,
                                   assign_shard=assign_shard)
                total = sum(losses.values())
                return total, (losses, new_bs)

            grads, (losses, new_bs) = jax.grad(
                loss_closure, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt_state"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params, "batch_stats": new_bs,
                         "opt_state": new_opt}
            if device_augment:
                new_state["rng"] = rng
            return new_state, losses

        return step

    def train_step_accum_fn(self, tx, microbatch, pallas="auto",
                            out_constraint=None, assign_shard=None):
        """Gradient-accumulation training step: one optimizer update for a
        batch that is too big to materialize at once.

        The monolithic step at batch 8 exhausts this chip's HBM — the
        dense (8, 100, 400, 400, C) grid alone is >5 GB and the
        scatter/encoder stages RESOURCE_EXHAUST (tools/bisect_b8.py), so
        BASELINE config #3's stated batch size (reference
        pipeline/pipeline.py:458-466 iterates any batch) is served by
        ``lax.scan`` over microbatches inside ONE jit: peak activation
        memory stays at microbatch scale while the update sees the full
        batch.

        Pooled-loss exactness: the reference normalizes every loss by the
        batch-wide positive count (model/PointPillars.py:213-218).  Each
        microbatch's loss is ``S_i / max(n_i, 1)``; multiplying its grads
        by ``max(n_i, 1)`` recovers ``grad(S_i)`` (the factor is
        parameter-independent), and dividing the accumulated sum by
        ``max(sum_i n_i, 1)`` reproduces the pooled-batch normalization
        exactly — not the mean-of-means approximation (the two diverge
        hard when one microbatch has no positives).  The one remaining
        deviation from the monolithic step is BatchNorm: train-mode batch
        statistics are computed per microbatch (as they would be when
        training at the smaller batch size) and running stats update
        sequentially, so the forward — and therefore the gradient — is
        that of microbatch-sized BN, not batch-sized BN.  That is the
        standard grad-accumulation semantics.

        ``out_constraint`` / ``assign_shard`` mirror
        :meth:`train_step_fn` — parallel/data_parallel.py passes them so
        the accumulation step also runs sharded over a mesh (each scanned
        microbatch is itself batch-sharded over the data axis; the loss
        reductions stay global sums, so mesh accum == single-device
        accum).
        """
        device_augment = self.device_augment

        def step(state, batch, anchors, anchor_aabb):
            b = batch["points"].shape[0]
            if b % microbatch:
                raise ValueError(
                    f"batch {b} not divisible by microbatch {microbatch}")
            n_micro = b // microbatch
            stacked = jax.tree_util.tree_map(
                lambda x: x.reshape((n_micro, microbatch) + x.shape[1:]),
                batch)

            def one_micro(carry, mb):
                bs, rng = carry
                if device_augment:
                    from objectdetection_3d_tpu.augment.device_ops import (
                        augment_batch)
                    rng, sub = jax.random.split(rng)
                    mb = augment_batch(mb, sub, device_augment)

                def loss_closure(params):
                    variables = {"params": params, "batch_stats": bs}
                    outs, new_bs = self.apply(variables, mb, train=True,
                                              pallas=pallas)
                    if out_constraint is not None:
                        outs = out_constraint(outs)
                    losses, n_pos = self.loss(outs, mb, anchors,
                                              anchor_aabb, pallas=pallas,
                                              assign_shard=assign_shard,
                                              with_num_pos=True)
                    total = sum(losses.values())
                    return total, (losses, n_pos, new_bs)

                grads, (losses, n_pos, new_bs) = jax.grad(
                    loss_closure, has_aux=True)(state["params"])
                avg_i = jnp.maximum(n_pos, 1.0)
                scaled = jax.tree_util.tree_map(
                    lambda g_: g_ * avg_i.astype(g_.dtype), grads)
                sums = jax.tree_util.tree_map(lambda l_: l_ * avg_i,
                                              losses)
                return (new_bs, rng), (scaled, sums, n_pos)

            rng0 = state.get("rng", jax.random.PRNGKey(0))
            (new_bs, rng_out), (g_all, l_all, n_all) = jax.lax.scan(
                one_micro, (state["batch_stats"], rng0), stacked)
            total_pos = jnp.maximum(jnp.sum(n_all), 1.0)
            grads = jax.tree_util.tree_map(
                lambda g_: jnp.sum(g_, axis=0)
                / total_pos.astype(g_.dtype), g_all)
            losses = jax.tree_util.tree_map(
                lambda l_: jnp.sum(l_, axis=0) / total_pos, l_all)
            updates, new_opt = tx.update(grads, state["opt_state"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {"params": new_params, "batch_stats": new_bs,
                         "opt_state": new_opt}
            if device_augment:
                new_state["rng"] = rng_out
            return new_state, losses

        return step

    def make_train_step(self, tx, donate=True, microbatch=None):
        """Build the jitted training step.

        state = {'params', 'batch_stats', 'opt_state'[, 'rng']}.

        Args:
            microbatch: when set, run the gradient-accumulation step
                (``lax.scan`` over ``batch/microbatch`` chunks inside one
                jit — the HBM-fitting formulation of large batches; see
                :meth:`train_step_accum_fn`).
        """
        if microbatch is None:
            step = self.train_step_fn(tx)
        else:
            step = self.train_step_accum_fn(tx, int(microbatch))
        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

        def run(state, batch):
            return jitted(state, batch, self.anchors, self.anchor_aabb)

        return run

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def _predict_single(self, cls, reg, dirs, anchors):
        """Decode + NMS for one item (reference get_bboxes_single,
        model/PointPillars.py:1025-1094), static shapes throughout."""
        c = max(self.num_classes, 1)
        n_a = anchors.shape[0]
        nms_pre = min(int(self.head_cfg.get("nms_pre", 100)), n_a)
        score_thr = float(self.head_cfg.get("score_thr", 0.1))
        nms_thresh = float(self.head_cfg.get("nms_thresh", 0.7))
        dir_offset = float(self.head_cfg.get("dir_offset", 0.0))
        max_det = min(int(self.tpu_cfg["max_detections"]), nms_pre * c)

        # top-k runs on raw logits (sigmoid is monotone); every other
        # per-anchor computation happens on the nms_pre survivors only —
        # no full-size elementwise passes over the 1.9M-anchor tensors.
        # The two-level exact block top-k replaces lax.top_k, which is
        # pathologically slow at N~1.9M on TPU (see models/assign.py)
        from objectdetection_3d_tpu.models.assign import _blockwise_topk

        logits = cls.reshape(-1, c)
        row = jnp.max(logits, axis=-1)
        top_idx = _blockwise_topk(row[None, :], nms_pre, 128)[0]
        anchors_sel = anchors[top_idx]
        deltas_sel = reg.reshape(-1, self.box_params_num)[top_idx]
        boxes = self.bbox_coder.decode(anchors_sel, deltas_sel)
        scores_sel = jax.nn.sigmoid(logits[top_idx])
        dirs_sel = dirs.reshape(-1, 6)[top_idx]
        bins_sel = jnp.argmax(dirs_sel.reshape(-1, 3, 2), axis=-1)

        keep = multiclass_nms(boxes, scores_sel, score_thr, nms_thresh,
                              nms_dim=self.nms_dim)

        # direction recovery per rotation axis
        # (reference model/PointPillars.py:1085-1092)
        rot = boxes[:, -3:]
        rot = (limit_period(rot - dir_offset, 1.0, jnp.pi) + dir_offset
               + jnp.pi * bins_sel.astype(boxes.dtype))
        boxes = jnp.concatenate([boxes[:, :-3], rot], axis=-1)

        flat_scores = jnp.where(keep, scores_sel, -1.0).reshape(-1)
        sel_scores, flat_idx = jax.lax.top_k(flat_scores, max_det)
        box_idx = flat_idx // c
        labels = flat_idx % c
        return {
            "bbox": boxes[box_idx],
            "label": labels.astype(jnp.int32),
            "score": sel_scores,
            "valid": sel_scores > 0,
        }

    def predict(self, variables, batch, anchors=None, pallas="auto"):
        """Batched jit-friendly inference: forward + decode + NMS."""
        if anchors is None:
            anchors = self.anchors
        outs, _ = self.apply(variables, batch, train=False, pallas=pallas)
        cls, reg, dirs = outs
        return jax.vmap(self._predict_single,
                        in_axes=(0, 0, 0, None))(cls, reg, dirs, anchors)

    def make_predict_fn(self):
        jitted = jax.jit(
            lambda variables, batch, anchors: self.predict(
                variables, batch, anchors))

        def run(variables, batch):
            return jitted(variables, batch, self.anchors)

        return run

    def eval_step_fn(self, pallas="auto"):
        """Un-jitted eval closure (losses + decoded detections), shared by
        the single-chip and mesh-sharded eval paths (the latter pass
        ``pallas="off"`` — GSPMD cannot partition Mosaic custom calls)."""

        def eval_step(variables, batch, anchors, anchor_aabb):
            outs, _ = self.apply(variables, batch, train=False,
                                 pallas=pallas)
            losses = self.loss(outs, batch, anchors, anchor_aabb,
                               pallas=pallas)
            cls, reg, dirs = outs
            preds = jax.vmap(self._predict_single,
                             in_axes=(0, 0, 0, None))(cls, reg, dirs,
                                                      anchors)
            return losses, preds

        return eval_step

    def make_eval_fn(self):
        """Jitted single-forward eval: losses + decoded detections."""
        jitted = jax.jit(self.eval_step_fn())

        def run(variables, batch):
            return jitted(variables, batch, self.anchors,
                          self.anchor_aabb)

        return run

    def inference_end(self, results):
        """Unpad device predictions into per-cloud lists of detection dicts
        (reference model/PointPillars.py:286-302 output structure)."""
        bbox = np.asarray(results["bbox"])
        label = np.asarray(results["label"])
        score = np.asarray(results["score"])
        valid = np.asarray(results["valid"])
        out = []
        for i in range(bbox.shape[0]):
            item = []
            for j in range(bbox.shape[1]):
                if not valid[i, j]:
                    continue
                item.append({
                    "bbox": bbox[i, j],
                    "label": int(label[i, j]),
                    "score": float(score[i, j]),
                })
            out.append(item)
        return out

    # ------------------------------------------------------------------
    # host-side preprocessing
    # ------------------------------------------------------------------
    def preprocess(self, data, attr, rng=None):
        """Per-cloud host preprocessing (reference
        model/PointPillars.py:228-278): 5-sigma outlier rejection, range
        cropping of points and of box centers (xy), input-feature selection,
        then train-time augmentation."""
        rng = rng if rng is not None else self.rng

        bboxes = np.array(data["bboxes"], dtype=np.float32).reshape(-1, 9)
        min_val = np.array(self.point_cloud_range[:3])
        max_val = np.array(self.point_cloud_range[3:])

        points = self._preprocess_points(np.asarray(data["point"]))

        bboxes = bboxes[np.where(
            np.all(np.logical_and(bboxes[:, :2] >= min_val[:2],
                                  bboxes[:, :2] < max_val[:2]), axis=-1))]

        if points.shape[0] == 0:
            print("There are no points in defined range. Range is defined "
                  "wrongly or this particular point cloud is affected with "
                  "outliers: {}".format(attr.get("name")))
        data = dict(data)
        data["point"] = points
        data["bboxes"] = bboxes

        if attr.get("split") not in ("test", "testing", "val", "validation"):
            data = self.augmentor.augment(data, attr, seed=rng)

        return {"point": data["point"], "labels": data["labels"],
                "bboxes": data["bboxes"]}

    def _preprocess_points(self, points):
        """Outlier-reject + range-crop + column-select, preferring the
        native C++ fused pass when available (identical semantics)."""
        from objectdetection_3d_tpu import native

        pts32 = np.asarray(points, np.float32)
        if pts32.ndim == 2 and pts32.shape[0] > 0:
            out = native.preprocess_cloud(
                pts32, self.input_features, self.point_cloud_range)
            if out is not None:
                return out

        filtered = global_outlier_check(pts32)
        min_val = np.array(self.point_cloud_range[:3])
        max_val = np.array(self.point_cloud_range[3:])
        filtered = filtered[np.where(
            np.all(np.logical_and(filtered[:, :3] >= min_val,
                                  filtered[:, :3] < max_val), axis=-1))]
        return filtered[:, self.input_features]

    def transform(self, data, attr):
        """Identity hook (reference model/PointPillars.py:280-284)."""
        return data
