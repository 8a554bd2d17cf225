"""Top-level flax network: voxel features -> pseudo-image -> head.

The reference's ``extract_feats`` chain (model/PointPillars.py:94-104):
PillarFeatureNet -> SparseMiddleExtractor -> SubmanifoldSparseRPN ->
Anchor3DHead, with the dense backbone/neck constructed but bypassed
(model/PointPillars.py:101-103).  Here the whole chain is one jitted module
over a static (B, D, H, W) grid.
"""

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from objectdetection_3d_tpu.models.layers import (
    Anchor3DHead,
    BackboneDWS,
    BackboneUPS,
    PillarFeatureNet,
    SparseMiddleExtractor,
    SubmanifoldSparseRPN,
)
from objectdetection_3d_tpu.models.sparse_middle import (
    SparseMiddleExtractorGather,
)
from objectdetection_3d_tpu.ops.sparse_conv import flatten_cells


class PointPillarsNet(nn.Module):
    """End-to-end PointPillars network over padded voxel batches."""

    grid: Tuple[int, int, int]  # (D, H, W) = (z, y, x) cells
    pfn_channels: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    middle_channels: Sequence[int]
    middle_in_channels: int
    rpn_channels: Sequence[int]
    rpn_layer_nums: Sequence[int]
    num_classes: int
    num_anchors: int
    box_params_num: int = 9
    dtype: jnp.dtype = jnp.float32
    # route features through the dense SECOND backbone + FPN neck instead
    # of the submanifold RPN (the reference constructs both and bypasses
    # the dense pair, model/PointPillars.py:101-103)
    use_dense_backbone: bool = False
    backbone_strides: tuple = (2, 2, 2)
    neck_channels: tuple = ()
    neck_upsample_strides: tuple = ()
    # EXPERIMENTAL: execute the vertical encoder on the sparse active set
    # (gather-based) instead of the dense masked grid; numerics are
    # identical but it is PARKED for perf — measured 318 ms for the full
    # flagship encoder (after the dense index-map rewrite) vs 168 ms for
    # the dense z-fold path at 0.75% occupancy on v5e.  The crossover
    # would need a Pallas DMA-gather kernel or <<0.2% occupancy.
    sparse_middle: bool = False
    sparse_budget: int = 0
    # rematerialize stages in the backward pass (the full-grid activations
    # otherwise exceed HBM when training the flagship config).  True/"all"
    # remats both the vertical encoder and the RPN; "rpn" remats only the
    # RPN (keeps the encoder's residuals resident but skips its ~0.1 s
    # recompute — the fastest fitting choice for the flagship config);
    # "middle" remats only the encoder; False keeps everything.
    remat: Union[bool, str] = False
    # lower 3D convs as z-shifted 2D convs: halves the lane-padding waste
    # of the (..., C=20) grid buffers (XLA pads C to 128); needed to fit
    # full-scale training in HBM.  bool = all stages, int n = first n
    # stages (the small-channel stages, where the 2D lowering is ~3x
    # faster; wide stages fuse better as native conv3d)
    decompose_convs: bool = False
    pallas_subm: bool = False
    # z-fold the encoder's subm convs into wide-channel strided conv3ds
    # (see SparseMiddleExtractor.zfold_convs)
    zfold_convs: bool = False
    zfold_pallas: bool = False
    fused_stages: bool = False
    # single-pass Pallas grid build (ops/grid_scatter.py): writes the
    # 640 MB pseudo-image grid exactly once instead of XLA's
    # zeros-then-copy scatter lowering (measured 20 vs 46 ms standalone
    # on v5e).  TPU backend only; other backends fall back to the XLA
    # scatter below.
    pallas_grid_scatter: bool = True

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool,
                 points=None, pt_voxel=None, pt_valid=None, max_slots=None):
        """
        Args:
            voxels: (B, V, M, C) padded voxel point buffers (``None`` on
                the point path).
            num_points: (B, V) int points per voxel.
            coords: (B, V, 3) int voxel coords (z, y, x), -1 padding.
            voxel_mask: (B, V) bool voxel validity.
            points / pt_voxel / pt_valid / max_slots: point-granularity
                PFN inputs (see ops.voxelize.voxelize_points): (B, P, C)
                cell-sorted points, per-point voxel index in [0, V]
                (V = dump), validity, and the static per-voxel cap M.
        Returns:
            (cls, reg, dirs): (B, H, W, A*num_classes / A*9 / A*6) float32.
        """
        d, h, w = self.grid

        pfn = PillarFeatureNet(
            feat_channels=self.pfn_channels,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            dtype=self.dtype,
            name="voxel_encoder",
        )
        if points is not None:
            b, v = num_points.shape
            # one extra segment per item holds the dump slot (out-of-range
            # or overflow points); segment ids stay globally nondecreasing
            nvp = v + 1
            seg = (jnp.arange(b)[:, None] * nvp + pt_voxel).reshape(-1)
            counts_p = jnp.pad(num_points, ((0, 0), (0, 1))).reshape(-1)
            coords_p = jnp.pad(
                coords, ((0, 0), (0, 1), (0, 0))).reshape(b * nvp, 3)
            mask_p = jnp.pad(voxel_mask, ((0, 0), (0, 1))).reshape(-1)
            feats = pfn(None, counts_p, coords_p, mask_p, train,
                        points=points.reshape(b * points.shape[1], -1),
                        seg=seg, pt_valid=pt_valid.reshape(-1),
                        max_slots=max_slots)
            feats = feats.reshape(b, nvp, -1)[:, :v].reshape(b * v, -1)
        else:
            b, v, m, c = voxels.shape
            feats = pfn(voxels.reshape(b * v, m, c),
                        num_points.reshape(b * v),
                        coords.reshape(b * v, 3),
                        voxel_mask.reshape(b * v), train)

        fn = num_points.reshape(b * v)
        fc = coords.reshape(b * v, 3)
        fm = voxel_mask.reshape(b * v)

        feats = feats.astype(self.dtype)
        if self.sparse_middle:
            # keep the active set sparse end-to-end: the voxelizer emits
            # cells sorted by (x, y, z)-major flat id, which is exactly the
            # order the gather-based encoder's binary search needs
            fb = feats.reshape(b, v, -1)
            cell_flat = jax.vmap(
                lambda cc: flatten_cells(cc, (d, h, w)))(coords)
            pseudo = SparseMiddleExtractorGather(
                in_channels=self.middle_in_channels,
                out_channels=self.middle_channels,
                grid=(d, h, w),
                budget=self.sparse_budget or v,
                dtype=self.dtype,
                name="pseudoimage_generator",
            )(fb, coords, cell_flat, voxel_mask, train)
        else:
            # scatter voxel features onto the dense (z, y, x) grid; padding
            # voxels are routed out of bounds and dropped.  The grid is the
            # largest activation — keep it in the compute dtype.
            cf = feats.shape[-1]
            bi = jnp.repeat(jnp.arange(b), v)
            zi = jnp.where(fm, fc[:, 0], d)
            yi = jnp.where(fm, fc[:, 1], h)
            xi = jnp.where(fm, fc[:, 2], w)
            # mask kept WITHOUT a channel dim ((...,1) buffers lane-pad
            # 128x on TPU)
            mask = jnp.zeros((b, d, h, w), feats.dtype).at[
                bi, zi, yi, xi].set(1.0, mode="drop",
                                    unique_indices=True,
                                    indices_are_sorted=True)
            from objectdetection_3d_tpu.ops import grid_scatter

            if (self.pallas_grid_scatter
                    and jax.default_backend() == "tpu"
                    and grid_scatter.supported(v, cf, (d, h, w),
                                               feats.dtype)):
                # one-write Pallas grid build; the voxelizer emits cells
                # sorted in this grid's raster order, the kernel's
                # contract (ops/grid_scatter.py).  supported() gates the
                # kernel's 8-row alignment + VMEM-budget preconditions
                # (e.g. the shipped max_voxels_static: 400000 ceiling
                # overflows the feats-in-VMEM design) — other shapes take
                # the XLA scatter below, identical semantics.
                from objectdetection_3d_tpu.ops.grid_scatter import (
                    scatter_to_grid)

                fb = feats.reshape(b, v, cf)
                cellb = jnp.where(
                    voxel_mask,
                    (coords[..., 0] * h + coords[..., 1]) * w
                    + coords[..., 2],
                    d * h * w).astype(jnp.int32)
                grid = jnp.stack([
                    scatter_to_grid(fb[i], cellb[i], (d, h, w))
                    for i in range(b)])
            else:
                # voxel cells arrive sorted in (z, y, x) raster order —
                # exactly this grid's memory layout, so the scatter
                # indices are sorted.  (A 128-lane-padded row scatter is
                # 2.5x faster in isolation but loses it all to the
                # downstream channel-slice relayout and quadruples the
                # grid allocation — measured e2e-neutral at B=1 and OOM
                # at B=2, so the plain form stays.)
                grid = jnp.zeros((b, d, h, w, cf), feats.dtype).at[
                    bi, zi, yi, xi].set(feats, mode="drop",
                                        unique_indices=True,
                                        indices_are_sorted=True)

            middle_cls = SparseMiddleExtractor
            if self.remat in (True, "all", "middle"):
                middle_cls = nn.remat(SparseMiddleExtractor,
                                      static_argnums=(3,))
            pseudo, _ = middle_cls(
                in_channels=self.middle_in_channels,
                out_channels=self.middle_channels,
                dtype=self.dtype,
                decompose_convs=self.decompose_convs,
                pallas_subm=self.pallas_subm,
                zfold_convs=self.zfold_convs,
                zfold_pallas=self.zfold_pallas,
                fused_stages=self.fused_stages,
                name="pseudoimage_generator",
            )(grid, mask, train)

        if self.use_dense_backbone:
            feats_ms = BackboneDWS(
                out_channels=self.rpn_channels,
                layer_nums=self.rpn_layer_nums,
                layer_strides=self.backbone_strides,
                dtype=self.dtype,
                name="backbone",
            )(pseudo, train)
            x = BackboneUPS(
                out_channels=self.neck_channels,
                upsample_strides=self.neck_upsample_strides,
                dtype=self.dtype,
                name="neck",
            )(feats_ms, train)
        else:
            # the reference re-derives the 2D active set from nonzero
            # pseudo-pixels (model/PointPillars.py:769-784)
            rpn_mask = jnp.any(pseudo != 0, axis=-1)

            rpn_cls = SubmanifoldSparseRPN
            if self.remat in (True, "all", "rpn"):
                rpn_cls = nn.remat(SubmanifoldSparseRPN,
                                   static_argnums=(3,))
            x = rpn_cls(
                out_channels=self.rpn_channels,
                layer_nums=self.rpn_layer_nums,
                dtype=self.dtype,
                name="sparse_rpn",
            )(pseudo, rpn_mask, train)

        return Anchor3DHead(
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            box_params_num=self.box_params_num,
            dtype=self.dtype,
            name="bbox_head",
        )(x)
