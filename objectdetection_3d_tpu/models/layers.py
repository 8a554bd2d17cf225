"""Flax linen building blocks of the TPU PointPillars network.

The reference's sparse/submanifold convolutions (spconv CUDA,
model/PointPillars.py:529-573,714-793) are reproduced *exactly* with dense
XLA convolutions plus active-site masks:

* A submanifold conv computes outputs only at active input sites using the
  (zero-padded) neighborhood — identical to a dense bias-free conv whose
  output is multiplied by the input activity mask.
* A strided sparse conv activates every output site that sees at least one
  active input — the mask dilates exactly like a max-pool with the conv's
  window/stride.
* spconv applies BatchNorm1d to the *active feature rows only*; the masked
  batch norm below computes statistics over active sites and keeps inactive
  sites at zero, matching those semantics on a dense grid.

Dense convs are the idiomatic TPU mapping at this occupancy: the MXU wants
large regular contractions, not gather/scatter.
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def get_paddings_indicator(actual_num, max_num, axis=0):
    """Boolean mask of valid slots in a padded dimension.

    Matches reference model/utils.py:442-458: entry (i, j) is True iff
    ``j < actual_num[i]`` (for axis=0).

    Args:
        actual_num: (N,) counts.
        max_num: padded dimension size.
    Returns:
        (N, max_num) bool (for axis=0).
    """
    actual = jnp.expand_dims(actual_num, axis + 1)
    shape = [1] * actual.ndim
    shape[axis + 1] = -1
    rng = jnp.arange(max_num, dtype=jnp.int32).reshape(shape)
    return actual.astype(jnp.int32) > rng


def get_paddings_indicator_np(actual_num, max_num):
    """Numpy variant (reference model/utils.py:428-440)."""
    import numpy as np

    actual = np.reshape(actual_num, (-1, 1))
    rng = np.arange(max_num).reshape(1, -1)
    return actual > rng


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active sites of a masked dense tensor.

    Matches torch.nn.BatchNorm1d applied to a sparse tensor's feature rows:
    statistics are computed per channel over sites where ``mask`` is set;
    inactive sites stay exactly zero.  Running stats follow torch's
    convention: ``running = (1 - momentum) * running + momentum * batch``
    with the *unbiased* batch variance stored and the biased one used for
    normalization.
    """

    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool):
        """
        Args:
            x: (..., C) features.
            mask: (..., 1) float/bool activity mask (broadcastable).
            train: use batch stats and update running stats.
        Returns:
            (..., C) normalized features, zero at inactive sites.
        """
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        m = mask.astype(jnp.float32)
        if train:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=reduce_axes) / count
            var = jnp.sum(((xf - mean) ** 2) * m, axis=reduce_axes) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y * m.astype(x.dtype)

    def eval_affine(self):
        """Eval-mode equivalent affine: y = a*x + b at active sites.

        Reads the variables created by ``__call__`` (apply-time only; the
        fused-stage path folds these into its kernel epilogue)."""
        scale = self.get_variable("params", "scale")
        bias = self.get_variable("params", "bias")
        mean = self.get_variable("batch_stats", "mean")
        var = self.get_variable("batch_stats", "var")
        a = scale * jax.lax.rsqrt(var + self.eps)
        return a, bias - mean * a


class PFNLayer(nn.Module):
    """Pillar/voxel feature net layer (reference model/PointPillars.py:357-423).

    Linear (no bias) -> masked BN (eps 1e-3, momentum 0.01) -> ReLU ->
    max-pool over the point dimension.  As in the reference, intra-voxel
    padding slots are zeroed *before* the linear layer but their transformed
    values still participate in the max — preserved deliberately for parity.
    """

    units: int
    last_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, voxel_mask, train: bool):
        """
        Args:
            x: (V, M, C) decorated per-point features.
            voxel_mask: (V, 1, 1) validity of each voxel.
        Returns:
            (V, units) pooled features if last_layer, else (V, M, 2*units).
        """
        x = nn.Dense(self.units, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        # BN statistics run over EVERY slot of valid voxels — padding
        # slots enter as exact zeros — matching the reference's unmasked
        # BatchNorm1d over the whole (N, C, M) buffer
        # (model/PointPillars.py:381,404); the slot-level mask also keeps
        # those slots' normalized values alive for the max below
        m_bn = jnp.broadcast_to(voxel_mask, (x.shape[0], x.shape[1], 1))
        x = MaskedBatchNorm(eps=1e-3, momentum=0.01, name="norm")(
            x, m_bn, train)
        x = nn.relu(x)
        pooled = jnp.max(x, axis=1)
        if self.last_layer:
            return pooled
        rep = jnp.broadcast_to(pooled[:, None, :], x.shape)
        return jnp.concatenate([x, rep], axis=-1)


class PointMaskedBN(nn.Module):
    """MaskedBatchNorm twin for point-granularity PFN rows.

    Emulates the padded-buffer statistics exactly: the ``V_valid*M - P``
    zero padding slots of the buffer path contribute zeros to the sums and
    ``total_slots = V_valid * M`` to the denominators.  Parameter and stat
    names match MaskedBatchNorm so checkpoints interchange.  Also returns
    the per-channel value a padding slot would take after normalization
    (the buffer path's max-pool sees those slots — PFNLayer notes).
    """

    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, pt_valid, total_slots, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        m = pt_valid.astype(jnp.float32)[:, None]
        if train:
            xf = x.astype(jnp.float32)
            count = jnp.maximum(total_slots.astype(jnp.float32), 1.0)
            mean = jnp.sum(xf * m, axis=0) / count
            n_real = jnp.sum(m)
            # the (count - n_real) padding slots are exact zeros
            var = (jnp.sum(((xf - mean) ** 2) * m, axis=0)
                   + (count - n_real) * mean ** 2) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        pad_y = ((jnp.zeros((c,), x.dtype) - mean.astype(x.dtype))
                 * inv.astype(x.dtype) * scale.astype(x.dtype)
                 + bias.astype(x.dtype))
        return y * m.astype(x.dtype), pad_y


class PFNLayerPoints(nn.Module):
    """Point-granularity twin of PFNLayer (terminal layer only).

    Same parameter tree as PFNLayer; instead of max-pooling a padded
    ``(V, M, C)`` buffer it segment-max-reduces per-point activations over
    the sorted point->voxel map.  Voxels with fewer than ``max_slots``
    points additionally take the padding-slot ReLU floor into the max —
    those slots exist (as zeros) in the buffer path and their normalized
    value participates in its pool.
    """

    units: int
    max_slots: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, seg, pt_valid, counts, total_slots, num_segments,
                 train: bool):
        """
        Args:
            x: (N, C) decorated per-point features (invalid rows zeroed).
            seg: (N,) nondecreasing segment (voxel) index per point.
            pt_valid: (N,) bool.
            counts: (num_segments,) capped per-voxel point counts.
            total_slots: scalar, valid voxels x max_slots.
        Returns:
            (num_segments, units) pooled features.
        """
        y = nn.Dense(self.units, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        y, pad_y = PointMaskedBN(eps=1e-3, momentum=0.01, name="norm")(
            y, pt_valid, total_slots, train)
        y = nn.relu(y)
        floor = nn.relu(pad_y)
        neg = jnp.asarray(-jnp.inf, y.dtype)
        pooled = jax.ops.segment_max(
            jnp.where(pt_valid[:, None], y, neg), seg,
            num_segments=num_segments, indices_are_sorted=True)
        return jnp.where(counts[:, None] < self.max_slots,
                         jnp.maximum(pooled, floor[None, :]), pooled)


class PillarFeatureNet(nn.Module):
    """Voxel feature encoder (reference model/PointPillars.py:426-526).

    Decorates raw per-point features with the offset from the voxel point
    centroid (3) and from the pillar xy center (2), masks padding, runs the
    PFN stack, and appends ``num_points`` as the final output channel
    (the reference's quirk at model/PointPillars.py:526).

    Two data layouts compute the same function:

    * the padded-buffer path (``__call__`` without point args), matching
      the reference's ``(V, M, C)`` shapes, and
    * a point-granularity path (pass ``points``/``seg``/``pt_valid``):
      every tensor stays at the ~P real points instead of V*M padded
      slots — on TPU the buffer path's cost is pure HBM traffic over
      ~30x more (lane-padded) rows than there are points.  Single-layer
      PFN stacks only (the flagship config).
    """

    feat_channels: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask, train: bool,
                 points=None, seg=None, pt_valid=None, max_slots=None):
        """
        Args:
            voxels: (V, M, C) per-voxel point buffers (xyz + features);
                ``None`` on the point path.
            num_points: (V,) valid point counts.
            coords: (V, 3) int voxel coords as (z, y, x).
            voxel_mask: (V,) bool voxel validity.
            points / seg / pt_valid / max_slots: point path — (N, C)
                cell-sorted points, their (nondecreasing) voxel index in
                [0, V), validity, and the static per-voxel point cap M.
        Returns:
            (V, feat_channels[-1]) features (last channel = num_points).
        """
        if points is not None:
            return self._points_path(points, seg, pt_valid, num_points,
                                     coords, voxel_mask, int(max_slots),
                                     train)
        v, m, _ = voxels.shape
        npts = jnp.maximum(num_points, 1).astype(voxels.dtype)

        mean = jnp.sum(voxels[:, :, :3], axis=1, keepdims=True) / npts[
            :, None, None]
        centroid_off = voxels[:, :, :3] - mean

        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        x_off = vx / 2 + float(self.point_cloud_range[0])
        y_off = vy / 2 + float(self.point_cloud_range[1])
        px = voxels[:, :, 0] - (
            coords[:, 2].astype(voxels.dtype)[:, None] * vx + x_off)
        py = voxels[:, :, 1] - (
            coords[:, 1].astype(voxels.dtype)[:, None] * vy + y_off)

        feats = jnp.concatenate(
            [voxels, centroid_off, px[..., None], py[..., None]],
            axis=-1).astype(self.dtype)

        point_mask = (jnp.arange(m)[None, :] < num_points[:, None])
        feats = feats * point_mask[..., None].astype(feats.dtype)

        vm = voxel_mask.reshape(v, 1, 1)
        chans = list(self.feat_channels)
        for i, ch in enumerate(chans):
            last = i == len(chans) - 1
            units = (ch - 1) if last else ch // 2
            feats = PFNLayer(units=units, last_layer=last,
                             dtype=self.dtype,
                             name=f"pfn_{i}")(feats, vm, train)

        out = jnp.concatenate(
            [feats, num_points.astype(feats.dtype)[:, None]], axis=-1)
        return out * voxel_mask[:, None].astype(out.dtype)

    def _points_path(self, points, seg, pt_valid, counts, coords,
                     voxel_mask, max_slots, train):
        chans = list(self.feat_channels)
        assert len(chans) == 1, (
            "point-granularity PFN supports single-layer stacks; use the "
            "buffer path for deeper feat_channels")
        nseg = counts.shape[0]

        xyz = points[:, :3]
        validf = pt_valid.astype(points.dtype)[:, None]
        cnt = jnp.maximum(counts, 1).astype(points.dtype)
        centroid = jax.ops.segment_sum(
            xyz * validf, seg, num_segments=nseg,
            indices_are_sorted=True) / cnt[:, None]

        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        x_off = vx / 2 + float(self.point_cloud_range[0])
        y_off = vy / 2 + float(self.point_cloud_range[1])
        # one fused per-point gather: [centroid xyz, pillar-center xy]
        # (row gathers cost ~35 ns/row here — don't pay twice)
        pil = jnp.stack([
            coords[:, 2].astype(points.dtype) * vx + x_off,
            coords[:, 1].astype(points.dtype) * vy + y_off], axis=-1)
        ref5 = jnp.concatenate([centroid, pil], axis=-1)[seg]
        centroid_off = xyz - ref5[:, :3]
        px = points[:, 0] - ref5[:, 3]
        py = points[:, 1] - ref5[:, 4]

        feats = jnp.concatenate(
            [points, centroid_off, px[:, None], py[:, None]],
            axis=-1).astype(self.dtype)
        feats = feats * validf.astype(feats.dtype)

        total_slots = jnp.sum(voxel_mask.astype(jnp.int32)) * max_slots
        pooled = PFNLayerPoints(units=chans[0] - 1, max_slots=max_slots,
                                dtype=self.dtype, name="pfn_0")(
            feats, seg, pt_valid, counts, total_slots, nseg, train)

        out = jnp.concatenate(
            [pooled, counts.astype(pooled.dtype)[:, None]], axis=-1)
        return out * voxel_mask[:, None].astype(out.dtype)


class SparseMiddleExtractor(nn.Module):
    """Vertical encoder: 3D conv stages collapsing z into channels.

    Dense-masked equivalent of the spconv stack at reference
    model/PointPillars.py:529-573: per stage a 3x3x3 submanifold conv
    (active set unchanged) then a (3,1,1)-kernel (2,1,1)-stride sparse conv
    (active set dilated, z roughly halved), each followed by masked BN
    (torch defaults eps 1e-5 / momentum 0.1) + ReLU.  After the configured
    stages the remaining z levels are folded into channels:
    (B, D', H, W, C) -> (B, H, W, C*D').
    """

    in_channels: int
    out_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    # True/False applies to every stage; an int n decomposes only the first
    # n stages (the small-channel stages where z-sliced 2D convs beat the
    # native conv3d lowering) and keeps conv3d for the rest
    decompose_convs: bool = False
    # inference-only Pallas im2col kernel for small-channel subm convs
    # (no VJP; the training path keeps the XLA conv)
    pallas_subm: bool = False
    # z-fold the subm convs: group zb z-slices into the channel dim and run
    # one strided conv3d with a banded (zb+2, 3, 3, C, zb*Co) kernel.  Burns
    # (zb+2)/3 x FLOPs but lifts the contraction dims from ~20 to >=128
    # where the MXU tile is fully occupied.  zb is chosen per stage so that
    # (zb+2)*C_in lands near 160.  False/0 = off.
    zfold_convs: bool = False
    # run the folded 3x3 conv through the Pallas 9-tap GEMM kernel
    # (ops/zfold_conv.py) instead of XLA's conv emitter; TPU only
    zfold_pallas: bool = False
    # fuse whole narrow stages (subm conv + BN/relu/mask + z-down conv +
    # BN/relu/mask) into one Pallas kernel (ops/fused_stage.py) at eval
    # time — the encoder is HBM-bandwidth-bound on this platform and the
    # fusion cuts per-stage traffic ~4x.  TPU inference only; training
    # and init use the unfused lowerings (identical parameters).
    fused_stages: bool = False

    def _decompose_stage(self, stage):
        if isinstance(self.decompose_convs, bool):
            return self.decompose_convs
        return stage < int(self.decompose_convs)

    @staticmethod
    def _zfold_block(c_in, d):
        """Pick the z-block size: largest zb with (zb+2)*c_in <= 128
        (one full MXU/lane tile; measured optimum on v5e — larger folds
        trade tile occupancy for pure FLOP waste and lose)."""
        zb = max(1, 128 // c_in - 2)
        return min(zb, d)

    def _subm_conv3d_zfold(self, x, kernel):
        """3x3x3 SAME conv as a z-folded wide-channel 2D conv.

        The grid's D axis is blocked into chunks of ``zb`` slices; each
        chunk plus one halo slice on each side is folded into the channel
        dim, and a banded (3, 3, (zb+2)C, zb*Co) kernel computes the z taps
        inside the GEMM: output sub-block a reads input taps a..a+2 with
        weights W[0..2] — exactly out[z] = sum_dz W[dz] x[z+dz-1].
        Numerically identical to the native conv3d lowering (same kernel
        parameter).  Burns (zb+2)/3 x FLOPs but runs the MXU contraction at
        (zb+2)*C ~ 128 wide instead of C ~ 20, a ~2x net win at C=20 on
        v5e (stage-1 subm conv 96 -> 50 ms).
        """
        b, d, h, w, c = x.shape
        co = kernel.shape[-1]
        zb = self._zfold_block(c, d)
        dblk = -(-d // zb)
        dpad = dblk * zb
        xp = jnp.pad(x, ((0, 0), (1, dpad - d + 1), (0, 0), (0, 0), (0, 0)))
        xo = jnp.stack([xp[:, k * zb:k * zb + zb + 2] for k in range(dblk)],
                       axis=1)                      # (b, dblk, zb+2, h, w, c)
        xo = jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, (zb + 2) * c)
        kf = jnp.zeros((3, 3, (zb + 2) * c, zb * co), kernel.dtype)
        for a in range(zb):
            for dz in range(3):
                j = a + dz
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * co:(a + 1) * co].add(kernel[dz])
        if self.zfold_pallas and (zb + 2) * c <= 128 and zb * co <= 128 \
                and jax.default_backend() == "tpu":
            from objectdetection_3d_tpu.ops.zfold_conv import (
                conv2d_3x3_pallas)

            y = conv2d_3x3_pallas(xo, kf.astype(x.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                xo, kf.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, dpad, h, w, co)
        return y[:, :d]

    def _subm_conv3d(self, x, ch, name, train=True, stage=0):
        """3x3x3 SAME conv.

        Two equivalent lowerings behind ``decompose_convs``: the native XLA
        3D conv (fuses best at wide channels) or three z-shifted 2D convs
        (~3x faster at C<=32 on v5e, and the lowering that fits batched
        training in HBM).  Parameter name/shape are identical either way.
        """
        b, d, h, w, c = x.shape
        kernel = self.param(
            name,
            nn.initializers.lecun_normal(),
            (3, 3, 3, c, ch))
        if (self.pallas_subm and not train and c <= 24 and h % 8 == 0
                and w >= 8 and jax.default_backend() == "tpu"):
            from objectdetection_3d_tpu.ops.pallas_conv import (
                subm_conv3d_pallas)

            return subm_conv3d_pallas(x, kernel)
        if (self.zfold_convs and not self._decompose_stage(stage)
                and self._zfold_block(c, d) >= 2):
            # wide stages (C >= 64) stay native: a fold would burn 3x FLOPs
            # for a tile the native conv already half-fills
            return self._subm_conv3d_zfold(x, kernel)
        if not self._decompose_stage(stage):
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        flat = x.reshape(b * d, h, w, c)
        zero = jnp.zeros((b, 1, h, w, ch), x.dtype)

        def conv2d(k2):
            y = jax.lax.conv_general_dilated(
                flat, k2.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.reshape(b, d, h, w, ch)

        y0 = conv2d(kernel[0])  # weight for input slice d-1
        y1 = conv2d(kernel[1])
        y2 = conv2d(kernel[2])
        # out[d] = W0*x[d-1] + W1*x[d] + W2*x[d+1]
        return (jnp.concatenate([zero, y0[:, :-1]], axis=1) + y1
                + jnp.concatenate([y2[:, 1:], zero], axis=1))

    @staticmethod
    def _downfold_block(c, d_out):
        """z-output block for the folded down conv: largest zb with
        (2*zb+1)*c <= 192 (batched-training sweet spot measured on v5e)."""
        zb = max(1, (192 // c - 1) // 2)
        return min(zb, d_out)

    def _down_conv_z_zfold(self, x, kernel):
        """(3,1,1)/(2,1,1) VALID conv as a z-folded wide-channel GEMM.

        Mirrors ``_subm_conv3d_zfold``: zb output z-steps (spanning
        2*zb+1 input slices) fold into channels and a banded
        (1, 1, (2zb+1)C, zb*Co) kernel computes the strided z taps inside
        one GEMM.  Exact vs the native lowering.  Besides the MXU-width
        win, this avoids the native 5-D strided conv's transposed input
        copy, which at B=4 flagship scale is an 11.4 GB allocation (the
        round-1 batched-inference OOM).
        """
        b, d, h, w, c = x.shape
        co = kernel.shape[-1]
        d_out = (d - 3) // 2 + 1
        zb = self._downfold_block(c, d_out)
        dblk = -(-d_out // zb)
        span = 2 * zb + 1
        xp = jnp.pad(x, ((0, 0), (0, 2 * zb * dblk + 3 - d), (0, 0),
                         (0, 0), (0, 0)))
        xo = jnp.stack([xp[:, 2 * zb * k:2 * zb * k + span]
                        for k in range(dblk)], axis=1)
        xo = jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b * dblk, h, w, span * c)
        kf = jnp.zeros((1, 1, span * c, zb * co), kernel.dtype)
        for a in range(zb):
            for t in range(3):
                j = 2 * a + t
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * co:(a + 1) * co].set(kernel[t])
        y = jax.lax.conv_general_dilated(
            xo, kf.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, dblk, h, w, zb, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(
            b, dblk * zb, h, w, co)
        return y[:, :d_out]

    def _down_conv_z(self, x, ch, name, stage=0):
        """(3,1,1)-kernel (2,1,1)-stride VALID conv over z."""
        b, d, h, w, c = x.shape
        d_out = (d - 3) // 2 + 1
        kernel = self.param(
            name,
            nn.initializers.lecun_normal(),
            (3, c, ch))
        if (self.zfold_convs and not self._decompose_stage(stage)
                and self._downfold_block(c, d_out) >= 2):
            return self._down_conv_z_zfold(x, kernel)
        if not self._decompose_stage(stage):
            return jax.lax.conv_general_dilated(
                x, kernel.reshape(3, 1, 1, c, ch).astype(x.dtype),
                (2, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        slices = jnp.stack(
            [jax.lax.slice_in_dim(x, k, k + 2 * (d_out - 1) + 1, 2, axis=1)
             for k in range(3)], axis=2)  # (B, D', 3, H, W, C)
        return jnp.einsum("bdkhwc,kco->bdhwo", slices,
                          kernel.astype(x.dtype))

    @staticmethod
    def _fused_zb(c, ch, d):
        """z block for the fused stage kernel: even zb with
        (zb+2)*c <= 128 and zb*ch <= 128; 0 = unsupported."""
        zb = min(128 // c - 2, 128 // ch)
        zb -= zb % 2
        if zb < 2 or d < 3:
            return 0
        return zb

    def _fused_stage(self, x, mask, ch, i):
        """One encoder stage through the fused Pallas kernel.

        Equivalent (eval mode) to: subm conv -> *mask -> BN -> relu ->
        down conv -> BN(maxpooled mask) -> relu.  See ops/fused_stage.py
        for the kernel contract; everything here is the (cheap) XLA-side
        packing of folded inputs, banded weights, affines and selectors.
        """
        from objectdetection_3d_tpu.ops.fused_stage import fused_stage_call

        b, d, h, w, c = x.shape
        zb = self._fused_zb(c, ch, d)
        dblk = -(-d // zb)
        d_out = (d - 3) // 2 + 1
        hp = -(-h // 8) * 8
        wb = -(-(w + 2) // 16) * 16
        cf = (zb + 2) * c

        kernel = self.param(f"subm_{i}_kernel",
                            nn.initializers.lecun_normal(),
                            (3, 3, 3, c, ch))
        kd = self.param(f"down_{i}_kernel",
                        nn.initializers.lecun_normal(), (3, ch, ch))
        a_s, b_s = MaskedBatchNorm(
            name=f"subm_bn_{i}").eval_affine()
        a_d, b_d = MaskedBatchNorm(
            name=f"down_bn_{i}").eval_affine()

        # ---- folded input (+1 zero pad block per item, +1 global) ----
        xp = jnp.pad(x, ((0, 0), (1, dblk * zb + 1 - d), (1, hp - h + 1),
                         (0, wb - w), (0, 0)))
        xo = jnp.stack([xp[:, k * zb:k * zb + zb + 2]
                        for k in range(dblk)], 1)
        xo = jnp.transpose(xo, (0, 1, 3, 4, 2, 5)).reshape(
            b, dblk, hp + 2, wb, cf)
        xo = jnp.pad(xo, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 128 - cf)))
        xo = xo.reshape(b * (dblk + 1), hp + 2, wb, 128)
        xo = jnp.pad(xo, ((0, 1), (0, 0), (0, 0), (0, 0)))

        # ---- slice-activity masks: slot j of block k = z slice
        # k*zb - 1 + j ----
        wm = -(-w // 128) * 128
        mp = jnp.pad(mask, ((0, 0), (1, dblk * zb + 7 - d), (0, hp - h),
                            (0, wm - w)))
        mwin = jnp.stack([mp[:, k * zb:k * zb + 8] for k in range(dblk)],
                         1)                        # (B, dblk, 8, Hp, Wm)
        mwin = jnp.transpose(mwin, (0, 1, 3, 2, 4))
        mwin = jnp.pad(mwin, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        mask_f = mwin.reshape(b * (dblk + 1), hp, 8, wm).astype(x.dtype)

        # ---- banded subm weights (9, 128, 128) ----
        kf = jnp.zeros((3, 3, cf, zb * ch), jnp.float32)
        for a in range(zb):
            for dz in range(3):
                j = a + dz
                kf = kf.at[:, :, j * c:(j + 1) * c,
                           a * ch:(a + 1) * ch].set(kernel[dz])
        w9 = jnp.pad(kf, ((0, 0), (0, 0), (0, 128 - cf),
                          (0, 128 - zb * ch))).reshape(9, 128, 128)

        # ---- down weights: rows = subm-out channels (own block |
        # halo block), cols = (z' group, ch) ----
        wd1 = jnp.zeros((128, 128), jnp.float32)
        wd2 = jnp.zeros((128, 128), jnp.float32)
        for a in range(zb // 2):
            for t in range(3):
                s = 2 * a + t
                if s < zb:
                    wd1 = wd1.at[s * ch:(s + 1) * ch,
                                 a * ch:(a + 1) * ch].set(kd[t])
                else:
                    wd2 = wd2.at[:ch, a * ch:(a + 1) * ch].set(kd[t])
        wd = jnp.stack([wd1, wd2]).astype(x.dtype)

        # ---- BN affines tiled per z group ----
        def tile_vec(v, groups):
            return jnp.pad(jnp.tile(v, groups),
                           (0, 128 - groups * ch))

        vecs = jnp.stack([
            tile_vec(a_s, zb), tile_vec(b_s, zb),
            tile_vec(a_d, zb // 2), tile_vec(b_d, zb // 2),
        ]).astype(jnp.float32)

        # ---- mask selectors (slot j -> channel multipliers) ----
        sel = np.zeros((5, 8, 128), np.float32)
        for s in range(zb):
            sel[0, s + 1, s * ch:(s + 1) * ch] = 1.0   # subm own block
        sel[1, zb + 1, :ch] = 1.0                      # subm halo slice
        for a in range(zb // 2):
            for t in range(3):
                sel[2 + t, 2 * a + t + 1, a * ch:(a + 1) * ch] = 1.0
        sel = jnp.asarray(sel, x.dtype)

        out = fused_stage_call(xo.astype(self.dtype), mask_f,
                               w9.astype(self.dtype), wd, vecs, sel)

        # ---- unfold: (B*(dblk+1), Hp, Wb, 128) -> (B, D', H, W, ch) ----
        out = out.reshape(b, dblk + 1, hp, wb, 128)[
            :, :dblk, :h, :w, :(zb // 2) * ch]
        out = out.reshape(b, dblk, h, w, zb // 2, ch)
        out = jnp.transpose(out, (0, 1, 4, 2, 3, 5)).reshape(
            b, dblk * (zb // 2), h, w, ch)[:, :d_out]

        new_mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
            "VALID")
        return out, new_mask

    @nn.compact
    def __call__(self, grid, mask, train: bool):
        """
        Args:
            grid: (B, D, H, W, C) scattered voxel features.
            mask: (B, D, H, W) activity mask — deliberately WITHOUT a
                trailing channel dim: a (..., 1) buffer lane-pads 128x on
                TPU (gigabytes at this grid size); the broadcasts below
                fuse without materializing.
        Returns:
            (B, H, W, C_out * D_final) pseudo-image.
        """
        x = grid.astype(self.dtype)
        mask = mask.astype(self.dtype)
        for i, ch in enumerate(self.out_channels):
            if (self.fused_stages and not train
                    and not self.is_initializing()
                    and not self._decompose_stage(i)
                    and self._fused_zb(x.shape[-1], ch, x.shape[1])
                    and jax.default_backend() == "tpu"):
                x, mask = self._fused_stage(x, mask, ch, i)
                continue
            x = self._subm_conv3d(x, ch, f"subm_{i}_kernel", train,
                                  stage=i)
            x = x * mask[..., None]
            x = MaskedBatchNorm(name=f"subm_bn_{i}")(x, mask[..., None],
                                                     train)
            x = nn.relu(x)

            x = self._down_conv_z(x, ch, f"down_{i}_kernel", stage=i)
            mask = jax.lax.reduce_window(
                mask, -jnp.inf, jax.lax.max,
                (1, 3, 1, 1), (1, 2, 1, 1), "VALID")
            x = MaskedBatchNorm(name=f"down_bn_{i}")(x, mask[..., None],
                                                     train)
            x = nn.relu(x)

        b, d, h, w, c = x.shape
        # channel layout (C, D) to mirror the reference's
        # view(N, C*D, H, W) of an NCDHW tensor (model/PointPillars.py:571)
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
        m2d = jnp.max(mask, axis=1)  # (B, H, W) any-z activity
        return x, m2d


class SubmanifoldSparseRPN(nn.Module):
    """2D RPN over the pseudo-image (reference model/PointPillars.py:714-793).

    All reference convs are SubMConv2d, whose stride argument is ignored —
    the active set (nonzero pseudo-pixels) is fixed throughout, so this is a
    stack of dense 3x3 convs with a constant mask and masked BN
    (eps 1e-3, momentum 0.01).
    """

    out_channels: Sequence[int]
    layer_nums: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        """
        Args:
            x: (B, H, W, C) pseudo-image.
            mask: (B, H, W) nonzero-pixel mask (no channel dim — see
                SparseMiddleExtractor on lane padding).
        Returns:
            (B, H, W, out_channels[-1]) features.
        """
        x = x.astype(self.dtype)
        mask = mask.astype(self.dtype)
        li = 0
        for stage, (ch, extra) in enumerate(
                zip(self.out_channels, self.layer_nums)):
            for _ in range(1 + extra):
                x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name=f"conv_{li}")(x)
                x = x * mask[..., None]
                x = MaskedBatchNorm(eps=1e-3, momentum=0.01,
                                    name=f"bn_{li}")(x, mask[..., None],
                                                     train)
                x = nn.relu(x)
                li += 1
        return x


class BackboneDWS(nn.Module):
    """SECOND-style strided 2D backbone (reference
    model/PointPillars.py:575-638).  Constructed but bypassed by the active
    reference config (model/PointPillars.py:101-103); provided for full
    capability parity and usable via ``use_dense_backbone``.
    """

    out_channels: Sequence[int]
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        """(B, H, W, C) -> tuple of multi-scale feature maps."""
        outs = []
        li = 0
        for ch, num, stride in zip(self.out_channels, self.layer_nums,
                                   self.layer_strides):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"conv_{li}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, name=f"bn_{li}")(x)
            x = nn.relu(x)
            li += 1
            for _ in range(num):
                x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype, name=f"conv_{li}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 epsilon=1e-3, momentum=0.99,
                                 name=f"bn_{li}")(x)
                x = nn.relu(x)
                li += 1
            outs.append(x)
        return tuple(outs)


class BackboneUPS(nn.Module):
    """SECONDFPN-style upsampling neck (reference
    model/PointPillars.py:641-711): per-scale transposed conv (or strided
    conv for downscale), BN + ReLU, channel concat."""

    out_channels: Sequence[int]
    upsample_strides: Sequence[int]
    use_conv_for_no_stride: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        """tuple of (B, Hi, Wi, Ci) -> (B, H, W, sum(out_channels))."""
        ups = []
        for i, (x, ch, stride) in enumerate(
                zip(xs, self.out_channels, self.upsample_strides)):
            if stride > 1 or (stride == 1
                              and not self.use_conv_for_no_stride):
                x = nn.ConvTranspose(
                    ch, (stride, stride), strides=(stride, stride),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name=f"deconv_{i}")(x)
            else:
                s = int(round(1 / stride)) if stride < 1 else 1
                x = nn.Conv(ch, (s, s), strides=(s, s), use_bias=False,
                            dtype=self.dtype,
                            kernel_init=nn.initializers.kaiming_normal(),
                            name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, name=f"bn_{i}")(x)
            x = nn.relu(x)
            ups.append(x)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]


class MLP(nn.Module):
    """Foreground/background point classifier MLP
    (reference model/mlp.py:4-88): 6 dense blocks with BN + ReLU + dropout,
    sigmoid output."""

    input_channels: int = 37
    hidden: Sequence[int] = (100, 500, 250, 100, 25)
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train,
                           name=f"drop_{i}")(x)
        x = nn.Dense(1, name="out")(x)
        return jax.nn.sigmoid(x)


class Anchor3DHead(nn.Module):
    """SSD-style detection head (reference model/PointPillars.py:795-884).

    1x1 convs producing per-cell: class scores (A*C), box deltas (A*9) and
    direction logits (A*6).  The reference's three separate per-axis
    direction convs concatenated along channels are, after its own
    (A, 3, 2) reinterpretation during training, functionally a single
    (A*6)-channel head — implemented as such here.
    """

    num_classes: int
    num_anchors: int
    box_params_num: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias_cls = -math.log((1 - 0.01) / 0.01)
        cls = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      bias_init=nn.initializers.constant(bias_cls),
                      dtype=self.dtype, name="conv_cls")(x)
        reg = nn.Conv(self.num_anchors * self.box_params_num, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=self.dtype, name="conv_reg")(x)
        dirs = nn.Conv(self.num_anchors * 6, (1, 1),
                       dtype=self.dtype, name="conv_dir")(x)
        return (cls.astype(jnp.float32), reg.astype(jnp.float32),
                dirs.astype(jnp.float32))
