"""Anchor generation and box coding.

The reference regenerates the full 1.92M-anchor grid on device every
training step and again at inference (model/PointPillars.py:907-911,1041);
here anchors are a host-side numpy constant baked into the jitted program at
trace time — XLA keeps one copy in HBM.
"""

import numpy as np
import jax.numpy as jnp


class Anchor3DRangeGenerator:
    """Range-based 3D anchor grid (reference model/utils.py:136-264).

    Anchor layout (and therefore flat ordering) matches the reference: for a
    (H, W) feature map the grid is (z=1, y=H, x=W) with centers from
    *endpoint-inclusive* linspaces over the range, crossed with S sizes and
    R rotation triples -> (H, W, S, R, box_params) and flat index
    ``((y * W + x) * S + s) * R + r``.
    """

    def __init__(self, ranges, sizes, rotations, box_params_num=9):
        self.ranges = [list(map(float, r)) for r in ranges]
        self.sizes = np.asarray(sizes, np.float32).reshape(-1, 3)
        self.rotations = np.asarray(rotations, np.float32).reshape(-1, 3)
        self.box_params_num = int(box_params_num)

    @property
    def num_base_anchors(self):
        """Anchors per feature-map cell (sizes x rotations)."""
        return self.sizes.shape[0] * self.rotations.shape[0]

    def grid_anchors(self, featmap_size):
        """Generate the anchor grid as a numpy constant.

        Args:
            featmap_size: (H, W) tuple.
        Returns:
            (H, W, S, R, box_params) float32 array.
        """
        h, w = featmap_size
        outs = []
        for anchor_range in self.ranges:
            # torch.linspace(lo, hi, steps) is endpoint-inclusive; steps=1
            # yields [lo] (the z center of the single vertical level)
            z_centers = np.linspace(anchor_range[2], anchor_range[5], 1,
                                    dtype=np.float32)
            y_centers = np.linspace(anchor_range[1], anchor_range[4], h,
                                    dtype=np.float32)
            x_centers = np.linspace(anchor_range[0], anchor_range[3], w,
                                    dtype=np.float32)
            # (H, W, S, R, 9): centers xyz + size + rotation triple
            yy, xx = np.meshgrid(y_centers, x_centers, indexing="ij")
            cent = np.stack(
                [xx, yy, np.full_like(xx, z_centers[0])], axis=-1)
            s = self.sizes.shape[0]
            r = self.rotations.shape[0]
            cent = np.broadcast_to(cent[:, :, None, None, :], (h, w, s, r, 3))
            size = np.broadcast_to(
                self.sizes[None, None, :, None, :], (h, w, s, r, 3))
            rot = np.broadcast_to(
                self.rotations[None, None, None, :, :], (h, w, s, r, 3))
            outs.append(np.concatenate([cent, size, rot], axis=-1))
        return np.concatenate(outs, axis=2).astype(np.float32)

    def flat_anchors(self, featmap_size):
        """(H*W*S*R, box_params) in the head's flat anchor order."""
        return self.grid_anchors(featmap_size).reshape(
            -1, self.box_params_num)


class BBoxCoder:
    """Delta encoding between anchors and 9-param boxes.

    Matches reference model/utils.py:266-337: xy normalized by the anchor
    BEV diagonal, z by anchor height with both z's shifted from bottom to
    center, log-size ratios, raw angle deltas.
    """

    @staticmethod
    def encode(src_boxes, dst_boxes):
        xa, ya, za = (src_boxes[..., 0], src_boxes[..., 1], src_boxes[..., 2])
        dxa, dya, dza = (src_boxes[..., 3], src_boxes[..., 4],
                         src_boxes[..., 5])
        xg, yg, zg = (dst_boxes[..., 0], dst_boxes[..., 1], dst_boxes[..., 2])
        dxg, dyg, dzg = (dst_boxes[..., 3], dst_boxes[..., 4],
                         dst_boxes[..., 5])

        zg = zg + dzg / 2
        za = za + dza / 2
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)

        out = [
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / dza,
            jnp.log(dxg / dxa),
            jnp.log(dyg / dya),
            jnp.log(dzg / dza),
            dst_boxes[..., 6] - src_boxes[..., 6],
            dst_boxes[..., 7] - src_boxes[..., 7],
            dst_boxes[..., 8] - src_boxes[..., 8],
        ]
        return jnp.stack(out, axis=-1)

    @staticmethod
    def decode(anchors, deltas):
        xa, ya, za = (anchors[..., 0], anchors[..., 1], anchors[..., 2])
        dxa, dya, dza = (anchors[..., 3], anchors[..., 4], anchors[..., 5])

        za = za + dza / 2
        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)

        out = [
            deltas[..., 0] * diagonal + xa,
            deltas[..., 1] * diagonal + ya,
            deltas[..., 2] * dza + za,
            jnp.exp(deltas[..., 3]) * dxa,
            jnp.exp(deltas[..., 4]) * dya,
            jnp.exp(deltas[..., 5]) * dza,
            deltas[..., 6] + anchors[..., 6],
            deltas[..., 7] + anchors[..., 7],
            deltas[..., 8] + anchors[..., 8],
        ]
        return jnp.stack(out, axis=-1)
