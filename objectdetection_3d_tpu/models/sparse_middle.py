"""Sparse gather-based vertical encoder (drop-in twin of the dense one).

Same parameter names/shapes as :class:`SparseMiddleExtractor`
(``subm_{i}_kernel`` / ``down_{i}_kernel`` / ``subm_bn_{i}`` /
``down_bn_{i}``), so one checkpoint drives either execution path.  Instead
of materializing the (B, 100, 400, 400, C) grid, it keeps the <=1%-occupied
active set sorted by flat cell id and turns every conv into binary-search
neighbor gathers + one MXU matmul (ops/sparse_conv.py).

Numerics are identical to the dense-masked path: same active-set rules,
same masked batch-norm statistics over active sites across the batch.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from objectdetection_3d_tpu.models.layers import MaskedBatchNorm
from objectdetection_3d_tpu.ops.sparse_conv import (
    build_index_map,
    downsample_z_active_set,
    scatter_pseudo_image,
    strided_z_conv_sparse,
    subm_conv3d_sparse,
)


class SparseMiddleExtractorGather(nn.Module):
    """Vertical encoder over sorted sparse active sets."""

    in_channels: int
    out_channels: Sequence[int]
    grid: Tuple[int, int, int]  # (D, H, W)
    budget: int                 # max active sites per stage (static)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, cell_flat, active_mask, train: bool):
        """
        Args:
            feats: (B, V, C) voxel features (padding rows zero).
            coords: (B, V, 3) int (z, y, x), -1 padding.
            cell_flat: (B, V) sorted flat ids (sentinel padding).
            active_mask: (B, V) validity.
        Returns:
            (B, H, W, C_out * D_final) pseudo-image.
        """
        x = feats.astype(self.dtype)
        grid = tuple(self.grid)
        # one dense index map per active set, shared by the stage's subm
        # and strided convs (the scatter is the map's only cost)
        index_map = jax.vmap(lambda cf: build_index_map(cf, grid))(cell_flat)
        for i, ch in enumerate(self.out_channels):
            c_in = x.shape[-1]
            k_subm = self.param(f"subm_{i}_kernel",
                                nn.initializers.lecun_normal(),
                                (3, 3, 3, c_in, ch))
            x = jax.vmap(subm_conv3d_sparse,
                         in_axes=(0, 0, 0, 0, None, None))(
                x, coords, index_map, active_mask, k_subm, grid)
            x = MaskedBatchNorm(name=f"subm_bn_{i}")(
                x, active_mask[..., None], train)
            x = nn.relu(x)

            new = jax.vmap(
                lambda cc, mm: downsample_z_active_set(
                    cc, mm, grid, self.budget))(coords, active_mask)
            k_down = self.param(f"down_{i}_kernel",
                                nn.initializers.lecun_normal(),
                                (3, ch, ch))
            x = jax.vmap(strided_z_conv_sparse,
                         in_axes=(0, 0, 0, 0, None, None))(
                x, index_map, new["coords"], new["active_mask"],
                k_down, grid)
            coords = new["coords"]
            cell_flat = new["cell_flat"]
            active_mask = new["active_mask"]
            grid = ((grid[0] - 3) // 2 + 1, grid[1], grid[2])
            index_map = jax.vmap(
                lambda cf, g=grid: build_index_map(cf, g))(cell_flat)

            x = MaskedBatchNorm(name=f"down_bn_{i}")(
                x, active_mask[..., None], train)
            x = nn.relu(x)

        return jax.vmap(
            lambda f, cc, mm: scatter_pseudo_image(f, cc, mm, grid))(
            x, coords, active_mask)
