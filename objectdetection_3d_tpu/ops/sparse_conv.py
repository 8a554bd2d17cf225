"""Gather-based sparse 3D convolution primitives.

The dense-masked vertical encoder computes the full 400x400x100 grid even
though forest scenes occupy well under 1% of it.  These primitives exploit
that sparsity *structurally*, the TPU way: no hash maps or CUDA gather
kernels (spconv's approach, reference model/PointPillars.py:529-573) —
instead neighbor lookup goes through a dense int32 cell->row index map
(one sorted scatter per active set, then plain gathers), and each conv
becomes one dense ``(V, K*C) @ (K*C, C_out)`` matmul that the MXU loves.

Measured on v5e: 27 ``searchsorted`` neighbor lookups cost ~390 ms/conv
(binary search lowers to a 17-step gather loop) while the same lookups
through the dense index map are pure gathers — the map approach is what
makes this path competitive with the dense encoder.

Semantics are identical to the dense-masked path (and to spconv):

* submanifold conv: outputs only at the input active set, neighbors
  outside it contribute zero;
* strided sparse conv: the output active set is every site receiving at
  least one active input; built here by sort-dedup of candidate ids.

All shapes are static: active sets are padded to a per-stage budget with
validity masks.
"""

from functools import partial

import jax
import jax.numpy as jnp


def flatten_cells(coords, grid_dhw):
    """(V, 3) int (z, y, x) -> flat ids in (z, y, x)-major raster order
    (the voxelizer's sort order), sentinel for invalid rows."""
    d, h, w = grid_dhw
    sentinel = jnp.int32(w * h * d)
    valid = coords[:, 0] >= 0
    flat = ((coords[:, 0] * h + coords[:, 1]) * w + coords[:, 2])
    return jnp.where(valid, flat, sentinel).astype(jnp.int32)


def build_index_map(cell_flat, grid_dhw):
    """Dense cell-id -> active-row index map.

    One sorted-unique scatter of the active rows; inactive cells (and the
    extra sentinel slot at the end) hold V, which addresses the zero pad
    row the gather helpers append to the feature table.

    Args:
        cell_flat: (V,) sorted flat ids (sentinel ``D*H*W`` for padding).
        grid_dhw: static (D, H, W).
    Returns:
        (D*H*W + 1,) int32 map; ``map[q]`` is the feature row of cell q,
        V when q is inactive or q == D*H*W (the query sentinel).
    """
    d, h, w = grid_dhw
    v = cell_flat.shape[0]
    sentinel = d * h * w
    # every padding row holds the same sentinel id, so scattering cell_flat
    # directly would violate unique_indices (UB: map[sentinel] could alias
    # an arbitrary padding row).  Route padding rows one past the sentinel
    # slot instead — dropped by mode='drop' — so indices really are unique
    # and map[sentinel] keeps its initialized value V (the zero pad row).
    idx = jnp.where(cell_flat < sentinel, cell_flat, sentinel + 1)
    return jnp.full((sentinel + 1,), v, jnp.int32).at[idx].set(
        jnp.arange(v, dtype=jnp.int32), mode="drop",
        unique_indices=True, indices_are_sorted=True)


def _neighbor_lookup(cell_flat, query_flat):
    """Binary-search fallback (kept for oracle tests): indices of query ids
    inside the sorted active id array.

    Returns:
        (idx, found): idx in [0, V) (clipped), found bool.
    """
    v = cell_flat.shape[0]
    pos = jnp.searchsorted(cell_flat, query_flat)
    pos_c = jnp.clip(pos, 0, v - 1)
    found = cell_flat[pos_c] == query_flat
    return pos_c, found


def subm_conv3d_sparse(feats, coords, index_map, active_mask, kernel,
                       grid_dhw):
    """3x3x3 submanifold conv on a sorted sparse active set.

    Args:
        feats: (V, C) active-site features (padding rows zero).
        coords: (V, 3) int (z, y, x).
        index_map: dense lookup from :func:`build_index_map` for this
            active set.
        active_mask: (V,) validity.
        kernel: (3, 3, 3, C, C_out) weights, layout [dz, dy, dx].
        grid_dhw: static (D, H, W).
    Returns:
        (V, C_out) features at the same active set.
    """
    d, h, w = grid_dhw
    v, c = feats.shape
    co = kernel.shape[-1]
    sentinel = jnp.int32(w * h * d)

    # row V is an all-zero pad: missing neighbors contribute nothing
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)

    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    gathered = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                zz, yy, xx = z + dz, y + dy, x + dx
                ok = (active_mask
                      & (zz >= 0) & (zz < d)
                      & (yy >= 0) & (yy < h)
                      & (xx >= 0) & (xx < w))
                q = jnp.where(ok, (zz * h + yy) * w + xx, sentinel)
                gathered.append(feats_pad[index_map[q]])

    stacked = jnp.concatenate(gathered, axis=-1)        # (V, 27*C)
    wmat = kernel.reshape(27 * c, co)
    out = jnp.dot(stacked, wmat.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return out * active_mask[:, None].astype(feats.dtype)


@partial(jax.jit, static_argnames=("grid_dhw", "out_budget"))
def downsample_z_active_set(coords, active_mask, grid_dhw, out_budget):
    """Active set of a (3,1,1)-kernel (2,1,1)-stride VALID sparse conv.

    An output site (z', y, x) is active iff any input (2z'+k, y, x) is
    active.  Built by sorting the <=3 candidate output ids per input and
    deduplicating; output is the new sorted padded active set.

    Returns:
        dict with coords (V', 3), cell_flat (V',), active_mask (V',) and
        the new grid (D', H, W).
    """
    d, h, w = grid_dhw
    d_out = (d - 3) // 2 + 1
    sentinel = jnp.int32(w * h * d_out)

    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    cands = []
    for k in range(3):
        zo = z - k
        ok = active_mask & (zo >= 0) & (zo % 2 == 0) & (zo // 2 < d_out)
        zp = zo // 2
        cands.append(jnp.where(ok, (zp * h + y) * w + x, sentinel))
    cand = jnp.concatenate(cands)                        # (3V,)
    cand_sorted = jnp.sort(cand)
    first = jnp.concatenate(
        [jnp.array([True]), cand_sorted[1:] != cand_sorted[:-1]])
    first &= cand_sorted < sentinel
    # compact the unique ids to the front with a second key sort
    rank = jnp.where(first, jnp.cumsum(first) - 1, 3 * coords.shape[0])
    order = jnp.argsort(rank)
    take = min(out_budget, cand.shape[0])
    uniq = cand_sorted[order][:take]
    if take < out_budget:  # fewer candidates than budget: pad with sentinel
        uniq = jnp.concatenate(
            [uniq, jnp.full((out_budget - take,), sentinel, uniq.dtype)])
    n_out = jnp.minimum(jnp.sum(first), out_budget)
    mask = jnp.arange(out_budget) < n_out
    uniq = jnp.where(mask, uniq, sentinel)

    xo = uniq % w
    yo = (uniq // w) % h
    zo = uniq // (w * h)
    out_coords = jnp.where(
        mask[:, None],
        jnp.stack([zo, yo, xo], axis=-1), -1).astype(jnp.int32)
    return {"coords": out_coords, "cell_flat": uniq.astype(jnp.int32),
            "active_mask": mask, "grid": (d_out, h, w)}


def strided_z_conv_sparse(feats, in_index_map, out_coords, out_mask,
                          kernel, grid_dhw):
    """(3,1,1)-kernel (2,1,1)-stride VALID sparse conv.

    Args:
        feats: (V, C) input features on the input active set.
        in_index_map: dense lookup over the INPUT active set
            (:func:`build_index_map`).
        out_coords: (V', 3) output (z', y, x).
        out_mask: (V',) output active-set validity.
        kernel: (3, C, C_out), tap k reads input z = 2z'+k.
        grid_dhw: static INPUT grid (D, H, W).
    Returns:
        (V', C_out).
    """
    d, h, w = grid_dhw
    c = feats.shape[1]
    co = kernel.shape[-1]
    sentinel = jnp.int32(w * h * d)

    feats_pad = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)

    zp, y, x = out_coords[:, 0], out_coords[:, 1], out_coords[:, 2]
    gathered = []
    for k in range(3):
        zi = 2 * zp + k
        ok = out_mask & (zi >= 0) & (zi < d)
        q = jnp.where(ok, (zi * h + y) * w + x, sentinel)
        gathered.append(feats_pad[in_index_map[q]])

    stacked = jnp.concatenate(gathered, axis=-1)          # (V', 3C)
    out = jnp.dot(stacked, kernel.reshape(3 * c, co).astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return out * out_mask[:, None].astype(feats.dtype)


def scatter_pseudo_image(feats, coords, active_mask, grid_dhw):
    """Sparse final-stage features -> dense (H, W, C*D) pseudo-image.

    Channel layout (C, D) matches the reference's view(N, C*D, H, W)
    (model/PointPillars.py:571).
    """
    d, h, w = grid_dhw
    c = feats.shape[-1]
    z = jnp.where(active_mask, coords[:, 0], d)
    y = jnp.where(active_mask, coords[:, 1], h)
    x = jnp.where(active_mask, coords[:, 2], w)
    img = jnp.zeros((h, w, d, c), feats.dtype).at[y, x, z].set(
        feats, mode="drop", unique_indices=True)
    return img.transpose(0, 1, 3, 2).reshape(h, w, c * d)
