"""Single-pass Pallas pseudo-image grid build.

The XLA lowering of ``zeros(D,H,W,C).at[z,y,x].set(feats)`` materializes the
zeros then COPIES them during the scatter pass (~45 ms standalone for the
640 MB bf16 flagship grid vs its ~8 ms one-write bytes floor at this
chip's ~80 GB/s; variant matrix in ROADMAP).  This kernel writes the grid
exactly once: one program per (z-slice, row chunk) zero-fills its VMEM
window and inserts that range's active rows (the voxelizer emits cell ids
sorted in grid raster order, so each window's voxels are one contiguous
run of the sorted id array).

Mosaic constraints shape the kernel body: scalar loads come from SMEM (the
cell ids), every VMEM access is 8-sublane-aligned (feature rows extracted
from their aligned 8-row group by a masked sum; inserts are aligned 8-row
read-modify-writes — VMEM-only traffic, safe because the loop is
sequential), and the activity mask is NOT a kernel output (a (..., 1)
window lane-pads 128x in VMEM; the mask is a cheap 32 MB XLA scatter
outside).

Replaces the scatter at models/network.py (reference behavior being
lowered: spconv ``SparseConvTensor.dense()``, reference
model/PointPillars.py:565-571).

Training uses a custom VJP: the backward of the insertion is a row gather
of the output cotangent at the voxel cells.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row chunks per z-slice: bounds VMEM window size (hw/chunks rows) while
# keeping the bound-queries array tiny
_CHUNKS = 4

# scoped-VMEM budget requested from Mosaic (v5e has 128 MB VMEM)
_VMEM_LIMIT = 100 * 1024 * 1024


def supported(v, c, grid_dhw, dtype):
    """Whether the kernel's preconditions hold for this problem size.

    The kernel body requires 8-sublane alignment of every dynamic VMEM
    access: the feature-row extraction reads aligned 8-row groups of the
    (V, C) table (V % 8 == 0) and the insert RMWs an aligned 8-row block
    of the chunk window (chunk % 8 == 0, or the last rows of a window
    would read/write past the block).  The whole feats table also rides
    in VMEM lane-padded to 128, which must fit the scoped-VMEM budget
    alongside the double-buffered output windows — a config with a large
    ``max_voxels_static`` (e.g. the shipped 400k ceiling) must take the
    XLA scatter path instead.  Callers fall back when this returns False.
    """
    d, h, w = grid_dhw
    hw = h * w
    nq = _CHUNKS if hw % _CHUNKS == 0 else 1
    chunk = hw // nq
    if v % 8 != 0 or chunk % 8 != 0:
        return False
    lanes = -(-c // 128) * 128
    itemsize = jnp.dtype(dtype).itemsize
    feats_bytes = v * lanes * itemsize
    window_bytes = 2 * chunk * lanes * itemsize  # double-buffered output
    return feats_bytes + window_bytes <= int(_VMEM_LIMIT * 0.9)


def _kernel(bounds_ref, cell_ref, feats_ref, grid_ref):
    """One program per (z, row-chunk): zero-fill + insert active rows.

    Args:
        bounds_ref: (D*_CHUNKS+1,) int32 SMEM — per-window run bounds in
            the sorted voxel order.
        cell_ref: (V,) int32 SMEM — sorted flat cell ids.
        feats_ref: (V, C) VMEM — voxel features (V multiple of 8).
        grid_ref: (1, chunk, C) VMEM output window.
    """
    chunk = grid_ref.shape[1]
    win = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    grid_ref[...] = jnp.zeros_like(grid_ref)
    k0 = bounds_ref[win]
    k1 = bounds_ref[win + 1]
    base = win * chunk
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(j, _):
        r = cell_ref[j] - base
        j8 = pl.multiple_of((j // 8) * 8, 8)
        fsel = (lane8 == (j - j8)).astype(feats_ref.dtype)
        frow = jnp.sum(feats_ref[pl.ds(j8, 8), :] * fsel, axis=0)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        m = lane8 == (r - r8)
        blk = grid_ref[0, pl.ds(r8, 8), :]
        grid_ref[0, pl.ds(r8, 8), :] = jnp.where(m, frow[None, :], blk)
        return 0

    jax.lax.fori_loop(k0, k1, body, 0, unroll=False)


def _scatter_fwd_impl(feats, cell_flat, grid_dhw, interpret):
    d, h, w = grid_dhw
    v, c = feats.shape
    if not supported(v, c, grid_dhw, feats.dtype):
        raise ValueError(
            f"scatter_to_grid preconditions violated for V={v}, C={c}, "
            f"grid={grid_dhw}, dtype={feats.dtype} (8-row alignment or "
            f"VMEM budget — see grid_scatter.supported); use the XLA "
            f"scatter fallback")
    hw = h * w
    nq = _CHUNKS if hw % _CHUNKS == 0 else 1
    chunk = hw // nq
    # per-window run bounds over the SORTED ids; D*nq+1 queries are trivial
    bounds = jnp.searchsorted(
        cell_flat,
        jnp.arange(d * nq + 1, dtype=jnp.int32) * chunk,
        side="left").astype(jnp.int32)

    grid = pl.pallas_call(
        _kernel,
        grid=(d, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((v, c), lambda i, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, q: (i * nq + q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d * nq, chunk, c), feats.dtype),
        # the full feats table rides in VMEM (lane-padded ~26 MB at the
        # flagship V=102k) plus double-buffered output windows: raise the
        # scoped-VMEM cap from its 16 MB default (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bounds, cell_flat, feats)
    return grid.reshape(d, h, w, c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def scatter_to_grid(feats, cell_flat, grid_dhw, interpret=False):
    """Build the dense (D, H, W, C) pseudo-image grid.

    Args:
        feats: (V, C) voxel features; rows of padding voxels are ignored
            (their cell id must be the sentinel ``D*H*W`` or larger).
        cell_flat: (V,) int32 flat cell ids in (z, y, x) raster order,
            SORTED ascending, sentinel >= D*H*W for padding rows.
        grid_dhw: static (D, H, W).
        interpret: run the kernel in interpreter mode (CPU tests).
    Returns:
        grid (D, H, W, C) in feats.dtype.  (The activity mask is built by
        the caller — see module docstring.)
    """
    return _scatter_fwd_impl(feats, cell_flat, grid_dhw, interpret)


def _fwd(feats, cell_flat, grid_dhw, interpret):
    return _scatter_fwd_impl(feats, cell_flat, grid_dhw, interpret), cell_flat


def _bwd(grid_dhw, interpret, cell_flat, grid_ct):
    d, h, w = grid_dhw
    flat_ct = grid_ct.reshape(d * h * w, -1)
    valid = cell_flat < d * h * w
    idx = jnp.where(valid, cell_flat, 0)
    dfeats = flat_ct[idx] * valid[:, None].astype(grid_ct.dtype)
    return dfeats, None


scatter_to_grid.defvjp(_fwd, _bwd)
