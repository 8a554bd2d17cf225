"""Fused post-sort voxel scan (Pallas, TPU).

After the voxelizer's multi-key sort, the XLA tail is a chain of small
sequential 1-D passes over the sorted cell ids: run-start detection, a
P-length cumsum for voxel ids, two (V+1)-slot scatter-min/max for run
bounds, a P-row gather for per-point ranks and a V-row gather for voxel
head cells (ops/voxelize.py; the ops being outclassed are the reference's
per-point numba loops, ops/ops_numba.py:171-308).  Each pass is tiny in
bytes (~0.5 MB) but pays its own kernel launch and the gathers pay
~35 ns/row (CLAUDE.md) — together they dominate the post-sort tail.

This kernel computes, in ONE sequential pass over lane-blocks of the
sorted cells with an SMEM carry:

* ``vox``  — the 0-based run index of every point (what cumsum gave),
* ``rank`` — the point's position inside its run (what the run-bounds
  scatter + P-row gather gave).

Per-point validity, per-voxel counts and head cells then reduce to two
cheap sorted scatters in the caller — no cumsum, no gathers, no
min/max-bounds pair.

Mosaic notes: blocks are (1, BLK) int32 lane vectors; the in-block
prefix sum / prefix max are Hillis-Steele ladders of ``pltpu.roll``
(log2(BLK) lane rotates); scalars cross blocks through SMEM scratch and
all scalar reads of vector data go through lane-masked reductions (no
scalar VMEM loads).  Batching: Mosaic requires the block's second-to-last
dim to divide 8 or equal the array's, so a (B, P) input is flattened to
(1, B*P) and scanned by ONE sequential grid; lane 0 of every
``blocks_per_row``-th block forces a run restart (row boundary), and the
caller re-bases ``vox`` per row by subtracting the row's first value.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 4096


def supported(p):
    """Preconditions: the padded point budget tiles into lane blocks."""
    return p % _BLK == 0 and p >= _BLK


def _kernel(cell_ref, vox_ref, rank_ref, carry_ref, *, blk, blocks_per_row,
            sentinel):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = jnp.int32(-1)  # previous block's last cell id
        carry_ref[1] = jnp.int32(0)   # runs started so far
        carry_ref[2] = jnp.int32(0)   # current run's global start index

    x = cell_ref[...]                                   # (1, blk) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    shifted = jnp.where(lane == 0, carry_ref[0],
                        pltpu.roll(x, 1, axis=1))
    # a batch-row boundary always restarts the run: rows are independent
    # clouds whose first sorted cell may equal the previous row's last
    row_start = (i % blocks_per_row == 0) & (lane == 0)
    first = ((x != shifted) | row_start) & (x < sentinel)
    f = first.astype(jnp.int32)

    # inclusive prefix sum of run starts (Hillis-Steele over lanes)
    s = f
    d = 1
    while d < blk:
        s = s + jnp.where(lane >= d, pltpu.roll(s, d, axis=1), 0)
        d *= 2
    # points continuing the previous block's run see s == 0 and resolve
    # to carry[1] - 1, the index of that (last started) run
    vox_ref[...] = carry_ref[1] + s - 1

    # prefix max of the masked global iota = each point's run start
    g = i * blk + lane
    m = jnp.where(first, g, -1)
    r = m
    d = 1
    while d < blk:
        r = jnp.maximum(r, jnp.where(lane >= d,
                                     pltpu.roll(r, d, axis=1), -1))
        d *= 2
    start = jnp.where(r >= 0, r, carry_ref[2])
    rank_ref[...] = g - start

    # carry to the next block (scalar reads via lane-masked reductions)
    carry_ref[0] = jnp.sum(jnp.where(lane == blk - 1, x, 0))
    carry_ref[1] = carry_ref[1] + jnp.sum(f)
    carry_ref[2] = jnp.maximum(jnp.max(m), carry_ref[2])


@partial(jax.jit, static_argnames=("sentinel", "interpret"))
def postsort_scan(cell_s, sentinel, interpret=False):
    """Run indices + in-run ranks of sorted cell ids.

    Args:
        cell_s: (B, P) int32 cell ids, nondecreasing per row; ids >=
            ``sentinel`` mark out-of-range points (sorted to the end).
        sentinel: static int sentinel value.
        interpret: run in interpreter mode (CPU tests).
    Returns:
        vox: (B, P) int32 — 0-based run index per point (undefined at
            sentinel points; callers mask with ``cell_s < sentinel``),
        rank: (B, P) int32 — position inside the run (undefined at
            sentinel points).
    """
    b, p = cell_s.shape
    assert supported(p), f"P={p} must be a multiple of {_BLK}"
    # Mosaic rejects a (1, BLK) block against a (B, P) array when B > 1
    # (second-to-last block dim must divide 8 or equal B).  Flatten to
    # (1, B*P): one sequential grid, row boundaries restart runs in-kernel.
    blocks_per_row = p // _BLK
    flat = cell_s.reshape(1, b * p)
    vox, rank = pl.pallas_call(
        partial(_kernel, blk=_BLK, blocks_per_row=blocks_per_row,
                sentinel=int(sentinel)),
        grid=(b * blocks_per_row,),
        in_specs=[pl.BlockSpec((1, _BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, b * p), jnp.int32)] * 2,
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(flat)
    vox = vox.reshape(b, p)
    rank = rank.reshape(b, p)
    # re-base run indices per row (vox[:, 0] counts the runs of all
    # earlier rows; rows sort valid cells first, so position 0 is valid
    # whenever the row has any valid point — otherwise everything in the
    # row is masked by the caller anyway)
    return vox - vox[:, :1], rank
