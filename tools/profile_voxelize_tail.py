"""Break down voxelize_points into sort vs post-sort tail on the chip.

VERDICT r3 #4 targets the voxelizer's residual small sequential 1-D ops
(run bounds, ranks, head gathers) for a single fused Pallas scan.  This
profile isolates, at the flagship workload (P=131k, V=102k budgets,
100k real points):

  a. cell-id computation + the 3-key stable sort alone,
  b. the full voxelize_points,
  c. the post-sort tail components re-run standalone on pre-sorted data:
     run-bounds scatters, the rank gather, the head gather + coords
     decode, and cumsum(first).

Timings use pipelined K-call streams with one readback (the ~27 ms RPC
sync otherwise dominates ms-scale ops).  Run on the real chip:
``python tools/profile_voxelize_tail.py``.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

P = 131_072
V = 102_400
M = 50
GRID = (400, 400, 100)
PCR = (0.0, 0.0, 0.0, 40.0, 40.0, 30.0)
VSZ = (0.1, 0.1, 0.3)


def stream_time(fn, args, k=8, reps=5):
    # device_put ONCE: a host-numpy arg re-uploads 2 MB through the
    # tunnel on EVERY call (~40 ms), drowning the ms-scale op under test
    args = [jax.device_put(a) for a in args]
    outs = [fn(*args) for _ in range(k)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    float(jnp.asarray(leaf).sum())
    times = []
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(*args) for _ in range(k)]
        s = sum(jnp.asarray(jax.tree_util.tree_leaves(o)[0]).sum()
                for o in outs)
        float(s)
        times.append((time.time() - t0) / k)
    return float(np.median(times)) * 1e3


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    pts = np.zeros((P, 4), np.float32)
    pts[:n, :3] = rng.uniform([0, 0, 0], [40, 40, 12], (n, 3))
    pts[:n, 3] = rng.uniform(0, 1, n)
    num = np.int32(n)

    from objectdetection_3d_tpu.ops.voxelize import voxelize_points

    full = jax.jit(partial(
        voxelize_points, voxel_size=VSZ, point_cloud_range=PCR,
        max_points_per_voxel=M, max_voxels=V, reflectance_sampling=True))
    t_full = stream_time(lambda p, c: full(p, c), (pts, num))
    print(f"voxelize_points full: {t_full:.2f} ms")

    @jax.jit
    def sort_only(points, num_points):
        pcr = jnp.asarray(PCR, points.dtype)
        vsz = jnp.asarray(VSZ, points.dtype)
        idx = jnp.arange(P)
        valid = idx < num_points
        cell3 = jnp.floor((points[:, :3] - pcr[:3]) / vsz).astype(jnp.int32)
        ok = valid & jnp.all(
            (cell3 >= 0) & (cell3 < jnp.asarray(GRID, jnp.int32)), axis=-1)
        sentinel = jnp.int32(GRID[0] * GRID[1] * GRID[2])
        cell = (cell3[:, 2] * GRID[1] + cell3[:, 1]) * GRID[0] + cell3[:, 0]
        cell = jnp.where(ok, cell, sentinel)
        cell_s, _, order = jax.lax.sort(
            (cell, -points[:, 3], idx.astype(jnp.int32)), num_keys=2,
            is_stable=True)
        return cell_s, order

    t_sort = stream_time(lambda p, c: sort_only(p, c), (pts, num))
    print(f"cell + 3-key sort:    {t_sort:.2f} ms")

    cell_s, order = jax.jit(sort_only)(pts, num)
    cell_s = jnp.asarray(np.asarray(cell_s))  # fresh device array
    sentinel = np.int32(GRID[0] * GRID[1] * GRID[2])

    @jax.jit
    def pts_gather(points, order):
        return points[order]

    t_g = stream_time(lambda p, o: pts_gather(p, o), (pts, order))
    print(f"points row gather:    {t_g:.2f} ms")

    @jax.jit
    def tail_first_cumsum(cell_s):
        first = jnp.concatenate(
            [jnp.array([True]), cell_s[1:] != cell_s[:-1]]) & (
                cell_s < sentinel)
        return jnp.cumsum(first)

    t_c = stream_time(lambda c: tail_first_cumsum(c), (cell_s,))
    print(f"first + cumsum:       {t_c:.2f} ms")

    vox_id = jax.jit(tail_first_cumsum)(cell_s) - 1

    @jax.jit
    def tail_bounds(cell_s, vox_id):
        idx = jnp.arange(P, dtype=jnp.int32)
        tgt = jnp.where(cell_s < sentinel, jnp.minimum(vox_id, V), V)
        starts = jnp.full((V + 1,), P, jnp.int32).at[tgt].min(
            idx, indices_are_sorted=True)
        ends = jnp.zeros((V + 1,), jnp.int32).at[tgt].max(
            idx + 1, indices_are_sorted=True)
        return starts[:V], ends[:V]

    t_b = stream_time(lambda c, v: tail_bounds(c, v), (cell_s, vox_id))
    print(f"run-bounds scatters:  {t_b:.2f} ms")

    starts, ends = jax.jit(tail_bounds)(cell_s, vox_id)

    @jax.jit
    def tail_rank(starts, vox_id):
        idx = jnp.arange(P, dtype=jnp.int32)
        return idx - starts[jnp.minimum(vox_id, V - 1)]

    t_r = stream_time(lambda s, v: tail_rank(s, v), (starts, vox_id))
    print(f"rank gather:          {t_r:.2f} ms")

    @jax.jit
    def tail_coords(cell_s, starts):
        head = jnp.clip(starts, 0, P - 1)
        vcell = cell_s[head]
        return jnp.stack([vcell // (GRID[0] * GRID[1]),
                          (vcell // GRID[0]) % GRID[1],
                          vcell % GRID[0]], -1)

    t_h = stream_time(lambda c, s: tail_coords(c, s), (cell_s, starts))
    print(f"head gather + coords: {t_h:.2f} ms")

    tail = t_full - t_sort
    print(f"\npost-sort tail (full - sort): {tail:.2f} ms; "
          f"components standalone: cumsum {t_c:.2f} + bounds {t_b:.2f} "
          f"+ rank {t_r:.2f} + coords {t_h:.2f} "
          f"= {t_c + t_b + t_r + t_h:.2f} ms (fusion overlap explains "
          "any gap)")


if __name__ == "__main__":
    main()
