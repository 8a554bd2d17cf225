"""Static-shape device voxelization.

Replaces the reference's host-side numba loops
(``points_to_voxel_kernel`` / ``points_to_voxel_reflectance_kernel``,
reference ops/ops_numba.py:109-308) with a sort + segment formulation that
runs entirely on device under `jit`:

1. each point gets a flat cell id (or a sentinel when out of range),
2. a single stable multi-key `lax.sort` orders points by
   (cell, -reflectance) — reproducing the reference's
   reflectance-descending priority for the capped per-voxel point slots
   (ops/ops_numba.py:262) — or by (cell, random key) for the shuffled path
   (ops/ops_numba.py:190),
3. run starts mark unique voxels; a cumulative max gives each point its
   rank inside its voxel; one scatter materializes the padded
   ``(max_voxels, max_points, C)`` buffer, counts, and integer coords.

Semantics vs the reference: per-voxel point capping is identical
(top-reflectance points win the <=max_points slots).  Voxel *order* differs
(ours is cell-id sorted, the reference's is first-appearance) — order is
irrelevant downstream because coords travel with the features.  When the
scene exceeds ``max_voxels`` the reference keeps the first-seen voxels while
we keep the lowest cell ids; both are arbitrary truncation policies.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _grid_of(voxel_size, point_cloud_range):
    return tuple(
        int(round((point_cloud_range[3 + i] - point_cloud_range[i])
                  / voxel_size[i]))
        for i in range(3))


def _cells_sorted(points, num_points, *, voxel_size, point_cloud_range,
                  reflectance_sampling, shuffle_key=None):
    """Shared sort phase: flat cell ids (sentinel for out-of-range) and
    the (cell, priority)-sorted points.  Returns (cell_s, pts_s)."""
    pcr = jnp.asarray(point_cloud_range, points.dtype)
    vsz = jnp.asarray(voxel_size, points.dtype)
    grid = _grid_of(voxel_size, point_cloud_range)

    p = points.shape[0]
    idx = jnp.arange(p)
    valid = idx < num_points

    cell3 = jnp.floor((points[:, :3] - pcr[:3]) / vsz).astype(jnp.int32)
    in_range = jnp.all(
        (cell3 >= 0) & (cell3 < jnp.asarray(grid, jnp.int32)), axis=-1)
    ok = valid & in_range

    sentinel = jnp.int32(grid[0] * grid[1] * grid[2])
    cell = (cell3[:, 2] * grid[1] + cell3[:, 1]) * grid[0] + cell3[:, 0]
    cell = jnp.where(ok, cell, sentinel)

    if reflectance_sampling:
        secondary = -points[:, 3]
    elif shuffle_key is not None:
        secondary = jax.random.uniform(shuffle_key, (p,), points.dtype)
    else:
        secondary = jnp.zeros((p,), points.dtype)

    cell_s, _, order = jax.lax.sort(
        (cell, secondary, idx.astype(jnp.int32)), num_keys=2,
        is_stable=True)
    return cell_s, points[order]


def _finalize_points_scan(cell_s, pts_s, vox, rank, *, grid,
                          max_points_per_voxel, max_voxels):
    """Point-granularity outputs from the fused Pallas scan's (vox, rank)
    (ops/voxel_scan.py): two sorted scatters replace the XLA tail's
    cumsum + bounds pair + P-row rank gather + V-row head gather."""
    sentinel = grid[0] * grid[1] * grid[2]
    in_rng = cell_s < sentinel
    pt_voxel = jnp.where(in_rng, jnp.minimum(vox, max_voxels),
                         max_voxels).astype(jnp.int32)
    pt_valid = in_rng & (vox < max_voxels) & (rank < max_points_per_voxel)
    num_voxels = jnp.minimum(
        jnp.max(jnp.where(in_rng, vox, -1)) + 1, max_voxels).astype(
            jnp.int32)
    voxel_mask = jnp.arange(max_voxels) < num_voxels
    counts = jnp.zeros((max_voxels + 1,), jnp.int32).at[pt_voxel].add(
        pt_valid.astype(jnp.int32),
        indices_are_sorted=True)[:max_voxels]
    # every point of a run carries the same cell id: scatter-min = head
    vcell = jnp.full((max_voxels + 1,), sentinel, jnp.int32).at[
        pt_voxel].min(cell_s, indices_are_sorted=True)[:max_voxels]
    coords = jnp.stack([vcell // (grid[0] * grid[1]),
                        (vcell // grid[0]) % grid[1],
                        vcell % grid[0]], axis=-1)
    coords = jnp.where(voxel_mask[:, None], coords, -1).astype(jnp.int32)
    return {
        "points": pts_s,
        "pt_voxel": pt_voxel,
        "pt_valid": pt_valid,
        "coords": coords,
        "num_points_per_voxel": counts,
        "num_voxels": num_voxels,
        "voxel_mask": voxel_mask,
    }


def _run_bounds(cell_s, vox_id, sentinel, max_voxels):
    """Per-voxel [start, end) bounds in the sorted point order.

    One sorted scatter-min + scatter-max over the nondecreasing voxel ids
    — measured 5.7 ms vs 15.7 ms for the equivalent V+1-query
    ``searchsorted`` at P=131k/V=102k on v5e (binary search pays ~17
    dependent gather rounds; the sorted scatter is one linear pass).
    Empty trailing slots keep start=P / end=0; both are masked by
    ``voxel_mask`` downstream (``counts`` is where-masked, ``head_src``
    clipped).
    """
    p = cell_s.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    # out-of-range points and voxels beyond the cap route to slot V
    tgt = jnp.where(cell_s < sentinel,
                    jnp.minimum(vox_id, max_voxels), max_voxels)
    starts = jnp.full((max_voxels + 1,), p, jnp.int32).at[tgt].min(
        idx, indices_are_sorted=True)
    ends = jnp.zeros((max_voxels + 1,), jnp.int32).at[tgt].max(
        idx + 1, indices_are_sorted=True)
    return starts[:max_voxels], ends[:max_voxels]


@partial(
    jax.jit,
    static_argnames=(
        "voxel_size",
        "point_cloud_range",
        "max_points_per_voxel",
        "max_voxels",
        "reflectance_sampling",
    ),
)
def voxelize(
    points,
    num_points,
    *,
    voxel_size,
    point_cloud_range,
    max_points_per_voxel,
    max_voxels,
    reflectance_sampling=True,
    shuffle_key=None,
):
    """Voxelize one padded point cloud.

    Args:
        points: (P, C) float array, first ``num_points`` rows valid;
            columns 0-2 are xyz, column 3 reflectance.
        num_points: scalar int, number of valid points.
        voxel_size: static (vx, vy, vz) tuple.
        point_cloud_range: static (x0, y0, z0, x1, y1, z1) tuple.
        max_points_per_voxel: static cap M on points kept per voxel.
        max_voxels: static cap V on voxels kept.
        reflectance_sampling: if True, high-reflectance points win the
            capped slots; else insertion order follows ``shuffle_key``.
        shuffle_key: optional jax PRNG key for the shuffled (non-reflectance)
            path; defaults to deterministic input order.
    Returns:
        dict with
            voxels: (V, M, C) padded per-voxel points,
            coords: (V, 3) int32 voxel coords as (z, y, x) — the order the
                reference hands to the sparse encoder
                (model/PointPillars.py:351) — -1 for padding voxels,
            num_points_per_voxel: (V,) int32,
            num_voxels: scalar int32,
            voxel_mask: (V,) bool validity.
    """
    pcr = jnp.asarray(point_cloud_range, points.dtype)
    vsz = jnp.asarray(voxel_size, points.dtype)
    grid = tuple(
        int(round((point_cloud_range[3 + i] - point_cloud_range[i])
                  / voxel_size[i]))
        for i in range(3))

    p = points.shape[0]
    idx = jnp.arange(p)
    valid = idx < num_points

    cell3 = jnp.floor((points[:, :3] - pcr[:3]) / vsz).astype(jnp.int32)
    in_range = jnp.all(
        (cell3 >= 0) & (cell3 < jnp.asarray(grid, jnp.int32)), axis=-1)
    ok = valid & in_range

    # flat cell id in (z, y, x) raster order — the dense grid's memory
    # layout, so the pseudo-image scatter downstream sees SORTED indices
    # (TPU scatters with indices_are_sorted are radically faster)
    sentinel = jnp.int32(grid[0] * grid[1] * grid[2])
    cell = (cell3[:, 2] * grid[1] + cell3[:, 1]) * grid[0] + cell3[:, 0]
    cell = jnp.where(ok, cell, sentinel)

    if reflectance_sampling:
        # secondary key: reflectance descending
        secondary = -points[:, 3]
    elif shuffle_key is not None:
        secondary = jax.random.uniform(shuffle_key, (p,), points.dtype)
    else:
        secondary = jnp.zeros((p,), points.dtype)

    cell_s, _, order = jax.lax.sort(
        (cell, secondary, idx.astype(jnp.int32)), num_keys=2, is_stable=True)
    pts_s = points[order]

    # run decomposition without any scatters (TPU scatters serialize; the
    # whole finalization below is searchsorted + gathers):
    # vox_id is nondecreasing over the sorted order, so per-voxel run
    # boundaries come from binary search.
    first = jnp.concatenate(
        [jnp.array([True]), cell_s[1:] != cell_s[:-1]]) & (cell_s < sentinel)
    vox_id = jnp.cumsum(first) - 1  # voxel index of each sorted point
    starts, ends = _run_bounds(cell_s, vox_id, sentinel, max_voxels)
    v_ids = jnp.arange(max_voxels)

    num_voxels = jnp.minimum(jnp.sum(first), max_voxels).astype(jnp.int32)
    voxel_mask = v_ids < num_voxels

    counts = jnp.where(
        voxel_mask,
        jnp.minimum(ends - starts, max_points_per_voxel), 0
    ).astype(jnp.int32)

    slot = jnp.arange(max_points_per_voxel)
    src = jnp.clip(starts[:, None] + slot[None, :], 0, p - 1)
    slot_valid = (slot[None, :] < counts[:, None])
    voxels = pts_s[src] * slot_valid[..., None].astype(points.dtype)

    # store (z, y, x) like the reference's flipped coords; decoding the
    # flat cell id is cheaper than gathering three coordinate columns
    head_src = jnp.clip(starts, 0, p - 1)
    vcell = cell_s[head_src]
    coords = jnp.stack([vcell // (grid[0] * grid[1]),
                        (vcell // grid[0]) % grid[1],
                        vcell % grid[0]], axis=-1)
    coords = jnp.where(voxel_mask[:, None], coords, -1).astype(jnp.int32)
    return {
        "voxels": voxels,
        "coords": coords,
        "num_points_per_voxel": counts,
        "num_voxels": num_voxels,
        "voxel_mask": voxel_mask,
    }


@partial(
    jax.jit,
    static_argnames=(
        "voxel_size",
        "point_cloud_range",
        "max_points_per_voxel",
        "max_voxels",
        "reflectance_sampling",
    ),
)
def voxelize_points(
    points,
    num_points,
    *,
    voxel_size,
    point_cloud_range,
    max_points_per_voxel,
    max_voxels,
    reflectance_sampling=True,
    shuffle_key=None,
):
    """Voxelize one padded cloud WITHOUT materializing per-voxel buffers.

    Same cell assignment, per-voxel capping, and voxel ordering as
    :func:`voxelize`, but the result stays at point granularity: each
    (sorted) point carries the index of its voxel.  Downstream consumers
    (the point-level PFN) reduce over voxels with segment ops instead of
    reading a padded ``(V, M, C)`` buffer — on TPU that buffer is the
    cost: ~`V*M/P` times more rows than real points, each lane-padded.

    Returns:
        dict with
            points: (P, C) cell-sorted points (capping order applied),
            pt_voxel: (P,) int32 voxel index of each point; ``max_voxels``
                for out-of-range / overflow points (a dump slot),
            pt_valid: (P,) bool — in range, voxel kept, and within the
                per-voxel point cap,
            coords: (V, 3) int32 (z, y, x), -1 for padding voxels,
            num_points_per_voxel: (V,) int32 capped counts,
            num_voxels: scalar int32,
            voxel_mask: (V,) bool.
    """
    grid = _grid_of(voxel_size, point_cloud_range)
    p = points.shape[0]
    idx = jnp.arange(p)
    sentinel = jnp.int32(grid[0] * grid[1] * grid[2])
    cell_s, pts_s = _cells_sorted(
        points, num_points, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        reflectance_sampling=reflectance_sampling, shuffle_key=shuffle_key)

    first = jnp.concatenate(
        [jnp.array([True]), cell_s[1:] != cell_s[:-1]]) & (cell_s < sentinel)
    vox_id = jnp.cumsum(first) - 1
    # pt_voxel stays NONDECREASING over the sorted points (capped points
    # keep their true voxel id; only out-of-range/overflow points go to
    # the dump slot ``max_voxels``) so downstream segment ops can run with
    # indices_are_sorted=True — unsorted TPU scatters serialize.  Consumers
    # must mask with pt_valid (zero for sums, -inf for maxes).
    pt_voxel = jnp.where(cell_s < sentinel,
                         jnp.minimum(vox_id, max_voxels),
                         max_voxels).astype(jnp.int32)

    starts, ends = _run_bounds(cell_s, vox_id, sentinel, max_voxels)
    v_ids = jnp.arange(max_voxels)

    # rank of each point inside its voxel: gathering the run start is
    # ~2x cheaper than a cummax over P on this chip
    slot = idx - starts[jnp.minimum(vox_id, max_voxels - 1)]
    pt_valid = ((cell_s < sentinel) & (vox_id < max_voxels)
                & (slot < max_points_per_voxel))

    num_voxels = jnp.minimum(jnp.sum(first), max_voxels).astype(jnp.int32)
    voxel_mask = v_ids < num_voxels
    counts = jnp.where(
        voxel_mask,
        jnp.minimum(ends - starts, max_points_per_voxel), 0
    ).astype(jnp.int32)

    head_src = jnp.clip(starts, 0, p - 1)
    vcell = cell_s[head_src]
    coords = jnp.stack([vcell // (grid[0] * grid[1]),
                        (vcell // grid[0]) % grid[1],
                        vcell % grid[0]], axis=-1)
    coords = jnp.where(voxel_mask[:, None], coords, -1).astype(jnp.int32)
    return {
        "points": pts_s,
        "pt_voxel": pt_voxel,
        "pt_valid": pt_valid,
        "coords": coords,
        "num_points_per_voxel": counts,
        "num_voxels": num_voxels,
        "voxel_mask": voxel_mask,
    }


class Voxelizer:
    """Configured voxelization op (reference ops/ops_numba.py:40-107 surface).

    Bundles the static parameters so model code can call
    ``voxelizer(points, n)`` (optionally vmapped over a batch).
    """

    def __init__(self, voxel_size, point_cloud_range, max_voxel_points,
                 max_voxels, reflectance_sampling=True):
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.point_cloud_range = tuple(float(v) for v in point_cloud_range)
        self.max_voxel_points = int(max_voxel_points)
        self.max_voxels = int(max_voxels)
        self.reflectance_sampling = bool(reflectance_sampling)
        self.grid_size = tuple(
            int(round((self.point_cloud_range[3 + i]
                       - self.point_cloud_range[i]) / self.voxel_size[i]))
            for i in range(3))

    def __call__(self, points, num_points, shuffle_key=None):
        return voxelize(
            points,
            num_points,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            max_points_per_voxel=self.max_voxel_points,
            max_voxels=self.max_voxels,
            reflectance_sampling=self.reflectance_sampling,
            shuffle_key=shuffle_key,
        )

    def points(self, points, num_points, shuffle_key=None):
        """Point-granularity variant (see :func:`voxelize_points`)."""
        return voxelize_points(
            points,
            num_points,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            max_points_per_voxel=self.max_voxel_points,
            max_voxels=self.max_voxels,
            reflectance_sampling=self.reflectance_sampling,
            shuffle_key=shuffle_key,
        )

    def points_batch(self, points, num_points, pallas="off"):
        """Batched point-granularity voxelization.

        ``pallas="auto"`` (TPU) / ``"interpret"`` (CPU tests) routes the
        post-sort tail through the fused Pallas scan
        (ops/voxel_scan.py); ``"off"`` keeps the pure-XLA tail (required
        under GSPMD mesh partitioning).  The kernel takes the whole
        (B, P) batch in one grid — no vmap over the Mosaic call.

        Args:
            points: (B, P, C); num_points: (B,) valid counts.
        Returns:
            dict of batched :func:`voxelize_points` outputs.
        """
        from objectdetection_3d_tpu.ops import voxel_scan

        use_scan = (pallas in ("scan", "interpret")
                    or (pallas == "auto"
                        and jax.default_backend() == "tpu"
                        and voxel_scan.supported(points.shape[1])))
        if not use_scan:
            return jax.vmap(self.points)(points, num_points)

        grid = self.grid_size
        cell_s, pts_s = jax.vmap(partial(
            _cells_sorted, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            reflectance_sampling=self.reflectance_sampling,
        ))(points, num_points)
        vox, rank = voxel_scan.postsort_scan(
            cell_s, grid[0] * grid[1] * grid[2],
            interpret=(pallas == "interpret"))
        return jax.vmap(partial(
            _finalize_points_scan, grid=grid,
            max_points_per_voxel=self.max_voxel_points,
            max_voxels=self.max_voxels,
        ))(cell_s, pts_s, vox, rank)
