import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.ops.voxelize import Voxelizer  # noqa: E402
from oracles import voxelize_np  # noqa: E402

VOXEL_SIZE = (0.5, 0.5, 1.0)
PC_RANGE = (0.0, 0.0, 0.0, 8.0, 8.0, 4.0)


def make_cloud(n, rng, pad_to=None):
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = rng.uniform(-1.0, 9.0, (n, 3)).astype(np.float32)
    pts[:, 3] = rng.permutation(n).astype(np.float32)  # distinct reflectance
    if pad_to is not None and pad_to > n:
        pts = np.concatenate(
            [pts, np.full((pad_to - n, 4), 1e9, np.float32)], 0)
    return pts


def as_voxel_dict(out):
    """Convert device output to {(x,y,z): sorted point tuples}."""
    res = {}
    n = int(out["num_voxels"])
    coords = np.asarray(out["coords"])[:n]
    voxels = np.asarray(out["voxels"])[:n]
    counts = np.asarray(out["num_points_per_voxel"])[:n]
    for i in range(n):
        z, y, x = coords[i]
        pts = voxels[i, : counts[i]]
        res[(int(x), int(y), int(z))] = sorted(map(tuple, pts.tolist()))
    return res


def oracle_voxel_dict(vox_dict):
    return {k: sorted(tuple(map(float, p)) for p in v)
            for k, v in vox_dict.items()}


def test_matches_oracle_reflectance_priority():
    rng = np.random.default_rng(0)
    pts = make_cloud(500, rng, pad_to=512)
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=3, max_voxels=1024,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 500)
    got = as_voxel_dict(out)
    want, _ = voxelize_np(pts[:500].astype(np.float64), VOXEL_SIZE, PC_RANGE,
                          max_points=3, max_voxels=1024,
                          reflectance_sampling=True)
    want = oracle_voxel_dict(want)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5)


def test_counts_and_mask():
    rng = np.random.default_rng(1)
    pts = make_cloud(200, rng, pad_to=256)
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=5, max_voxels=64,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 200)
    n = int(out["num_voxels"])
    counts = np.asarray(out["num_points_per_voxel"])
    mask = np.asarray(out["voxel_mask"])
    assert np.all(counts[:n] >= 1) and np.all(counts[:n] <= 5)
    assert np.all(counts[n:] == 0)
    assert np.array_equal(mask, np.arange(64) < n)
    # padding voxels have sentinel coords and zero features
    coords = np.asarray(out["coords"])
    assert np.all(coords[n:] == -1)
    assert np.all(np.asarray(out["voxels"])[n:] == 0)


def test_out_of_range_points_dropped():
    pts = np.array([
        [1.0, 1.0, 1.0, 5.0],
        [-0.1, 1.0, 1.0, 4.0],   # below x range
        [1.0, 8.0, 1.0, 3.0],    # y == max -> out (floor gives grid size)
        [1.0, 1.0, 3.99, 2.0],
    ], np.float32)
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=4, max_voxels=16,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 4)
    assert int(out["num_voxels"]) == 2
    total = int(np.sum(np.asarray(out["num_points_per_voxel"])))
    assert total == 2


def test_max_voxels_cap():
    rng = np.random.default_rng(2)
    pts = make_cloud(400, rng, pad_to=400)
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=10, max_voxels=8,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 400)
    assert int(out["num_voxels"]) == 8


def test_coords_zyx_order():
    pts = np.array([[2.6, 1.2, 3.5, 1.0]], np.float32)
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=2, max_voxels=4,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 1)
    # cell = (x=5, y=2, z=3), stored as (z, y, x)
    np.testing.assert_array_equal(np.asarray(out["coords"])[0], [3, 2, 5])


def test_reflectance_capping_keeps_top_points():
    # 6 points in one voxel, cap 3 -> the 3 highest reflectances survive
    pts = np.zeros((6, 4), np.float32)
    pts[:, :3] = [0.2, 0.2, 0.5]
    pts[:, 3] = [1, 9, 3, 7, 5, 8]
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=3, max_voxels=4,
                   reflectance_sampling=True)
    out = vx(jnp.asarray(pts), 6)
    kept = sorted(np.asarray(out["voxels"])[0, :3, 3].tolist())
    assert kept == [7.0, 8.0, 9.0]


def test_shuffle_path_no_reflectance_priority():
    """The non-reflectance path keys insertion order on a PRNG, matching
    the reference's pre-shuffle semantics (ops/ops_numba.py:190)."""
    import jax

    pts = np.zeros((6, 4), np.float32)
    pts[:, :3] = [0.2, 0.2, 0.5]
    pts[:, 3] = [1, 9, 3, 7, 5, 8]
    vx = Voxelizer(VOXEL_SIZE, PC_RANGE, max_voxel_points=3, max_voxels=4,
                   reflectance_sampling=False)
    out1 = vx(jnp.asarray(pts), 6, shuffle_key=jax.random.PRNGKey(0))
    out2 = vx(jnp.asarray(pts), 6, shuffle_key=jax.random.PRNGKey(0))
    out3 = vx(jnp.asarray(pts), 6, shuffle_key=jax.random.PRNGKey(5))
    k1 = sorted(np.asarray(out1["voxels"])[0, :3, 3].tolist())
    k2 = sorted(np.asarray(out2["voxels"])[0, :3, 3].tolist())
    k3 = sorted(np.asarray(out3["voxels"])[0, :3, 3].tolist())
    assert k1 == k2  # same key -> same sample
    # counts/coords identical regardless of sampling order
    np.testing.assert_array_equal(np.asarray(out1["num_points_per_voxel"]),
                                  np.asarray(out3["num_points_per_voxel"]))
    assert len(k3) == 3
