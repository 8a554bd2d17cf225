import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.models.preprocess_tools import (  # noqa: E402
    CustomVoxelizer,
    Featurizer,
    estimate_normals,
)
from objectdetection_3d_tpu.ops.sampling import (  # noqa: E402
    get_semantic_label,
    remove_points_in_boxes,
    sample_class,
)


def test_custom_voxelizer_passthrough_low_density():
    vx = CustomVoxelizer(voxel_size=[0.03, 0.03, 0.03], max_voxel_points=15,
                         reflectance_sampling=True)
    pts = np.random.default_rng(0).uniform(0, 10, (1000, 4)).astype(
        np.float32)
    out = vx.voxelize(pts)
    assert out.shape == pts.shape  # density ~1 pt/m3 -> untouched


def test_custom_voxelizer_downsamples_dense_cloud():
    rng = np.random.default_rng(1)
    # 60k points in 1 m^3 -> density >> 10
    pts = rng.uniform(0, 1, (60_000, 4)).astype(np.float32)
    vx = CustomVoxelizer(voxel_size=[0.2, 0.2, 0.2], max_voxel_points=15,
                         reflectance_sampling=True)
    out = vx.voxelize(pts)
    assert out.shape[1] == 5  # centroid features + count column
    assert out.shape[0] <= 6 * 6 * 6
    assert np.all(out[:, 4] >= 1)


def test_estimate_normals_on_plane():
    rng = np.random.default_rng(2)
    pts = np.zeros((500, 3))
    pts[:, :2] = rng.uniform(0, 2, (500, 2))
    normals = estimate_normals(pts, radius=0.5, max_nn=20)
    # plane z=0 -> normals ~ +-z, oriented +z
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)


def test_featurizer_output_shape():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1.0, (300, 4))
    f = Featurizer(normal_rad=0.4, normal_max_nn=20, fpfh_rad=0.4,
                   fpfh_max_nn=20)
    out = f.generate_features(pts)
    assert out.shape == (300, 4 + 3 + 33)
    assert np.all(np.isfinite(out))


def test_get_semantic_label():
    box = np.array([[2.0, 2.0, 0.0, 1.0, 1.0, 4.0, 0, 0, 0]], np.float32)
    pts = np.array([
        [2.0, 2.0, 0.05],   # inside, below ground level
        [2.0, 2.0, 2.0],    # trunk
        [2.0, 2.0, 3.9],    # inside, above effective trunk -> noise
        [9.0, 9.0, 1.0],    # outside
    ], np.float32)
    lab = np.asarray(get_semantic_label(pts, box, ground_level=0.2,
                                        effective_trunk=0.8))
    np.testing.assert_array_equal(lab, [0, 1, -1, 0])


def test_remove_points_in_boxes():
    box = np.array([[2.0, 2.0, 0.0, 1.0, 1.0, 2.0, 0, 0, 0]], np.float32)
    pts = np.array([[2.0, 2.0, 1.0, 0.5], [8.0, 8.0, 1.0, 0.5]], np.float32)
    out = remove_points_in_boxes(pts, box)
    assert out.shape[0] == 1
    np.testing.assert_allclose(out[0, :2], [8.0, 8.0])


def test_sample_class_collision_filtering():
    gt = [[2.0, 2.0, 0.0, 1.0, 1.0, 2.0, 0, 0, 0]]
    db = [
        {"bbox": [2.2, 2.0, 0.0, 1.0, 1.0, 2.0, 0, 0, 0], "name": "hit"},
        {"bbox": [6.0, 6.0, 0.0, 1.0, 1.0, 2.0, 0, 0, 0], "name": "free"},
    ]
    out = sample_class(2, gt, db)
    names = {s["name"] for s in out}
    assert "free" in names and "hit" not in names
