"""Native C++ preprocessing: build, parity with numpy path, throughput."""

import numpy as np
import pytest

from objectdetection_3d_tpu import native
from objectdetection_3d_tpu.augment.numpy_ops import global_outlier_check


def numpy_reference(points, input_features, pcr):
    filtered = global_outlier_check(points)
    mn, mx = np.array(pcr[:3]), np.array(pcr[3:])
    filtered = filtered[np.all(
        (filtered[:, :3] >= mn) & (filtered[:, :3] < mx), axis=-1)]
    return filtered[:, input_features]


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library could not be built")
    return native.load()


def test_parity_with_numpy(lib):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 10, (50_000, 5)).astype(np.float32)
    # inject far outliers
    pts[:20, :3] = 1e4
    pcr = (0.0, 0.0, 0.0, 8.0, 8.0, 8.0)
    feats = [0, 1, 2, 3]

    got = native.preprocess_cloud(pts, feats, pcr)
    want = numpy_reference(pts, feats, pcr)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_order_preserved(lib):
    pts = np.array([[1, 1, 1, 9], [2, 2, 2, 8], [3, 3, 3, 7]], np.float32)
    out = native.preprocess_cloud(pts, [0, 1, 2, 3],
                                  (0, 0, 0, 8, 8, 8))
    np.testing.assert_allclose(out[:, 3], [9, 8, 7])


def test_max_points_cap(lib):
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 4, (1000, 4)).astype(np.float32)
    out = native.preprocess_cloud(pts, [0, 1, 2, 3], (0, 0, 0, 8, 8, 8),
                                  max_points=100)
    assert out.shape[0] == 100


def test_empty_result(lib):
    pts = np.full((100, 4), 50.0, np.float32)  # all out of range
    out = native.preprocess_cloud(pts, [0, 1, 2, 3], (0, 0, 0, 8, 8, 8))
    assert out.shape[0] == 0


def test_speed_vs_numpy(lib):
    import time

    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 40, (2_000_000, 4)).astype(np.float32)
    pcr = (0.0, 0.0, 0.0, 40.0, 40.0, 40.0)

    t0 = time.time()
    native.preprocess_cloud(pts, [0, 1, 2, 3], pcr)
    t_native = time.time() - t0
    t0 = time.time()
    numpy_reference(pts, [0, 1, 2, 3], pcr)
    t_numpy = time.time() - t0
    # native should never be dramatically slower than numpy
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)
