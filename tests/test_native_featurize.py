"""Native C++ featurizer (normals + FPFH-33) vs the numpy oracle.

The numpy path in models/preprocess_tools.py is itself oracle-shaped
(straight transcription of the math, reference model/utils.py:73-90 via
open3d); the native library must reproduce it: same radius-bounded kNN
neighborhoods, same PCA normals (up to the z>=0 flip convention), same
Darboux histograms and distance-weighted combine.
"""

import numpy as np
import pytest

from objectdetection_3d_tpu import native
from objectdetection_3d_tpu.models.preprocess_tools import (
    Featurizer,
    compute_fpfh,
    estimate_normals,
)

pytestmark = pytest.mark.skipif(not native.featurize_available(),
                                reason="native featurizer not built")


def _cloud(n=400, seed=0):
    rng = np.random.default_rng(seed)
    # structured surfaces (a plane + a cylinder) so normals are
    # well-conditioned, plus scattered noise
    plane = np.stack([rng.uniform(0, 4, n // 2), rng.uniform(0, 4, n // 2),
                      0.02 * rng.standard_normal(n // 2)], -1)
    ang = rng.uniform(0, 2 * np.pi, n // 4)
    cyl = np.stack([2 + 0.5 * np.cos(ang), 2 + 0.5 * np.sin(ang),
                    rng.uniform(0, 2, n // 4)], -1)
    cyl += 0.01 * rng.standard_normal(cyl.shape)
    noise = rng.uniform([0, 0, 0], [4, 4, 2], (n - n // 2 - n // 4, 3))
    return np.concatenate([plane, cyl, noise]).astype(np.float64)


def test_normals_match_numpy():
    pts = _cloud()
    ref = estimate_normals(pts, radius=0.5, max_nn=16)
    normals, _ = native.featurize_cloud(pts, 0.5, 16, 0.8, 24)
    # PCA eigenvector up to sign, but only where it is well-defined: a
    # neighborhood of < 3 points has a rank-deficient covariance whose
    # smallest eigenvector is an arbitrary basis of the null space
    # (numpy eigh and the native Jacobi legitimately pick different
    # ones), so restrict to >= 4-point neighborhoods
    from objectdetection_3d_tpu.models.preprocess_tools import _knn_radius

    _, valid = _knn_radius(pts, 0.5, 16)
    ok = valid.sum(axis=1) >= 4
    assert ok.sum() > 200
    dots = np.abs(np.einsum("nk,nk->n", ref, normals))[ok]
    assert (dots > 0.999).mean() > 0.98, np.sort(dots)[:5]
    strong_z = ok & (np.abs(ref[:, 2]) > 0.05)
    agree = np.einsum("nk,nk->n", ref, normals)[strong_z]
    assert (agree > 0.99).mean() > 0.97


def test_fpfh_matches_numpy_with_shared_normals():
    pts = _cloud(seed=1)
    normals = estimate_normals(pts, radius=0.5, max_nn=16)
    ref = compute_fpfh(pts, normals, radius=0.8, max_nn=24)
    _, fpfh = native.featurize_cloud(pts, 0.5, 16, 0.8, 24,
                                     normals=normals)
    # spfh accumulates in float32 natively; histogram masses are O(100)
    np.testing.assert_allclose(fpfh, ref, rtol=2e-4, atol=2e-3)


def test_featurizer_native_backend_end_to_end():
    pts = np.concatenate(
        [_cloud(seed=2), np.random.default_rng(3).uniform(0, 1, (400, 1))],
        axis=1).astype(np.float64)
    kw = dict(normal_rad=0.5, normal_max_nn=16, fpfh_rad=0.8,
              fpfh_max_nn=24)
    out_native = Featurizer(backend="native", **kw).generate_features(pts)
    out_numpy = Featurizer(backend="numpy", **kw).generate_features(pts)
    assert out_native.shape == out_numpy.shape == (pts.shape[0],
                                                   pts.shape[1] + 36)
    # input columns pass through untouched
    np.testing.assert_array_equal(out_native[:, :4], pts)
    # normals agree up to PCA sign on well-conditioned points; a
    # point's FPFH reads its neighbors' SPFH, and each SPFH reads THAT
    # point's neighbors' normals — a 2-hop dependency — so compare only
    # points whose 2-hop fpfh neighborhood agrees throughout
    from objectdetection_3d_tpu.models.preprocess_tools import _knn_radius

    n_nat, n_np = out_native[:, 4:7], out_numpy[:, 4:7]
    agree = np.einsum("nk,nk->n", n_nat, n_np) > 0.999
    assert agree.mean() > 0.9
    idx, valid = _knn_radius(pts[:, :3], 0.8, 24)
    hop1 = np.all(np.where(valid, agree[idx], True), axis=1) & agree
    hood_ok = np.all(np.where(valid, hop1[idx], True), axis=1) & hop1
    assert hood_ok.sum() > 100
    np.testing.assert_allclose(out_native[hood_ok][:, 7:],
                               out_numpy[hood_ok][:, 7:], rtol=0.05,
                               atol=1.5)


def test_isolated_points_do_not_crash():
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 100.0, 100.0],
                    [200.0, 0.0, 50.0]])
    normals, fpfh = native.featurize_cloud(pts, 0.5, 16, 0.8, 24)
    assert np.all(np.isfinite(normals)) and np.all(np.isfinite(fpfh))
    # no pairs in radius -> empty histograms
    np.testing.assert_array_equal(fpfh, 0.0)


def test_native_faster_than_numpy():
    """Best-of-3 with warmup: single-shot wall timings on the shared
    1-vCPU CI host jitter past the ~15% native/numpy gap at this size
    (observed one-off 0.85 vs 0.74 s inversion under suite load)."""
    import time

    pts = _cloud(n=20_000, seed=4)

    def t_native():
        t0 = time.time()
        native.featurize_cloud(pts, 0.3, 16, 0.5, 24)
        return time.time() - t0

    def t_numpy():
        t0 = time.time()
        normals = estimate_normals(pts, 0.3, 16)
        compute_fpfh(pts, normals, 0.5, 24)
        return time.time() - t0

    t_native(), t_numpy()  # warm (dlopen, allocator, caches)
    best_native = min(t_native() for _ in range(3))
    best_numpy = min(t_numpy() for _ in range(3))
    assert best_native < best_numpy, (best_native, best_numpy)
