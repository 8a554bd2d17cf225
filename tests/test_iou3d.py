import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.ops.iou3d import (  # noqa: E402
    intersection_volume_3d,
    iou3d,
    iou3d_aligned,
    iou3d_upper_bound,
)
from oracles import monte_carlo_iou3d  # noqa: E402
from test_boxes import random_boxes  # noqa: E402


def test_self_iou_is_one():
    rng = np.random.default_rng(0)
    bxs = jnp.asarray(random_boxes(8, rng))
    iou = np.asarray(iou3d(bxs, bxs))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)


def test_volume_of_self_intersection():
    rng = np.random.default_rng(1)
    bxs = random_boxes(8, rng)
    vols = np.asarray(intersection_volume_3d(jnp.asarray(bxs),
                                             jnp.asarray(bxs)))
    want = np.prod(bxs[:, 3:6], axis=1)
    np.testing.assert_allclose(np.diag(vols), want, rtol=1e-3)


def test_axis_aligned_exact():
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0, 0, 0]])
    b = jnp.array([
        [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0, 0, 0],   # shifted by (1,1,1)
        [5.0, 5.0, 5.0, 2.0, 2.0, 2.0, 0, 0, 0],   # disjoint
        [0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 0, 0, 0],   # fully contained
    ])
    iou = np.asarray(iou3d(a, b))[0]
    np.testing.assert_allclose(iou[0], 1.0 / 15.0, atol=1e-4)
    np.testing.assert_allclose(iou[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(iou[2], 1.0 / 8.0, atol=1e-4)


def test_yaw_rotation_invariance():
    # two boxes rotated together by the same yaw keep their IoU
    a = np.array([[0.0, 0.0, 0.0, 2.0, 1.0, 3.0, 0, 0, 0]])
    b = np.array([[0.5, 0.3, 0.2, 2.0, 1.5, 3.0, 0, 0, 0]])
    base = float(iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
    for yaw in (0.3, 1.2, -2.0):
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s], [s, c]])
        a2, b2 = a.copy(), b.copy()
        a2[0, :2] = a[0, :2] @ rot.T
        b2[0, :2] = b[0, :2] @ rot.T
        a2[0, 8] += yaw
        b2[0, 8] += yaw
        got = float(iou3d(jnp.asarray(a2), jnp.asarray(b2))[0, 0])
        np.testing.assert_allclose(got, base, atol=2e-3)


def test_45_degree_yaw_known_value():
    # unit square vs itself rotated 45 deg about common center:
    # intersection is a regular octagon, area 2*(sqrt(2)-1)
    a = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0, 0, 0]])
    b = a.copy()
    b[0, 8] = np.pi / 4
    inter_area = 2 * (np.sqrt(2) - 1)
    want = inter_area / (2 - inter_area)
    got = float(iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_full_rotation_vs_monte_carlo(seed):
    rng = np.random.default_rng(seed)
    a = random_boxes(1, rng)[0]
    b = a.copy()
    b[:3] += rng.uniform(-1.0, 1.0, 3)
    b[6:9] += rng.uniform(-0.4, 0.4, 3)
    got = float(iou3d(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    want = monte_carlo_iou3d(a, b, n=200_000, seed=seed)
    np.testing.assert_allclose(got, want, atol=0.01)


def test_upper_bound_dominates_exact():
    rng = np.random.default_rng(5)
    a = jnp.asarray(random_boxes(12, rng))
    b = jnp.asarray(random_boxes(12, rng))
    exact = np.asarray(iou3d(a, b))
    ub = np.asarray(iou3d_upper_bound(a, b))
    assert np.all(ub >= exact - 1e-4)


def test_row_chunking_matches():
    rng = np.random.default_rng(6)
    a = jnp.asarray(random_boxes(10, rng))
    b = jnp.asarray(random_boxes(7, rng))
    full = np.asarray(iou3d(a, b))
    chunked = np.asarray(iou3d(a, b, row_chunk=4))
    np.testing.assert_allclose(full, chunked, atol=1e-5)


def test_aligned_matches_pairwise_diag():
    rng = np.random.default_rng(7)
    a = jnp.asarray(random_boxes(6, rng))
    b = jnp.asarray(random_boxes(6, rng))
    aligned = np.asarray(iou3d_aligned(a, b))
    diag = np.diag(np.asarray(iou3d(a, b)))
    np.testing.assert_allclose(aligned, diag, atol=1e-5)


def test_degenerate_boxes_give_zero():
    a = jnp.zeros((2, 9))
    b = jnp.asarray(random_boxes(3, np.random.default_rng(8)))
    iou = np.asarray(iou3d(a, b))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_obb_intersect_matches_clipping():
    from objectdetection_3d_tpu.ops.iou3d import obb_intersect

    rng = np.random.default_rng(11)
    a = random_boxes(24, rng)
    b = random_boxes(24, rng)
    inter = np.asarray(obb_intersect(jnp.asarray(a), jnp.asarray(b)))
    vols = np.asarray(intersection_volume_3d(jnp.asarray(a),
                                             jnp.asarray(b)))
    # agreement away from grazing contact: volume clearly positive -> must
    # intersect; SAT says disjoint -> volume must be ~0
    assert np.all(inter[vols > 1e-4])
    assert np.all(vols[~inter] < 1e-3)


def test_obb_intersect_known_cases():
    from objectdetection_3d_tpu.ops.iou3d import obb_intersect

    a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0, 0, 0]])
    b = jnp.asarray([
        [1.0, 1, 1, 2, 2, 2, 0, 0, 0],     # overlapping
        [5.0, 0, 0, 2, 2, 2, 0, 0, 0],     # disjoint
        [2.5, 2.5, 0, 2, 2, 2, 0, 0, 0.7853981],  # rotated corner near
    ])
    got = np.asarray(obb_intersect(a, b))[0]
    assert bool(got[0]) is True
    assert bool(got[1]) is False
    # 45-deg rotated box at (2.5,2.5): its corner reaches (2.5-1.414, ...)
    # ~ (1.086, 1.086); A spans to (1,1) -> disjoint
    assert bool(got[2]) is False
