import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.ops import boxes as B  # noqa: E402
from oracles import box_corners_np, point_in_box_np  # noqa: E402


def random_boxes(n, rng, full_rot=True):
    out = np.zeros((n, 9), np.float64)
    out[:, :2] = rng.uniform(0, 40, (n, 2))
    out[:, 2] = rng.uniform(0, 5, n)
    out[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    if full_rot:
        out[:, 6:8] = rng.uniform(-0.5, 0.5, (n, 2))
        out[:, 8] = rng.uniform(-np.pi, np.pi, n)
    return out


def test_corners_match_oracle():
    rng = np.random.default_rng(0)
    bxs = random_boxes(32, rng)
    got = np.asarray(B.box_corners_3d(jnp.asarray(bxs)))
    want = np.stack([box_corners_np(b) for b in bxs])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_corners_unrotated_span():
    box = jnp.array([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0, 0.0, 0.0]])
    c = np.asarray(B.box_corners_3d(box))[0]
    np.testing.assert_allclose(c.min(0), [0.0, 0.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(c.max(0), [2.0, 4.0, 9.0], atol=1e-6)


def test_rotated_envelope():
    rng = np.random.default_rng(1)
    bxs = random_boxes(16, rng)
    env = np.asarray(B.rotated_corners_2d_envelope(jnp.asarray(bxs)))
    corners = np.stack([box_corners_np(b) for b in bxs])
    np.testing.assert_allclose(env[:, :2], corners[..., :2].min(1), atol=1e-4)
    np.testing.assert_allclose(env[:, 2:], corners[..., :2].max(1), atol=1e-4)


def test_iou_aabb_2d_basic():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [5.0, 5.0, 6.0, 6.0],
                   [0.0, 0.0, 2.0, 2.0]])
    iou = np.asarray(B.iou_aabb_2d(a, b))[0]
    np.testing.assert_allclose(iou, [1.0 / 7.0, 0.0, 1.0], atol=1e-6)


def test_iou_aabb_2d_modes():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    iof = float(B.iou_aabb_2d(a, b, mode="iof")[0, 0])
    np.testing.assert_allclose(iof, 0.25, atol=1e-6)
    giou = float(B.iou_aabb_2d(a, b, mode="giou")[0, 0])
    # giou = iou - (enclose - union)/enclose = 1/7 - (9-7)/9
    np.testing.assert_allclose(giou, 1 / 7 - 2 / 9, atol=1e-6)


def test_limit_period():
    vals = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 7.3])
    got = np.asarray(B.limit_period(vals, 0.5, np.pi))
    want = np.asarray(vals) - np.floor(np.asarray(vals) / np.pi + 0.5) * np.pi
    np.testing.assert_allclose(got, want, atol=1e-6)
    tol = 1e-5  # f32 boundary rounding
    assert np.all(got >= -np.pi / 2 - tol) and np.all(got < np.pi / 2 + tol)
    # the 0-offset 2*pi variant used for direction targets
    got2 = np.asarray(B.limit_period(vals, 0.0, 2 * np.pi))
    assert np.all(got2 >= -tol) and np.all(got2 < 2 * np.pi + tol)


def test_points_in_boxes_matches_oracle():
    rng = np.random.default_rng(2)
    bxs = random_boxes(5, rng)
    pts = rng.uniform(-5, 45, (256, 3))
    got = np.asarray(B.points_in_boxes(jnp.asarray(pts), jnp.asarray(bxs)))
    want = np.array([[point_in_box_np(p, b) for b in bxs] for p in pts])
    # boundary-grazing points may differ under f32; allow a tiny mismatch
    assert np.mean(got == want) > 0.999


def test_get_min_bbox():
    rng = np.random.default_rng(3)
    # points uniform in a yaw-rotated box
    yaw = 0.7
    local = rng.uniform([-1, -2, 0], [1, 2, 4], (500, 3))
    rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    pts = local @ rot.T + np.array([5.0, 6.0, 1.0])
    box = np.asarray(B.get_min_bbox(jnp.asarray(pts)))
    np.testing.assert_allclose(box[:3], [5, 6, 3], atol=0.2)
    np.testing.assert_allclose(np.sort(box[3:5]), [2, 4], rtol=0.1)
    np.testing.assert_allclose(box[5], 4, rtol=0.1)


def test_box_planes_contain_center():
    rng = np.random.default_rng(4)
    bxs = jnp.asarray(random_boxes(8, rng))
    normals, offsets = B.box_planes(bxs)
    _, mid = B.box_axes(bxs)
    slack = np.asarray(
        jnp.einsum("nik,nk->ni", normals, mid) - offsets)
    assert np.all(slack < 0)  # mid strictly inside all half-spaces


# ---------------------------------------------------------------------------
# Host-side validators (reference ops/ops_torch.py:610-690)
# ---------------------------------------------------------------------------
class TestHostValidators:
    def test_valid_boxes_pass(self):
        rng = np.random.default_rng(7)
        B.validate_boxes(random_boxes(16, rng))

    def test_empty_passes(self):
        B.validate_boxes(np.zeros((0, 9)))

    def test_zero_dim_raises_with_position(self):
        rng = np.random.default_rng(8)
        bxs = random_boxes(4, rng)
        bxs[2, 4] = 0.0
        with pytest.raises(ValueError, match=r"zero areas.*\[2\]"):
            B.validate_boxes(bxs)

    def test_nonfinite_raises(self):
        rng = np.random.default_rng(9)
        bxs = random_boxes(3, rng)
        bxs[1, 0] = np.nan
        with pytest.raises(ValueError, match=r"non-finite.*\[1\]"):
            B.validate_boxes(bxs)

    def test_check_coplanar_flags_warped_corners(self):
        rng = np.random.default_rng(10)
        corners = np.stack([box_corners_np(b)
                            for b in random_boxes(3, rng)])
        B.check_coplanar(corners)
        corners[1, 0, 2] += 0.5  # pull one vertex off its faces
        with pytest.raises(ValueError, match=r"not coplanar.*\[1\]"):
            B.check_coplanar(corners)

    def test_check_nonzero_flags_collapsed_face(self):
        rng = np.random.default_rng(11)
        corners = np.stack([box_corners_np(b)
                            for b in random_boxes(2, rng)])
        B.check_nonzero(corners)
        corners[0, 1] = corners[0, 0]  # zero-area triangles on face 0
        with pytest.raises(ValueError, match=r"zero areas.*\[0\]"):
            B.check_nonzero(corners)

    def test_metric_evaluator_validate_flag(self):
        from objectdetection_3d_tpu.metrics import MetricEvaluator

        rng = np.random.default_rng(12)
        good = random_boxes(2, rng).astype(np.float32)
        bad = good.copy()
        bad[0, 5] = 0.0
        me = MetricEvaluator(eval_dim=3)
        pred = [{"bbox": bad, "label": np.zeros(2), "score": np.ones(2)}]
        target = [{"bbox": good, "label": np.zeros(2)}]
        with pytest.raises(ValueError, match="zero areas"):
            me.evaluate(pred, target, [0], [0.1], validate=True)
        # same call without the flag keeps the jit-style padding-safe path
        me.evaluate(pred, target, [0], [0.1])
