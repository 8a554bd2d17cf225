"""Coverage for auxiliary modules: MLP filter, paddings indicators,
foreground filter round-trip, masked batch norm statistics."""

import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models.layers import (  # noqa: E402
    MLP,
    MaskedBatchNorm,
    get_paddings_indicator,
    get_paddings_indicator_np,
)
from objectdetection_3d_tpu.models.preprocess_tools import (  # noqa: E402
    ForegroundFilter,
)


def test_paddings_indicator():
    counts = jnp.asarray([0, 2, 5])
    mask = np.asarray(get_paddings_indicator(counts, 4))
    want = np.array([[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(mask, want)
    np.testing.assert_array_equal(
        get_paddings_indicator_np(np.asarray([0, 2, 5]), 4), want)


def test_mlp_shapes_and_range():
    mlp = MLP(input_channels=37)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (16, 37)),
                    jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=False)
    out = mlp.apply(variables, x, train=False)
    assert out.shape == (16, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_foreground_filter_mlp_roundtrip(tmp_path):
    mlp = MLP(input_channels=37)
    x = jnp.zeros((4, 37), jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=False)
    path = tmp_path / "mlp.pkl"
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(variables), f)

    ff = ForegroundFilter({
        "path": str(tmp_path) + "/",
        "filter_type": "mlp",
        "mlp": {"trunk_confidence": 0.5, "input_channels": 37},
    })
    feats = np.random.default_rng(1).normal(0, 1, (32, 37)).astype(
        np.float32)
    mask = ff.evaluate(feats)
    assert mask.shape == (32,)
    assert mask.dtype == np.uint8


def test_foreground_filter_validates_threshold(tmp_path):
    with pytest.raises(AssertionError):
        ForegroundFilter({
            "path": str(tmp_path) + "/", "filter_type": "mlp",
            "mlp": {"trunk_confidence": 1.5},
        })


def test_masked_batch_norm_matches_torch_semantics():
    """Masked BN over active rows == torch BatchNorm1d over those rows."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, (64, 8)).astype(np.float32)
    mask = rng.uniform(size=64) > 0.3

    bn = MaskedBatchNorm(eps=1e-3, momentum=0.01)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask)[:, None], True)
    out, mutated = bn.apply(variables, jnp.asarray(x),
                            jnp.asarray(mask)[:, None], True,
                            mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(8, eps=1e-3, momentum=0.01)
    tout = tbn(torch.tensor(x[mask]))
    np.testing.assert_allclose(np.asarray(out)[mask],
                               tout.detach().numpy(), atol=1e-4)
    # inactive rows stay exactly zero
    assert np.all(np.asarray(out)[~mask] == 0)
    # running stats follow torch's update rule
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-4)


def test_device_augmentation_consistency():
    """Rotating/scaling/flipping on device keeps points inside their GT
    boxes (points and boxes transform together)."""
    from objectdetection_3d_tpu.augment.device_ops import (
        augment_batch, parse_device_augment_cfg)
    from objectdetection_3d_tpu.ops.boxes import points_in_boxes

    rng = np.random.default_rng(0)
    b, p, g = 2, 256, 2
    boxes = np.zeros((b, g, 9), np.float32)
    points = np.zeros((b, p, 4), np.float32)
    for i in range(b):
        for j in range(g):
            c = rng.uniform(2, 6, 2)
            boxes[i, j] = [c[0], c[1], 0.0, 1.0, 1.0, 2.0, 0, 0,
                           rng.uniform(-3, 3)]
            k = p // g
            local = rng.uniform([-0.45, -0.45, 0.05],
                                [0.45, 0.45, 1.95], (k, 3))
            yaw = boxes[i, j, 8]
            rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                            [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
            pts = local @ rot.T + [c[0], c[1], 0.0]
            points[i, j * k:(j + 1) * k, :3] = pts
            points[i, j * k:(j + 1) * k, 3] = rng.uniform(0, 1, k)

    batch = {
        "points": jnp.asarray(points),
        "num_points": jnp.full((b,), p, jnp.int32),
        "bboxes": jnp.asarray(boxes),
        "labels": jnp.zeros((b, g), jnp.int32),
        "gt_mask": jnp.ones((b, g), bool),
    }
    cfg = parse_device_augment_cfg({
        "rotate": {"min": 0.0, "max": 6.283}, "scale": {},
        "flip_x": True, "flip_y": True, "translate": {"std": 0.5}})
    out = augment_batch(batch, jax.random.PRNGKey(3), cfg)

    for i in range(b):
        inside_before = np.asarray(points_in_boxes(
            jnp.asarray(points[i]), jnp.asarray(boxes[i]))).any(-1).mean()
        inside_after = np.asarray(points_in_boxes(
            out["points"][i], out["bboxes"][i])).any(-1).mean()
        # membership is preserved (tiny boundary tolerance)
        assert inside_after >= inside_before - 0.02, (inside_before,
                                                      inside_after)
    # shapes unchanged and padding intact
    assert out["points"].shape == batch["points"].shape
    assert out["bboxes"].shape == batch["bboxes"].shape
