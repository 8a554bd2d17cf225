"""Forest dataset contract + loader padding tests on a synthetic fixture."""

import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.dataset import (  # noqa: E402
    DataLoader,
    Forest3D,
    PreprocessedDataset,
    StaticBatcher,
)


def write_cloud(directory, name, n_points=500, n_boxes=2, seed=0,
                offset=100.0):
    """Write a .npy pair following the reference disk contract:
    box z at CENTER, angles in DEGREES, cloud not at origin."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, :2] = rng.uniform(0, 8, (n_points, 2)) + offset
    pts[:, 2] = rng.uniform(0, 3, n_points) + offset
    pts[:, 3] = rng.uniform(0, 1, n_points)
    boxes = np.zeros((n_boxes, 9), np.float32)
    boxes[:, :2] = rng.uniform(1, 7, (n_boxes, 2)) + offset
    boxes[:, 2] = 1.0 + offset  # center z
    boxes[:, 3:6] = [0.8, 0.8, 2.0]
    boxes[:, 6:] = rng.uniform(-180, 180, (n_boxes, 3))  # degrees
    np.save(directory / f"{name}.npy", pts)
    np.save(directory / f"{name}_bbx.npy", boxes)
    return pts, boxes


@pytest.fixture
def forest_dir(tmp_path):
    for split in ("training", "validation", "testing"):
        d = tmp_path / split
        d.mkdir()
        for i in range(2):
            write_cloud(d, f"{split}_{i}", seed=hash(split) % 1000 + i)
    return tmp_path


def test_split_discovery(forest_dir):
    ds = Forest3D(str(forest_dir), name="synthetic", seed=0)
    assert len(ds.get_split("training")) == 2
    assert len(ds.get_split("validation")) == 2
    assert len(ds.get_split("testing")) == 2
    assert ds.get_label_to_names() == {0: "Tree"}


def test_disk_convention_fixups(tmp_path):
    d = tmp_path / "training"
    d.mkdir()
    (tmp_path / "validation").mkdir()
    (tmp_path / "testing").mkdir()
    pts, boxes_disk = write_cloud(d, "a", seed=1)
    ds = Forest3D(str(tmp_path), name="synthetic", seed=0)
    split = ds.get_split("training")
    data = split.get_data(0)

    # origin shift: cloud min corner at 0
    np.testing.assert_allclose(data["point"][:, :3].min(0), 0.0, atol=1e-5)
    # z moved from center to bottom, then shifted with the cloud
    shift = pts[:, :3].min(0)
    want_z = boxes_disk[0, 2] - boxes_disk[0, 5] / 2 - shift[2]
    got = data["bboxes"]
    row = np.argmin(np.abs(got[:, 2] - want_z))
    np.testing.assert_allclose(got[row, 2], want_z, atol=1e-4)
    # angles converted to radians
    assert np.all(np.abs(got[:, 6:]) <= np.pi + 1e-6)
    # labels all zero
    np.testing.assert_array_equal(data["labels"], 0)
    attr = split.get_attr(0)
    assert attr["split"] == "training" and attr["name"]


def test_static_batcher_padding(forest_dir):
    ds = Forest3D(str(forest_dir), name="synthetic", seed=0)
    split = PreprocessedDataset(dataset=ds.get_split("training"))
    batcher = StaticBatcher(max_points=1024, max_gt=4, num_features=4)
    loader = DataLoader(split, batcher, batch_size=2, prefetch=2)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b.points.shape == (2, 1024, 4)
    assert b.bboxes.shape == (2, 4, 9)
    assert b.arrays["gt_mask"].sum(axis=1).tolist() == [2, 2]
    assert len(b.attr) == 2
    # unpadded accessors give back the real boxes
    assert b.unpadded_boxes(0).shape == (2, 9)


def test_batcher_point_subsampling():
    batcher = StaticBatcher(max_points=64, max_gt=2, num_features=4)
    item = {"data": {"point": np.random.rand(200, 4).astype(np.float32),
                     "labels": np.zeros(1), "bboxes": np.zeros((1, 9))},
            "attr": {}}
    b = batcher.collate([item])
    assert b.arrays["num_points"][0] == 64


def test_short_batch_padding(forest_dir):
    ds = Forest3D(str(forest_dir), name="synthetic", seed=0)
    split = PreprocessedDataset(dataset=ds.get_split("training"))
    batcher = StaticBatcher(max_points=1024, max_gt=4, num_features=4)
    loader = DataLoader(split, batcher, batch_size=4, prefetch=0)
    (b,) = list(loader)
    assert b.points.shape[0] == 4
    assert b.pad_flags == [False, False, True, True]
    assert b.arrays["item_valid"].tolist() == [True, True, False, False]


def test_padded_items_excluded_from_loss():
    """Loss of (real batch padded with a repeat) == loss of the real batch
    alone: padded items carry zero weight."""
    import jax
    import jax.numpy as jnp
    from objectdetection_3d_tpu.models import PointPillars
    from tiny import tiny_batch, tiny_model_cfg

    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))

    b1 = {k: jnp.asarray(v) for k, v in tiny_batch(batch_size=1,
                                                   seed=5).items()}
    losses1 = model.loss(model.apply(variables, b1, train=False)[0], b1)

    # pad to batch 2 with a repeat of the item flagged invalid
    b2 = {k: jnp.concatenate([v, v], axis=0) for k, v in b1.items()}
    b2["item_valid"] = jnp.array([True, False])
    losses2 = model.loss(model.apply(variables, b2, train=False)[0], b2)

    for k in losses1:
        np.testing.assert_allclose(float(losses2[k]), float(losses1[k]),
                                   rtol=1e-5, atol=1e-6)


def _augmenting_preprocess(data, attr, rng=None):
    """Test double: rng-dependent jitter so worker scheduling shows up."""
    rng = rng if rng is not None else np.random.default_rng(0)
    pts = np.asarray(data["point"], np.float32)
    out = dict(data)
    out["point"] = pts + rng.standard_normal(pts.shape).astype(np.float32)
    return out


def _collect(forest_dir, num_workers, epoch=0, batch_size=2):
    # pin the split-shuffle seed: each _collect builds a fresh dataset and
    # an unseeded one reshuffles the file list differently per instance
    ds = Forest3D(dataset_path=str(forest_dir), name="Forest3D", seed=123)
    split = PreprocessedDataset(dataset=ds.get_split("training"),
                                preprocess=_augmenting_preprocess, seed=7)
    split.set_epoch(epoch)
    batcher = StaticBatcher(max_points=1024, max_gt=4, num_features=4)
    loader = DataLoader(split, batcher, batch_size=batch_size, prefetch=2,
                        num_workers=num_workers)
    return [b.arrays["points"].copy() for b in loader]


def test_pooled_loader_matches_serial(forest_dir):
    """num_workers>1 must produce byte-identical batches (per-item seeded
    RNG makes augmentation independent of worker scheduling)."""
    serial = _collect(forest_dir, num_workers=0)
    pooled = _collect(forest_dir, num_workers=4)
    assert len(serial) == len(pooled)
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a, b)


def test_pooled_loader_epoch_changes_stream(forest_dir):
    e0 = _collect(forest_dir, num_workers=4, epoch=0)
    e1 = _collect(forest_dir, num_workers=4, epoch=1)
    assert any((a != b).any() for a, b in zip(e0, e1))


def test_pooled_loader_batch_size_one(forest_dir):
    """Cross-batch parallelism path: items stay in flight across batches."""
    serial = _collect(forest_dir, num_workers=0, batch_size=1)
    pooled = _collect(forest_dir, num_workers=3, batch_size=1)
    assert len(serial) == len(pooled) == 2
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a, b)
