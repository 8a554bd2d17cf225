"""ObjectSample augmentation: GT database build + paste semantics."""

import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.augment.augmentation import (  # noqa: E402
    ObjdetAugmentation,
)
from objectdetection_3d_tpu.augment.gt_database import (  # noqa: E402
    build_gt_database,
    load_gt_database,
)
from objectdetection_3d_tpu.dataset import Forest3D  # noqa: E402
from objectdetection_3d_tpu.ops.boxes import (  # noqa: E402
    box_collision_test,
    points_in_boxes,
)
from tests.test_dataset import write_cloud  # noqa: E402


@pytest.fixture
def forest(tmp_path):
    for split in ("training", "validation", "testing"):
        d = tmp_path / split
        d.mkdir()
        for i in range(3):
            write_cloud(d, f"{split}_{i}", n_points=800, n_boxes=3,
                        seed=10 * i + len(split))
    return tmp_path


def test_build_gt_database(forest, tmp_path):
    ds = Forest3D(str(forest), name="synthetic", seed=0)
    db_path = str(tmp_path / "gtdb.pkl")
    db = build_gt_database(ds.get_split("training"), db_path,
                           min_points=1, log=lambda *a: None)
    loaded = load_gt_database(db_path)
    assert set(loaded) == set(db)
    entries = loaded[0]
    assert len(entries) >= 3  # 3 clouds x 3 boxes, minus low-point crops
    for e in entries:
        assert e["bbox"].shape == (9,)
        assert e["points_inside_box"].ndim == 2
        # crop really is interior to its box
        import jax.numpy as jnp
        if len(e["points_inside_box"]):
            inside = np.asarray(points_in_boxes(
                jnp.asarray(e["points_inside_box"][:, :3]),
                jnp.asarray(e["bbox"][None])))
            assert inside.all()


def _scene(seed=3):
    rng = np.random.default_rng(seed)
    pts = np.zeros((600, 4), np.float32)
    pts[:, :2] = rng.uniform(0, 8, (600, 2))
    pts[:, 2] = rng.uniform(0, 3, 600)
    boxes = np.array([[4.0, 4.0, 0.0, 0.8, 0.8, 2.0, 0, 0, 0.3]],
                     np.float32)
    return {"point": pts, "bboxes": boxes,
            "labels": np.zeros(1, np.int64)}


def test_object_sample_pastes_objects(forest, tmp_path):
    ds = Forest3D(str(forest), name="synthetic", seed=0)
    db_path = str(tmp_path / "gtdb.pkl")
    build_gt_database(ds.get_split("training"), db_path, min_points=1,
                      log=lambda *a: None)

    aug = ObjdetAugmentation({"ObjectSample": {
        "db_path": db_path, "sample_dict": {0: 5},
    }}, seed=0)
    data = aug.augment(_scene(), attr={}, seed=11)

    n_boxes = len(data["bboxes"])
    assert 1 < n_boxes <= 5
    assert len(data["labels"]) == n_boxes

    import jax.numpy as jnp
    bx = jnp.asarray(np.asarray(data["bboxes"], np.float32))
    # pasted boxes collide with nothing (BEV envelopes)
    coll = np.array(box_collision_test(bx, bx))
    np.fill_diagonal(coll, False)
    assert not coll[1:].any()
    # each pasted box contains points
    inside = np.asarray(points_in_boxes(
        jnp.asarray(data["point"][:, :3]), bx))
    assert (inside.sum(axis=0)[1:] > 0).all()


def test_object_sample_reproducible(forest, tmp_path):
    ds = Forest3D(str(forest), name="synthetic", seed=0)
    db_path = str(tmp_path / "gtdb.pkl")
    build_gt_database(ds.get_split("training"), db_path, min_points=1,
                      log=lambda *a: None)
    cfg = {"ObjectSample": {"db_path": db_path, "sample_dict": {0: 4}}}

    outs = []
    for _ in range(2):
        aug = ObjdetAugmentation(cfg, seed=0)
        outs.append(aug.augment(_scene(), attr={}, seed=42))
    np.testing.assert_array_equal(outs[0]["point"], outs[1]["point"])
    np.testing.assert_array_equal(outs[0]["bboxes"], outs[1]["bboxes"])


def test_object_sample_respects_existing_count(forest, tmp_path):
    """A scene already at the target count gets nothing pasted."""
    ds = Forest3D(str(forest), name="synthetic", seed=0)
    db_path = str(tmp_path / "gtdb.pkl")
    build_gt_database(ds.get_split("training"), db_path, min_points=1,
                      log=lambda *a: None)
    aug = ObjdetAugmentation({"ObjectSample": {
        "db_path": db_path, "sample_dict": {0: 1},
    }}, seed=0)
    scene = _scene()
    out = aug.augment(dict(scene), attr={}, seed=1)
    np.testing.assert_array_equal(out["bboxes"], scene["bboxes"])
