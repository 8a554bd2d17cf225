"""Tiled large-scene inference: tiling geometry + cross-tile NMS merge."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.pipeline.tiled_inference import (  # noqa: E402
    TiledInference,
)
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


@pytest.fixture(scope="module")
def trained():
    """Overfit the tiny model on one batch so it emits real detections."""
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        batch_size=2, seed=7).items()}
    tx = model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    step = model.make_train_step(tx, donate=False)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    for _ in range(60):
        state, losses = step(state, batch)
    return model, {"params": state["params"],
                   "batch_stats": state["batch_stats"]}, batch


def test_tile_origins_cover_scene(trained):
    model, variables, _ = trained
    ti = TiledInference(model, variables, overlap=2.0,
                        max_merge_boxes=64)
    origins = ti._tile_origins(0.0, 20.0, 8.0, 2.0)
    # every coordinate in [0, 20] is covered by some [o, o+8] tile
    for x in np.linspace(0, 19.99, 50):
        assert np.any((origins <= x) & (x < origins + 8.0)), x
    # small scene -> single tile
    assert len(ti._tile_origins(0.0, 5.0, 8.0, 2.0)) == 1


def test_device_crop_matches_numpy_filter(trained):
    """The jitted window crop = the plain numpy in-window filter (same
    rows, local coordinates), padding zeroed, count exact."""
    model, variables, _ = trained
    ti = TiledInference(model, variables, overlap=2.0, max_merge_boxes=64)
    rng = np.random.default_rng(3)
    # spread chosen so the window holds ~70 of the 500 points (enough to
    # exercise the truncation case below)
    scene = np.concatenate(
        [rng.uniform(0, 12, (500, 3)).astype(np.float32),
         rng.uniform(0, 1, (500, 1)).astype(np.float32)], axis=1)
    pcr = np.asarray(model.point_cloud_range, np.float32)
    shift = np.array([4.0, 6.0, 0.0], np.float32)
    max_pts = 256

    got_pts, got_n = jax.jit(
        ti._crop_device, static_argnames=("max_pts",))(
        jnp.asarray(scene), jnp.asarray(shift),
        jnp.asarray(pcr[:3]), jnp.asarray(pcr[3:]), max_pts=max_pts)
    got_pts, got_n = np.asarray(got_pts), int(got_n)

    sel = np.all((scene[:, :3] >= pcr[:3] + shift)
                 & (scene[:, :3] < pcr[3:] + shift), axis=1)
    want = scene[sel].copy()
    want[:, :3] -= shift
    assert got_n == len(want)
    # scatter preserves scene order among selected rows
    np.testing.assert_allclose(got_pts[:got_n], want, rtol=1e-6)
    assert not np.any(got_pts[got_n:])

    # truncation keeps max_pts in-window rows (a subset of `want`)
    small = 8
    tp, tn = jax.jit(ti._crop_device, static_argnames=("max_pts",))(
        jnp.asarray(scene), jnp.asarray(shift),
        jnp.asarray(pcr[:3]), jnp.asarray(pcr[3:]), max_pts=small)
    tp, tn = np.asarray(tp), int(tn)
    assert tn == small
    want_set = {tuple(np.round(r, 5)) for r in want}
    for r in tp[:tn]:
        assert tuple(np.round(r, 5)) in want_set


@pytest.mark.parametrize("device_crop", [True, False])
def test_large_scene_detections_in_scene_frame(trained, device_crop):
    model, variables, batch = trained
    predict = model.make_predict_fn()
    base = predict(variables, batch)
    if not bool(np.asarray(base["valid"]).any()):
        pytest.skip("tiny model did not converge to emitting detections")

    # build a 16x8 scene: the training cloud plus a shifted copy
    pts = np.asarray(batch["points"][0][: int(batch["num_points"][0])])
    shifted = pts.copy()
    shifted[:, 0] += 8.0
    scene = np.concatenate([pts, shifted]) + [30.0, 10.0, 5.0, 0.0]

    ti = TiledInference(model, variables, overlap=2.0, predict_fn=predict,
                        max_merge_boxes=64, device_crop=device_crop)
    dets = ti(scene)
    assert len(dets) > 0
    boxes = np.stack([d["bbox"] for d in dets])
    # detections must land inside the scene bounding range
    assert np.all(boxes[:, 0] >= 29.0) and np.all(boxes[:, 0] <= 47.0)
    assert np.all(boxes[:, 1] >= 9.0) and np.all(boxes[:, 1] <= 19.0)
    # the weakly-trained tiny model is stochastic about exact counts; the
    # invariant is that tiling found at least something and merged cleanly
    assert len(dets) >= 1


def test_merge_suppresses_duplicates(trained):
    model, variables, batch = trained
    ti = TiledInference(model, variables, overlap=2.0,
                        max_merge_boxes=64)
    # two identical boxes from overlapping tiles -> one survivor
    box = np.array([3.0, 3.0, 0.2, 0.8, 0.8, 2.5, 0, 0, 0.3], np.float32)
    n = ti.max_merge_boxes
    pb = np.zeros((n, 9), np.float32)
    pb[0] = box
    pb[1] = box
    ps = np.zeros((n,), np.float32)
    ps[:2] = [0.9, 0.8]
    pl = np.zeros((n,), np.int32)
    pv = np.arange(n) < 2
    keep = np.asarray(ti._merge(jnp.asarray(pb), jnp.asarray(ps),
                                jnp.asarray(pl), jnp.asarray(pv)))
    assert keep[0] and not keep[1]


def test_tiled_inference_shards_tiles_across_mesh(trained):
    """The scale-out hook: batch_tiles=8 tiles ride a data-parallel mesh
    predict (SURVEY §2.9 spatial scale-out), and the merged detections
    match the single-device tiling of the same scene."""
    from objectdetection_3d_tpu.parallel import (
        make_mesh,
        make_sharded_predict_fn,
    )

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")

    model, variables, batch = trained
    predict = model.make_predict_fn()
    base = predict(variables, batch)
    if not bool(np.asarray(base["valid"]).any()):
        pytest.skip("tiny model did not converge to emitting detections")

    pts = np.asarray(batch["points"][0][: int(batch["num_points"][0])])
    shifted = pts.copy()
    shifted[:, 0] += 8.0
    scene = np.concatenate([pts, shifted]) + [30.0, 10.0, 5.0, 0.0]

    single = TiledInference(model, variables, overlap=2.0,
                            predict_fn=predict, max_merge_boxes=64)(scene)

    mesh = make_mesh(8)
    sharded_predict = make_sharded_predict_fn(model, mesh)
    sharded = TiledInference(model, variables, overlap=2.0,
                             batch_tiles=8, predict_fn=sharded_predict,
                             max_merge_boxes=64)(scene)

    assert len(sharded) == len(single) > 0
    key = lambda d: (d["label"], round(float(d["bbox"][0]), 2),  # noqa: E731
                     round(float(d["bbox"][1]), 2))
    for a, b in zip(sorted(single, key=key), sorted(sharded, key=key)):
        assert a["label"] == b["label"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-3,
                                   atol=1e-3)
