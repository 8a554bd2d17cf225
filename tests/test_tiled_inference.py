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
    """The sorted-run device crop delivers, per tile, exactly the numpy
    in-window point set (as a multiset — the uniformizing shuffle
    reorders rows), in local coordinates; every other delivered row is
    out of the model range (the voxelizer's drop contract)."""
    model, variables, _ = trained
    recorded = []

    def stub_predict(vars_, batch):
        recorded.append((np.asarray(batch["points"]),
                         np.asarray(batch["num_points"])))
        bsz = batch["points"].shape[0]
        return {"bbox": jnp.zeros((bsz, 4, 9), jnp.float32),
                "score": jnp.zeros((bsz, 4), jnp.float32),
                "label": jnp.zeros((bsz, 4), jnp.int32),
                "valid": jnp.zeros((bsz, 4), bool)}

    # density chosen so no run exceeds the tiny model's clamped run
    # budget (truncation is exercised separately — it is by-design a
    # uniform subsample, which would break the exact multiset compare)
    rng = np.random.default_rng(3)
    scene = np.concatenate(
        [rng.uniform([0, 0, 0], [20, 14, 3], (1800, 3)),
         rng.uniform(0, 1, (1800, 1))], axis=1).astype(np.float32)
    ti = TiledInference(model, variables, overlap=2.0,
                        predict_fn=stub_predict, max_merge_boxes=64)
    assert ti(scene) == []  # stub emits no detections

    pcr = np.asarray(model.point_cloud_range, np.float32)
    lo = scene[:, :3].min(0)
    xs = ti._tile_origins(lo[0], scene[:, 0].max(), ti.tile_x, ti.overlap)
    ys = ti._tile_origins(lo[1], scene[:, 1].max(), ti.tile_y, ti.overlap)
    tiles = [(x0, y0) for x0 in xs for y0 in ys]
    assert len(tiles) >= 4  # multi-tile scene, multi-run tiles

    got_tiles = []
    for pts, num in recorded:
        for j in range(pts.shape[0]):
            got_tiles.append((pts[j], int(num[j])))
    got_tiles = got_tiles[: len(tiles)]  # padded chunk tails drop

    for (x0, y0), (pts, n) in zip(tiles, got_tiles):
        shift = np.array([x0, y0, lo[2]], np.float32)
        body = pts[:n]
        inw = np.all((body[:, :3] >= pcr[:3]) & (body[:, :3] < pcr[3:]),
                     axis=1)
        got = sorted(map(tuple, np.round(body[inw], 4)))
        sel = np.all((scene[:, :3] >= pcr[:3] + shift)
                     & (scene[:, :3] < pcr[3:] + shift), axis=1)
        want = scene[sel].copy()
        want[:, :3] -= shift
        want = sorted(map(tuple, np.round(want, 4)))
        assert got == want, (x0, y0, len(got), len(want))


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


def test_merge_truncation_keeps_top_scores(trained):
    """When cross-tile candidates exceed max_merge_boxes, the cut keeps
    the TOP-SCORING boxes — a tile-order cut would silently drop
    high-scoring detections from later tiles before the global NMS
    (reference global suppression is score-sorted, model/utils.py:398-424).
    """
    model, variables, _ = trained
    calls = {"n": 0}
    D = 40  # detections per tile emitted by the stub

    def stub_predict(vars_, batch):
        # scores increase monotonically with tile index: the LAST tile
        # holds the globally best detections
        k = calls["n"]
        calls["n"] += 1
        bbox = np.zeros((1, D, 9), np.float32)
        bbox[0, :, 0] = 0.3 + 0.19 * np.arange(D)
        bbox[0, :, 1] = 1.0 + 0.53 * k
        bbox[0, :, 2] = 0.2
        bbox[0, :, 3:6] = [0.1, 0.1, 1.0]
        score = (0.5 + 0.004 * (D * k + np.arange(D)))[None]
        return {"bbox": jnp.asarray(bbox),
                "score": jnp.asarray(score.astype(np.float32)),
                "label": jnp.zeros((1, D), jnp.int32),
                "valid": jnp.ones((1, D), bool)}

    rng = np.random.default_rng(0)
    scene = np.concatenate([
        rng.uniform([0, 0, 0], [20, 8, 3], (2000, 3)),
        rng.uniform(0, 1, (2000, 1))], axis=1).astype(np.float32)

    ti = TiledInference(model, variables, overlap=2.0,
                        predict_fn=stub_predict, max_merge_boxes=64,
                        device_crop=False)
    dets = ti(scene)
    n_tiles = calls["n"]
    assert n_tiles * D > ti.max_merge_boxes  # truncation engaged
    all_scores = 0.5 + 0.004 * np.arange(n_tiles * D)

    got = np.sort([float(d["score"]) for d in dets])
    # disjoint boxes: nothing NMS-suppressed, so exactly the budget
    assert len(got) == ti.max_merge_boxes
    # the global best (from the LAST tile) survives ...
    assert np.isclose(got.max(), all_scores[-1], atol=1e-5)
    # ... and every survivor is inside the global top-64 by score
    assert got.min() >= all_scores[-ti.max_merge_boxes] - 1e-5


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


def test_fused_scene_program_matches_host_path(trained):
    """The fused whole-scene program (sort + exact-y crop + every tile's
    predict under one lax.map jit — the flagship single-chip path) must
    reproduce the host-crop reference detections on the same scene."""
    model, variables, batch = trained
    predict = model.make_predict_fn()
    base = predict(variables, batch)
    if not bool(np.asarray(base["valid"]).any()):
        pytest.skip("tiny model did not converge to emitting detections")

    pts = np.asarray(batch["points"][0][: int(batch["num_points"][0])])
    shifted = pts.copy()
    shifted[:, 0] += 8.0
    scene = np.concatenate([pts, shifted]) + [30.0, 10.0, 5.0, 0.0]

    host = TiledInference(model, variables, overlap=2.0,
                          predict_fn=predict, max_merge_boxes=64,
                          device_crop=False)(scene)
    fused_ti = TiledInference(model, variables, overlap=2.0,
                              max_merge_boxes=64)
    assert fused_ti.fused  # no external predict_fn -> fused program
    fused = fused_ti(scene)

    assert len(fused) == len(host) > 0
    key = lambda d: (d["label"], round(float(d["bbox"][0]), 2),  # noqa: E731
                     round(float(d["bbox"][1]), 2))
    for a, b in zip(sorted(host, key=key), sorted(fused, key=key)):
        assert a["label"] == b["label"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-3,
                                   atol=1e-3)
