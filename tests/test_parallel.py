"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.parallel import (  # noqa: E402
    make_mesh,
    make_sharded_predict_fn,
    make_sharded_train_step,
)
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    tx = model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    return model, variables, tx


def to_device(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_step_runs(setup):
    model, variables, tx = setup
    mesh = make_mesh(8)
    step = make_sharded_train_step(model, tx, mesh, donate=False)
    batch = to_device(tiny_batch(batch_size=8))
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    state, losses = step(state, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_sharded_matches_single_device(setup):
    """DP over 8 devices must equal single-device large-batch training."""
    model, variables, tx = setup
    batch = to_device(tiny_batch(batch_size=8, seed=3))

    def fresh_state():
        return {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"])}

    single = model.make_train_step(tx, donate=False)
    s1, l1 = single(fresh_state(), batch)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model, tx, mesh, donate=False)
    s8, l8 = sharded(fresh_state(), batch)

    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]),
                                   rtol=2e-4, atol=1e-5)
    # parameters after one step agree
    flat1 = jax.tree_util.tree_leaves(s1["params"])
    flat8 = jax.tree_util.tree_leaves(s8["params"])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_predict(setup):
    model, variables, tx = setup
    mesh = make_mesh(8)
    predict = make_sharded_predict_fn(model, mesh)
    batch = to_device(tiny_batch(batch_size=8))
    out = predict({"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}, batch)
    assert out["bbox"].shape[0] == 8
    assert np.all(np.isfinite(np.asarray(out["score"])))


def test_spatial_sharded_train_matches_1d(setup):
    """Training on a 2x4 (data x space) mesh — grid H sharded over
    'space' — must match the single-device step (same global batch)."""
    from objectdetection_3d_tpu.parallel import make_mesh_2d

    model, variables, tx = setup
    batch = to_device(tiny_batch(batch_size=2, seed=5))

    def fresh_state():
        return {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"])}

    single = model.make_train_step(tx, donate=False)
    s1, l1 = single(fresh_state(), batch)

    mesh = make_mesh_2d(2, 4)
    sharded = make_sharded_train_step(model, tx, mesh, space_axis="space",
                                      donate=False)
    s2, l2 = sharded(fresh_state(), batch)

    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_step_applies_device_augment():
    """The sharded train step must thread device_augment rng exactly like
    the single-chip step (regression: it used to silently drop it)."""
    cfg = tiny_model_cfg()
    cfg["device_augment"] = {"rotate": {"min": 0.0, "max": 6.28},
                             "flip_x": True}
    model = PointPillars(**cfg)
    assert model.device_augment, "cfg should enable device augmentation"
    variables = model.init_variables(jax.random.PRNGKey(0))
    tx = model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    batch = to_device(tiny_batch(batch_size=8, seed=7))

    def fresh_state():
        return {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"]),
                "rng": jax.random.PRNGKey(42)}

    single = model.make_train_step(tx, donate=False)
    s1, l1 = single(fresh_state(), batch)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model, tx, mesh, donate=False)
    s8, l8 = sharded(fresh_state(), batch)

    # identical rng -> identical augmented batch -> identical losses
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]),
                                   rtol=2e-4, atol=1e-5)
    # the rng advanced in both
    np.testing.assert_array_equal(np.asarray(s1["rng"]),
                                  np.asarray(s8["rng"]))
    assert not np.array_equal(np.asarray(s1["rng"]),
                              np.asarray(fresh_state()["rng"]))


def test_spatial_sharded_predict(setup):
    """2-D mesh: batch over 'data', pseudo-image H over 'space'; results
    must match the unsharded predict."""
    from jax.sharding import Mesh
    from objectdetection_3d_tpu.parallel import make_spatial_predict_fn

    model, variables, tx = setup
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "space"))
    predict2d = make_spatial_predict_fn(model, mesh)
    batch = to_device(tiny_batch(batch_size=2, seed=9))
    pv = {"params": variables["params"],
          "batch_stats": variables["batch_stats"]}
    got = predict2d(pv, batch)
    want = model.make_predict_fn()(pv, batch)
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got["label"]),
                                  np.asarray(want["label"]))
    np.testing.assert_allclose(np.asarray(got["bbox"]),
                               np.asarray(want["bbox"]), atol=1e-3)


def test_sharded_step_with_pallas_assignment_matches_single_chip():
    """VERDICT r3 #3: mesh training must keep the fused Pallas assignment.

    The sharded step routes the assignment through a shard_map island over
    the data axis (each device runs the Mosaic kernels on its LOCAL batch
    items — GSPMD never sees them).  Forcing the island's geometry through
    the ACTUAL Pallas kernel bodies (interpret mode on CPU), one sharded
    step must match the single-chip step running the default XLA
    geometry: same losses, same updated parameters.
    """
    cfg = tiny_model_cfg()
    cfg["tpu"]["assign_geometry"] = "pallas_interpret"
    model_pl = PointPillars(**cfg)
    model_xla = PointPillars(**tiny_model_cfg())
    assert model_pl.anchor_layout is not None, \
        "tiny anchor grid must factorize or the Pallas tier is skipped"
    variables = model_pl.init_variables(jax.random.PRNGKey(0))
    tx = model_pl.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                     weight_decay=0.01),
                                grad_clip_value=2.0)
    batch = to_device(tiny_batch(batch_size=8, seed=13))

    def fresh_state():
        return {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"])}

    single = model_xla.make_train_step(tx, donate=False)
    s1, l1 = single(fresh_state(), batch)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model_pl, tx, mesh, donate=False)
    s8, l8 = sharded(fresh_state(), batch)

    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s8["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_island_predict_matches_single_device(setup):
    """VERDICT r4 #6: mesh predict runs its forward in a shard_map island
    (Pallas kernels stay live per device on TPU) — the islanded program
    must match the single-device predict exactly."""
    model, variables, tx = setup
    mesh = make_mesh(8)
    predict = make_sharded_predict_fn(model, mesh)  # pallas="auto" default
    batch = to_device(tiny_batch(batch_size=8, seed=21))
    pv = {"params": variables["params"],
          "batch_stats": variables["batch_stats"]}
    got = predict(pv, batch)
    want = model.make_predict_fn()(pv, batch)
    np.testing.assert_allclose(np.asarray(got["score"]),
                               np.asarray(want["score"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got["label"]),
                                  np.asarray(want["label"]))
    np.testing.assert_allclose(np.asarray(got["bbox"]),
                               np.asarray(want["bbox"]), atol=1e-3)


def test_island_eval_matches_single_device(setup):
    """Sharded eval (islanded forward + GSPMD losses + islanded
    assignment) must reproduce single-device losses and detections."""
    from objectdetection_3d_tpu.parallel import make_sharded_eval_fn

    model, variables, tx = setup
    mesh = make_mesh(8)
    evalf = make_sharded_eval_fn(model, mesh)
    batch = to_device(tiny_batch(batch_size=8, seed=22))
    pv = {"params": variables["params"],
          "batch_stats": variables["batch_stats"]}
    losses8, preds8 = evalf(pv, batch)
    losses1, preds1 = model.make_eval_fn()(pv, batch)
    for k in losses1:
        np.testing.assert_allclose(float(losses1[k]), float(losses8[k]),
                                   rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds8["score"]),
                               np.asarray(preds1["score"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(preds8["bbox"]),
                               np.asarray(preds1["bbox"]), atol=1e-3)


def test_sharded_accum_matches_single_device_accum(setup):
    """Mesh gradient accumulation (microbatch= on the sharded step) must
    equal the single-device accumulation step: each scanned chunk is
    batch-sharded over the mesh, loss reductions stay global sums, and
    the pooled avg_factor renormalization is identical arithmetic."""
    model, variables, tx = setup
    batch = to_device(tiny_batch(batch_size=16, seed=11))

    def fresh_state():
        return {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": tx.init(variables["params"])}

    single = model.make_train_step(tx, donate=False, microbatch=8)
    s1, l1 = single(fresh_state(), batch)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(model, tx, mesh, donate=False,
                                      microbatch=8)
    s8, l8 = sharded(fresh_state(), batch)

    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l8[k]),
                                   rtol=2e-4, atol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1["params"])
    flat8 = jax.tree_util.tree_leaves(s8["params"])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_accum_indivisible_microbatch_raises(setup):
    model, variables, tx = setup
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_train_step(model, tx, mesh, donate=False,
                                microbatch=3)
