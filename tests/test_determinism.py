"""Reproducibility: identical seeds give identical training trajectories
(the reference fans a single seed to all RNGs, config.py:74-84)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


def run_once():
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(42))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        batch_size=2, seed=5).items()}
    tx = model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    step = model.make_train_step(tx, donate=False)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    traj = []
    for _ in range(3):
        state, losses = step(state, batch)
        traj.append({k: float(v) for k, v in losses.items()})
    return traj


def test_training_is_deterministic():
    t1 = run_once()
    t2 = run_once()
    for a, b in zip(t1, t2):
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])


def test_preprocess_augment_reproducible():
    model = PointPillars(**tiny_model_cfg())
    data = {
        "point": np.random.default_rng(0).uniform(
            0, 8, (500, 4)).astype(np.float32),
        "labels": np.zeros(1),
        "bboxes": np.array([[4, 4, 0, 1, 1, 2, 0, 0, 0]], np.float32),
    }
    attr = {"name": "x", "split": "training"}
    out1 = model.preprocess(dict(data), attr,
                            rng=np.random.default_rng(7))
    out2 = model.preprocess(dict(data), attr,
                            rng=np.random.default_rng(7))
    np.testing.assert_array_equal(out1["point"], out2["point"])
