"""End-to-end learning check: the full chain (voxelize -> network -> assign
-> losses -> optimizer -> decode -> NMS -> metrics) can overfit a tiny
synthetic forest to high precision/recall."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.metrics import MetricEvaluator  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


@pytest.mark.slow
def test_overfit_synthetic_forest():
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(
        batch_size=2, num_gt=3, seed=11).items()}

    tx = model.get_optimizer(dict(lr=5e-3, betas=[0.95, 0.99],
                                  weight_decay=0.01), grad_clip_value=2.0)
    step = model.make_train_step(tx, donate=False)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": tx.init(variables["params"])}
    for i in range(400):
        state, losses = step(state, batch)
    total = sum(float(v) for v in losses.values())
    assert np.isfinite(total)

    predict = model.make_predict_fn()
    preds = predict({"params": state["params"],
                     "batch_stats": state["batch_stats"]}, batch)

    me = MetricEvaluator(eval_dim=3)
    prediction, target = [], []
    for i in range(2):
        valid = np.asarray(preds["valid"][i])
        prediction.append({
            "bbox": np.asarray(preds["bbox"][i])[valid],
            "label": np.asarray(preds["label"][i])[valid],
            "score": np.asarray(preds["score"][i])[valid],
        })
        mask = np.asarray(batch["gt_mask"][i])
        target.append({
            "bbox": np.asarray(batch["bboxes"][i])[mask],
            "label": np.asarray(batch["labels"][i])[mask],
        })
    # the decode path emits center-z boxes (reference quirk) while GT is
    # bottom-z; at IoU 0.1 the reference's own eval still matches (SURVEY)
    precision, recall = me.evaluate(prediction, target, [0], [0.1])
    assert recall[0, 0] >= 80.0, (precision, recall)
    assert precision[0, 0] >= 50.0, (precision, recall)
