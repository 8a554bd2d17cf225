"""First-party XGBoost booster inference (models/xgb_infer.py).

Oracle strategy: a hand-built JSON model in the standard xgboost save
format, evaluated against an INDEPENDENT per-row recursive tree walker
written in this test, plus hand-computed expectations for specific rows
(missing-value routing included).  When the xgboost library is present,
a trained-booster parity test runs as well (reference usage:
model/utils.py:107-124).
"""

import json

import numpy as np
import pytest

from objectdetection_3d_tpu.models.xgb_infer import NumpyBooster


def _tree_json(left, right, split_idx, split_cond, default_left):
    n = len(left)
    return {
        "base_weights": [0.0] * n,
        "categories": [], "categories_nodes": [],
        "categories_segments": [], "categories_sizes": [],
        "default_left": [int(d) for d in default_left],
        "id": 0,
        "left_children": list(left),
        "loss_changes": [0.0] * n,
        "parents": [2147483647] * n,
        "right_children": list(right),
        "split_conditions": [float(c) for c in split_cond],
        "split_indices": list(split_idx),
        "split_type": [0] * n,
        "sum_hessian": [1.0] * n,
        "tree_param": {"num_deleted": "0", "num_feature": "3",
                       "num_nodes": str(n), "size_leaf_vector": "0"},
    }


def _model_json(trees, objective="binary:logistic", base_score="5E-1"):
    return {
        "learner": {
            "attributes": {},
            "feature_names": [], "feature_types": [],
            "gradient_booster": {
                "model": {
                    "gbtree_model_param": {
                        "num_trees": str(len(trees)),
                        "size_leaf_vector": "0"},
                    "trees": trees,
                    "tree_info": [0] * len(trees),
                },
                "name": "gbtree",
            },
            "learner_model_param": {
                "base_score": base_score, "boost_from_average": "1",
                "num_class": "0", "num_feature": "3", "num_target": "1"},
            "objective": {"name": objective,
                          "reg_loss_param": {"scale_pos_weight": "1"}},
        },
        "version": [1, 7, 6],
    }


# tree 0: f0 < 0.5 ? leaf(-1.0) : leaf(2.0), missing -> left
_T0 = _tree_json(left=[1, -1, -1], right=[2, -1, -1],
                 split_idx=[0, 0, 0], split_cond=[0.5, -1.0, 2.0],
                 default_left=[1, 0, 0])
# tree 1: f2 < 1.5 ? (f1 < 0.0 ? leaf(0.5) : leaf(-0.25)) : leaf(1.0),
# root missing -> right, inner missing -> left
_T1 = _tree_json(left=[1, 3, -1, -1, -1], right=[2, 4, -1, -1, -1],
                 split_idx=[2, 1, 0, 0, 0],
                 split_cond=[1.5, 0.0, 1.0, 0.5, -0.25],
                 default_left=[0, 1, 0, 0, 0])


def _oracle_row(tree, row):
    """Independent recursive single-row walker."""
    nid = 0
    while tree["left_children"][nid] != -1:
        feat = row[tree["split_indices"][nid]]
        if np.isnan(feat):
            left = bool(tree["default_left"][nid])
        else:
            left = feat < tree["split_conditions"][nid]
        nid = (tree["left_children"][nid] if left
               else tree["right_children"][nid])
    return tree["split_conditions"][nid]


def _write(tmp_path, doc, name="modelxgboost"):
    path = tmp_path / name
    path.write_text(json.dumps(doc))
    return str(path)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_logistic_matches_recursive_oracle(tmp_path):
    booster = NumpyBooster.load_model(
        _write(tmp_path, _model_json([_T0, _T1])))
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 3, (64, 3))
    x[rng.uniform(size=(64, 3)) < 0.25] = np.nan

    margin = np.array([_oracle_row(_T0, r) + _oracle_row(_T1, r)
                       for r in x])
    expected = _sigmoid(margin + 0.0)  # logit(0.5) = 0 intercept
    np.testing.assert_allclose(booster.predict(x), expected, rtol=1e-12)
    np.testing.assert_allclose(booster.predict(x, output_margin=True),
                               margin, rtol=1e-12)


def test_hand_computed_rows(tmp_path):
    booster = NumpyBooster.load_model(
        _write(tmp_path, _model_json([_T0, _T1])))
    x = np.array([
        [0.0, -1.0, 0.0],      # t0: left -1.0; t1: left,left 0.5
        [1.0, 1.0, 2.0],       # t0: right 2.0; t1: right 1.0
        [np.nan, np.nan, np.nan],  # t0: default left -1.0; t1: dflt r 1.0
    ])
    np.testing.assert_allclose(
        booster.predict(x),
        _sigmoid(np.array([-0.5, 3.0, 0.0])), rtol=1e-12)


def test_nonzero_base_score_intercept(tmp_path):
    booster = NumpyBooster.load_model(
        _write(tmp_path, _model_json([_T0], base_score="0.75")))
    x = np.array([[0.0, 0.0, 0.0]])
    expected = _sigmoid(-1.0 + np.log(0.75 / 0.25))
    np.testing.assert_allclose(booster.predict(x), [expected], rtol=1e-12)


def test_identity_objective(tmp_path):
    booster = NumpyBooster.load_model(_write(
        tmp_path,
        _model_json([_T0], objective="reg:squarederror", base_score="1.5")))
    x = np.array([[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(booster.predict(x), [3.5], rtol=1e-12)


def test_rejects_legacy_binary(tmp_path):
    path = tmp_path / "legacy"
    path.write_bytes(b"binf\x00\x01")
    with pytest.raises(ValueError, match="JSON"):
        NumpyBooster.load_model(str(path))


def test_foreground_filter_uses_numpy_booster(tmp_path):
    """End-to-end through ForegroundFilter with no xgboost installed
    (reference model/utils.py:118-133 contract: (N, C) -> uint8 mask)."""
    try:
        import xgboost  # noqa: F401
        pytest.skip("xgboost present; fallback path not exercised")
    except ImportError:
        pass
    from objectdetection_3d_tpu.models.preprocess_tools import (
        ForegroundFilter)

    _write(tmp_path, _model_json([_T0, _T1]), name="xgboost")
    ff = ForegroundFilter({
        "path": str(tmp_path) + "/",
        "filter_type": "xgboost",
        "xgboost": {"trunk_confidence": 0.5},
    })
    x = np.array([[0.0, -1.0, 0.0], [1.0, 1.0, 2.0]])
    mask = ff.evaluate(x)
    assert mask.dtype == np.uint8
    np.testing.assert_array_equal(mask, [0, 1])  # sigmoid(-0.5) < 0.5 < sigmoid(3)


def test_parity_against_xgboost_library(tmp_path):
    """Train a real booster and require exact-probability parity."""
    xgb = pytest.importorskip("xgboost")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 3))
    y = ((x[:, 0] + 0.5 * x[:, 1] - x[:, 2]) > 0).astype(np.int32)
    booster = xgb.train({"objective": "binary:logistic", "max_depth": 4,
                         "eta": 0.3, "seed": 0},
                        xgb.DMatrix(x, label=y), num_boost_round=10)
    path = str(tmp_path / "model.json")
    booster.save_model(path)
    ours = NumpyBooster.load_model(path)
    theirs = booster.predict(xgb.DMatrix(x))
    np.testing.assert_allclose(ours.predict(x), theirs, rtol=1e-6)
