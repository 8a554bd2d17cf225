"""Config system: schema, derivations, strict missing-key behavior."""

import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.config import Config, ConfigDict  # noqa: E402


def base_cfg(tmp_path):
    return {
        "global_args": {"framework": "jax", "device": "cpu",
                        "output_path": str(tmp_path / "out") + "/",
                        "box_params_num": 9, "model_dim": 3, "seed": 5},
        "dataset": {"name": "d", "dataset_path": str(tmp_path) + "/"},
        "model": {"name": "PointPillars",
                  "point_cloud_range": [0, 0, 0, 40.0, 40.0, 30.0],
                  "input_features": [0, 1, 2, 3],
                  "voxelize": {"voxel_size": [0.1, 0.1, 0.3]},
                  "vertical_encoder": {},
                  "head": {}},
        "pipeline": {"name": "ObjectDetection"},
    }


def test_configdict_raises_on_missing():
    cd = ConfigDict({"a": {"b": 1}})
    assert cd.a.b == 1
    with pytest.raises(AttributeError):
        _ = cd.nope
    with pytest.raises(KeyError):
        _ = cd["nope"]


def test_initialize_params_derivations(tmp_path):
    cfg = Config(base_cfg(tmp_path))
    ds, pl, md = Config.initialize_params(cfg)
    # grid dims from range / voxel size (reference config.py:94-95)
    np.testing.assert_allclose(md.voxel_grid_dims, [400.0, 400.0, 100.0])
    # vertical encoder output shape [z, x, y] (reference config.py:108)
    assert md.vertical_encoder.output_shape == [100.0, 400.0, 400.0]
    # fan-out (reference config.py:57-90,110-112)
    assert pl.model_name == "PointPillars"
    assert pl.box_params_num == 9 and pl.eval_dim == 3
    assert md.head.box_params_num == 9 and md.head.nms_dim == 3
    assert ds.seed == pl.seed == md.seed == 5
    # shared rng instance (reference config.py:74-84)
    assert ds.rng is pl.rng is md.rng
    # tpu section injected with defaults
    assert md.tpu.max_gt_static > 0


def test_input_feature_validation(tmp_path):
    d = base_cfg(tmp_path)
    d["model"]["input_features"] = [0, 1, 2]  # missing reflectance
    with pytest.raises(AssertionError):
        Config.initialize_params(Config(d))


def test_load_from_file_rejects_non_yaml(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text("{}")
    with pytest.raises(ImportError):
        Config.load_from_file(str(p))
    with pytest.raises(FileNotFoundError):
        Config.load_from_file(str(tmp_path / "missing.yaml"))


def test_dump_roundtrip(tmp_path):
    cfg = Config(base_cfg(tmp_path))
    d = cfg.dump()
    assert isinstance(d, dict)
    assert d["model"]["name"] == "PointPillars"
