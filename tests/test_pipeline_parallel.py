"""E2E: the `data_parallel` / `spatial_parallel` pipeline config keys run
`run_training` over the virtual device mesh through the SAME YAML surface
as the reference (run_training.py:8-24) and reproduce single-device losses.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from objectdetection_3d_tpu.config import Config  # noqa: E402
from objectdetection_3d_tpu.dataset import Forest3D  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.pipeline import ObjectDetection  # noqa: E402
from test_pipeline import make_cfg, write_scene  # noqa: E402


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_ws")
    data = root / "data"
    for split in ("training", "validation", "testing"):
        d = data / split
        d.mkdir(parents=True)
        for i in range(4):
            write_scene(d, f"{split}_{i}", seed=abs(hash(split)) % 997 + i)
    return root


def run_one(root, tag, data_parallel=1, spatial_parallel=1, batch_size=1):
    cfg = make_cfg(root)
    cfg.global_args["output_path"] = str(root / f"out_{tag}") + "/"
    cfg.pipeline["training_batch_size"] = batch_size
    cfg.pipeline["validation_batch_size"] = batch_size
    cfg.pipeline["data_parallel"] = data_parallel
    cfg.pipeline["spatial_parallel"] = spatial_parallel
    cfg.pipeline["max_epoch"] = 1
    global_cfg = cfg.dump()
    cfg_dataset, cfg_pipeline, cfg_model = Config.initialize_params(cfg)
    dataset = Forest3D(**cfg_dataset)
    model = PointPillars(**cfg_model)
    pipeline = ObjectDetection(model, dataset, global_cfg, **cfg_pipeline)
    record = pipeline.run_training()
    return pipeline, record


def test_dp_training_matches_single_device(workspace):
    """dp=4 x per-replica batch 1 must match single-device batch 4: the
    loader emits the same global batches (per-item RNG is (seed, epoch,
    index)-keyed), so per-step losses agree to float tolerance."""
    p_single, _ = run_one(workspace, "single", batch_size=4)
    p_dp, _ = run_one(workspace, "dp4", data_parallel=4, batch_size=1)

    assert p_dp.data_parallel == 4
    assert p_dp._mesh is not None and p_dp._mesh.size == 4
    assert set(p_single.losses) == set(p_dp.losses)
    for k in p_single.losses:
        np.testing.assert_allclose(p_single.losses[k], p_dp.losses[k],
                                   rtol=3e-4, atol=1e-5, err_msg=k)


def test_dp2_spatial2_training_runs(workspace):
    """2x2 (data x space) mesh through the YAML path: finite losses and
    the full artifact set."""
    import os

    pipeline, record = run_one(workspace, "dp2sp2", data_parallel=2,
                               spatial_parallel=2, batch_size=1)
    assert pipeline._mesh is not None
    assert dict(zip(pipeline._mesh.axis_names,
                    pipeline._mesh.devices.shape)) == {"data": 2,
                                                       "space": 2}
    for vals in pipeline.losses.values():
        assert np.all(np.isfinite(vals))
    assert os.path.exists(os.path.join(pipeline.cfg.log_dir,
                                       "training_record.csv"))
