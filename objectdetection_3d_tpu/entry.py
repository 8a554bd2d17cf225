"""Shared bootstrap for the CLI entry scripts.

The reference repeats the same config-load / dataset / model / pipeline
wiring in each of run_training.py, run_testing.py and show_inference.py
(each :1-31); here it is factored once.  The config contract is identical:
a YAML with ``global_args`` / ``dataset`` / ``model`` / ``pipeline``
sections and the ``pipeline.inference_mode`` flag selecting the run mode.
"""

import logging

from objectdetection_3d_tpu.config import Config
from objectdetection_3d_tpu.dataset import Forest3D
from objectdetection_3d_tpu.models import PointPillars
from objectdetection_3d_tpu.pipeline import ObjectDetection


def build_pipeline(config_path="./config.yaml"):
    """Load the YAML config and assemble (pipeline, pipeline_cfg)."""
    cfg = Config.load_from_file(config_path)
    for section in ("global_args", "dataset", "model", "pipeline"):
        if cfg.get(section) is None:
            raise ValueError(
                f"config is missing its '{section}' section — all of "
                "global_args/dataset/model/pipeline are required")

    cfg_dataset, cfg_pipeline, cfg_model = Config.initialize_params(cfg)
    dataset = Forest3D(**cfg_dataset)
    model = PointPillars(**cfg_model)
    pipeline = ObjectDetection(model, dataset, cfg.dump(), **cfg_pipeline)
    return pipeline, cfg_pipeline


def require_mode(cfg_pipeline, inference_mode, task):
    """Fail fast when ``pipeline.inference_mode`` contradicts the script."""
    actual = bool(cfg_pipeline.get("inference_mode"))
    if actual != inference_mode:
        raise ValueError(
            f"{task} needs pipeline.inference_mode: "
            f"{str(inference_mode).lower()} in the config "
            f"(found {str(actual).lower()})")


def init_logging():
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s - %(asctime)s - %(module)s - %(message)s")
