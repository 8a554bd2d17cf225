"""Training entry point (mirrors reference run_training.py:1-31)."""

import logging

from objectdetection_3d_tpu.config import Config
from objectdetection_3d_tpu.dataset import Forest3D
from objectdetection_3d_tpu.models import PointPillars
from objectdetection_3d_tpu.pipeline import ObjectDetection


def main(config_path="./config.yaml"):
    cfg = Config.load_from_file(config_path)
    global_cfg = cfg.dump()

    if (cfg.global_args and cfg.pipeline and cfg.model
            and cfg.dataset) is None:
        raise ValueError("Please specify global arguments, pipeline, model, "
                         "and dataset in config file")

    cfg_dataset, cfg_pipeline, cfg_model = Config.initialize_params(cfg)
    dataset = Forest3D(**cfg_dataset)
    model = PointPillars(**cfg_model)
    pipeline = ObjectDetection(model, dataset, global_cfg, **cfg_pipeline)

    if not cfg_pipeline.get("inference_mode"):
        pipeline.run_training()
    else:
        raise ValueError("Can't run training session with configuration of "
                         "inference_mode: True")


if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s - %(asctime)s - %(module)s - %(message)s")
    main()
