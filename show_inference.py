"""Visual single-sample inference check (mirrors reference
show_inference.py:1-27)."""

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
    model = PointPillars(**cfg_model)
    dataset = Forest3D(cfg_dataset.pop("dataset_path", None), **cfg_dataset)
    pipeline = ObjectDetection(model, dataset, global_cfg, **cfg.pipeline)

    if cfg_pipeline.get("inference_mode"):
        pipeline.show_inference()
    else:
        raise ValueError("Can't run show_inference session with "
                         "configuration of inference_mode: False")


if __name__ == "__main__":
    main()
