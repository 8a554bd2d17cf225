"""Testing entry point (reference surface: run_testing.py:1-31)."""

from objectdetection_3d_tpu.entry import (
    build_pipeline,
    init_logging,
    require_mode,
)


def main(config_path="./config.yaml"):
    pipeline, cfg_pipeline = build_pipeline(config_path)
    require_mode(cfg_pipeline, inference_mode=True, task="testing")
    pipeline.run_testing()


if __name__ == "__main__":
    init_logging()
    main()
