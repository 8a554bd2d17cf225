"""Visual single-sample inference check (reference surface:
show_inference.py:1-27)."""

from objectdetection_3d_tpu.entry import build_pipeline, require_mode


def main(config_path="./config.yaml"):
    pipeline, cfg_pipeline = build_pipeline(config_path)
    require_mode(cfg_pipeline, inference_mode=True, task="show_inference")
    pipeline.show_inference()


if __name__ == "__main__":
    main()
