from objectdetection_3d_tpu.pipeline.pipeline import ObjectDetection  # noqa: F401
from objectdetection_3d_tpu.pipeline.base_pipeline import BasePipeline  # noqa: F401
