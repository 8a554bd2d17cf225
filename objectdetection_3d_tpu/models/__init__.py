from objectdetection_3d_tpu.models.anchors import (  # noqa: F401
    Anchor3DRangeGenerator,
    BBoxCoder,
)
from objectdetection_3d_tpu.models.detector import PointPillars  # noqa: F401
