from objectdetection_3d_tpu.dataset.base import (  # noqa: F401
    BaseDataset,
    BaseDatasetSplit,
)
from objectdetection_3d_tpu.dataset.forest import (  # noqa: F401
    Forest3D,
    ForestSplit,
)
from objectdetection_3d_tpu.dataset.loader import (  # noqa: F401
    DetectionBatch,
    PreprocessedDataset,
    StaticBatcher,
    DataLoader,
)
