from objectdetection_3d_tpu.augment.augmentation import (  # noqa: F401
    Augmentation,
    ObjdetAugmentation,
)
from objectdetection_3d_tpu.augment.numpy_ops import (  # noqa: F401
    global_outlier_check,
)
