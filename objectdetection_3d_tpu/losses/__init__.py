from objectdetection_3d_tpu.losses.losses import (  # noqa: F401
    FocalLoss,
    SmoothL1Loss,
    CrossEntropyLoss,
    one_hot,
)
