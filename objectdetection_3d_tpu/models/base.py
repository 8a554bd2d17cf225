"""Abstract model contract (reference model/base_model.py:6-77)."""

from abc import ABC, abstractmethod

import numpy as np

from objectdetection_3d_tpu.config import Config


class BaseModel(ABC):
    """Base class for detection models.

    Wraps constructor kwargs into a Config and owns the per-model host RNG,
    like the reference.  Concrete models implement the preprocessing,
    training-loss and inference-end hooks the pipeline drives.
    """

    def __init__(self, **kwargs):
        self.cfg = Config(kwargs)
        self.name = self.cfg.name
        self.rng = np.random.default_rng(kwargs.get("seed", None))

    @abstractmethod
    def loss(self, results, inputs):
        """Compute training losses for a forward result and batch."""

    @abstractmethod
    def get_optimizer(self, cfg_pipeline):
        """Build the optax optimizer."""

    @abstractmethod
    def preprocess(self, data, attr):
        """Host-side per-cloud preprocessing."""

    @abstractmethod
    def transform(self, data, attr):
        """Host-side post-preprocess transform."""

    @abstractmethod
    def inference_end(self, results):
        """Convert raw network output into detection dicts."""
