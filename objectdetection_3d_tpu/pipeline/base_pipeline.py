"""Base pipeline: device resolution and run versioning
(reference pipeline/base_pipeline.py:10-104)."""

from abc import ABC, abstractmethod
import os
from datetime import datetime

import numpy as np
import jax

from objectdetection_3d_tpu.config import Config
from objectdetection_3d_tpu.pipeline.utils import resume_training_process
from objectdetection_3d_tpu.utils import make_dir


class BasePipeline(ABC):
    """Owns run directories, resume logic and the JAX device."""

    def __init__(self, model, dataset, global_cfg, **kwargs):
        self.cfg = Config(kwargs)
        self.global_cfg = global_cfg

        if kwargs.get("name") is None:
            raise KeyError("Please give a name to the pipeline")

        self.name = self.cfg.name
        self.model = model
        self.dataset = dataset
        self.rng = np.random.default_rng(kwargs.get("seed", None))

        # device resolution: 'cpu' forces the host platform, anything else
        # uses the first accelerator jax exposes
        want = str(self.cfg.get("device", "tpu")).split(":")[0]
        devices = jax.devices()
        if want == "cpu":
            cpus = [d for d in jax.devices("cpu")] if any(
                d.platform == "cpu" for d in devices) else devices
            self.device = cpus[0] if cpus else devices[0]
        else:
            self.device = devices[0]

        self.summary = {}

        log_dir = self.cfg.get("log_dir", "./output/")
        if self.cfg.get("inference_mode"):
            version = self.cfg.get("resume_from", None)
            if version is None:
                raise ValueError(
                    "There is no model defined in config file for inference "
                    "(resume_from?)")
            assert isinstance(version, str), \
                "Invalid resume_from folder name format"
            assert bool(datetime.strptime(version, "%Y-%m-%d-%H-%M-%S")), \
                "Invalid resume_from folder name format"
            self.cfg.log_dir = os.path.join(log_dir, version + "/logs/")
        else:
            if self.cfg.get("is_resume"):
                version = self.cfg.get("resume_from", None)
                if version:
                    assert isinstance(version, str), \
                        "Invalid resume_from folder name format"
                    assert bool(
                        datetime.strptime(version, "%Y-%m-%d-%H-%M-%S")), \
                        "Invalid resume_from folder name format"
                    self.cfg.log_dir = os.path.join(log_dir,
                                                    version + "/logs/")
                else:
                    version = resume_training_process(log_dir)
                    self.cfg.log_dir = os.path.join(log_dir,
                                                    version + "/logs/")
            else:
                self.cfg.log_dir = os.path.join(
                    log_dir,
                    datetime.now().strftime("%Y-%m-%d-%H-%M-%S") + "/logs/")

        make_dir(self.cfg.log_dir)

    @abstractmethod
    def run_inference(self, data):
        """Run inference on given data."""

    @abstractmethod
    def run_testing(self):
        """Run testing on the test split."""

    @abstractmethod
    def run_training(self):
        """Run training on the train split."""

    @abstractmethod
    def show_inference(self):
        """Show inference on a test sample."""
