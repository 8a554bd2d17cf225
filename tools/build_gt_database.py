"""Build the GT object database for the ObjectSample augmentation.

Usage: python tools/build_gt_database.py <config.yaml> [out.pkl]

Reads the dataset section of the pipeline config, crops every training
GT object's interior points, and writes the database pickle that
``augment: {ObjectSample: {db_path: ...}}`` consumes.
"""

import sys

sys.path.insert(0, ".")

from objectdetection_3d_tpu.augment.gt_database import build_gt_database
from objectdetection_3d_tpu.config import Config
from objectdetection_3d_tpu.dataset import Forest3D


def main(argv):
    cfg_path = argv[1] if len(argv) > 1 else "config.yaml"
    out_path = argv[2] if len(argv) > 2 else "gt_database.pkl"
    cfg = Config.load_from_file(cfg_path)
    dataset = Forest3D(**cfg.dataset)
    split = dataset.get_split("training")
    min_points = int(cfg.dataset.get("gt_db_min_points", 5))
    build_gt_database(split, out_path, min_points=min_points)


if __name__ == "__main__":
    main(sys.argv)
