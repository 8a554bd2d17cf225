"""Offline data preparation: raw cloud -> training-ready ``.npy``.

The reference implies this chain but ships no script for it (SURVEY
§3.5): ``RDB_import.get_features`` -> ``Featurizer.generate_features``
-> ``ForegroundFilter.evaluate`` -> ``CustomVoxelizer.voxelize`` ->
save the ``.npy`` the dataset layer consumes (reference
dataset/RDB_tools.py:24-85, model/utils.py:8-133).  This CLI completes
it.

Usage:
    python tools/prepare_data.py <config.yaml> <input> <output.npy>

``input`` is a raw ``.npy`` cloud ``(N, >=4)`` = x, y, z, reflectance
(or an ``.rdbx`` file when the vendor ``riegl.rdb`` package is
installed).  Steps controlled by the config's ``model.preprocess``
section; the foreground filter is applied only when its checkpoint
exists.  A sibling ``<input>_bbx.npy`` is copied through untouched.
"""

import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from objectdetection_3d_tpu.config import Config
from objectdetection_3d_tpu.models.preprocess_tools import (
    CustomVoxelizer,
    Featurizer,
    ForegroundFilter,
)


def prepare_cloud(points, preprocess_cfg, log=print):
    """Run the offline chain on one raw cloud array.

    Returns the training-ready cloud: original feature columns of the
    surviving points, density-downsampled.
    """
    n_cols = points.shape[1]

    feat_cfg = dict(preprocess_cfg.get("featurizer", {}) or {})
    filt_cfg = dict(preprocess_cfg.get("filter", {}) or {})
    vox_cfg = dict(preprocess_cfg.get("voxelization", {}) or {})

    if feat_cfg and filt_cfg:
        try:
            filt = ForegroundFilter(filt_cfg)
        except (FileNotFoundError, AssertionError) as e:
            log(f"prepare_data: foreground filter skipped ({e})")
            filt = None
        if filt is not None:
            feats = Featurizer(**feat_cfg).generate_features(points)
            mask = filt.evaluate(feats).astype(bool)
            log(f"prepare_data: foreground filter kept "
                f"{int(mask.sum())}/{len(points)} points")
            points = points[mask]

    if vox_cfg:
        before = len(points)
        points = CustomVoxelizer(**vox_cfg).voxelize(points)
        # the voxelizer appends a count column when it downsamples;
        # the dataset contract keeps the original feature columns
        points = points[:, :n_cols]
        if len(points) != before:
            log(f"prepare_data: density downsample {before} -> "
                f"{len(points)} points")
    return np.ascontiguousarray(points, np.float32)


def _load(path):
    if path.endswith(".rdbx"):
        from objectdetection_3d_tpu.dataset.rdb_tools import RDB_import

        pts, _geo = RDB_import(
            path, ["riegl.xyz", "riegl.reflectance"], "",
            100_000).get_features()
        return np.asarray(pts, np.float32)
    return np.load(path).astype(np.float32)


def main(argv):
    if len(argv) < 4:
        print(__doc__)
        return 1
    cfg = Config.load_from_file(argv[1])
    src, dst = argv[2], argv[3]

    points = _load(src)
    out = prepare_cloud(points, dict(cfg.model.get("preprocess", {})))
    np.save(dst, out)
    print(f"prepare_data: wrote {out.shape} to {dst}")

    bbx = src.rsplit(".", 1)[0] + "_bbx.npy"
    if os.path.exists(bbx):
        shutil.copy(bbx, dst.rsplit(".", 1)[0] + "_bbx.npy")
        print("prepare_data: copied GT boxes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
