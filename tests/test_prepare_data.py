"""Offline data-prep CLI: featurize -> filter -> downsample -> .npy."""

import pickle
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, "tools")

from prepare_data import prepare_cloud  # noqa: E402


def _dense_cloud(n=4000, seed=0):
    """A cloud dense enough (>10 pts/m^3) to trigger the density
    downsampling branch."""
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = rng.uniform(0, 3, (n, 3))
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def _mlp_ckpt(tmp_path, in_ch=40):
    """Write a tiny flax MLP checkpoint the ForegroundFilter can load."""
    from objectdetection_3d_tpu.models.layers import MLP

    # ForegroundFilter reconstructs the default architecture, so the
    # checkpoint must match it
    mlp = MLP(input_channels=in_ch)
    variables = mlp.init(jax.random.PRNGKey(0),
                         np.zeros((2, in_ch), np.float32), False)
    path = tmp_path / "models"
    path.mkdir()
    with open(path / "mlp.pkl", "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, variables), f)
    return str(path) + "/"


def test_prepare_cloud_downsamples_dense_cloud():
    pts = _dense_cloud()
    out = prepare_cloud(pts, {
        "voxelization": {"voxel_size": [0.5, 0.5, 0.5],
                         "max_voxel_points": 15,
                         "reflectance_sampling": True},
    }, log=lambda *a: None)
    assert out.shape[1] == 4
    assert 0 < len(out) < len(pts)  # centroids, one per occupied voxel
    assert np.isfinite(out).all()


def test_prepare_cloud_filter_chain(tmp_path):
    pts = _dense_cloud(n=600)
    path = _mlp_ckpt(tmp_path)
    out = prepare_cloud(pts, {
        "featurizer": {"normal_rad": 0.5, "normal_max_nn": 10,
                       "fpfh_rad": 0.5, "fpfh_max_nn": 10},
        "filter": {"path": path, "filter_type": "mlp",
                   "mlp": {"input_channels": 40,
                           "trunk_confidence": 0.5}},
    }, log=lambda *a: None)
    assert out.shape[1] == 4
    assert len(out) <= len(pts)


def test_prepare_data_cli(tmp_path):
    import yaml

    pts = _dense_cloud()
    src = tmp_path / "raw.npy"
    np.save(src, pts)
    np.save(tmp_path / "raw_bbx.npy", np.zeros((2, 9), np.float32))
    cfg = {"model": {"preprocess": {
        "voxelization": {"voxel_size": [0.5, 0.5, 0.5],
                         "max_voxel_points": 15,
                         "reflectance_sampling": True}}}}
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    dst = tmp_path / "out.npy"
    r = subprocess.run(
        [sys.executable, "tools/prepare_data.py", str(cfg_path),
         str(src), str(dst)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    out = np.load(dst)
    assert out.shape[1] == 4 and len(out) > 0
    assert (tmp_path / "out_bbx.npy").exists()
