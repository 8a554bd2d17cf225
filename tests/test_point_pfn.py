"""Point-granularity PFN vs the padded-buffer path.

The two layouts must compute the same function (same parameter tree, same
outputs, same batch-stat updates) — the point path exists purely to cut
HBM traffic on TPU.  Semantics being emulated exactly include the BN
statistics of the buffer's zero padding slots and their post-BN ReLU
value participating in each voxel's max (PFNLayer parity quirk).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.ops.voxelize import (  # noqa: E402
    voxelize,
    voxelize_points,
)


VOX_KW = dict(voxel_size=(0.5, 0.5, 1.0),
              point_cloud_range=(0.0, 0.0, 0.0, 8.0, 8.0, 4.0),
              max_points_per_voxel=4, max_voxels=64)


def _cloud(seed, p=256, n=200):
    rng = np.random.default_rng(seed)
    pts = np.zeros((p, 4), np.float32)
    # clustered so some voxels overflow the 4-point cap and some spill
    # out of range / past max_voxels
    pts[:n, :3] = rng.normal(4.0, 2.2, (n, 3)).astype(np.float32)
    pts[:n, 3] = rng.uniform(0, 1, n)
    return jnp.asarray(pts), jnp.asarray(n, jnp.int32)


@pytest.mark.parametrize("seed", [0, 5])
def test_voxelize_points_matches_buffered(seed):
    pts, n = _cloud(seed)
    buf = voxelize(pts, n, **VOX_KW)
    pp = voxelize_points(pts, n, **VOX_KW)

    for key in ("coords", "num_points_per_voxel", "num_voxels",
                "voxel_mask"):
        np.testing.assert_array_equal(np.asarray(buf[key]),
                                      np.asarray(pp[key]), err_msg=key)

    # the valid points of voxel v are exactly the buffer's kept rows
    pt_voxel = np.asarray(pp["pt_voxel"])
    pt_valid = np.asarray(pp["pt_valid"])
    points_s = np.asarray(pp["points"])
    voxels = np.asarray(buf["voxels"])
    counts = np.asarray(buf["num_points_per_voxel"])
    assert np.all(np.diff(pt_voxel) >= 0), "segment ids must be sorted"
    for v in range(int(buf["num_voxels"])):
        mine = points_s[(pt_voxel == v) & pt_valid]
        ref = voxels[v, :counts[v]]
        np.testing.assert_allclose(
            np.sort(mine, axis=0), np.sort(ref, axis=0), atol=0)


def _tiny_model(point_pfn):
    import __graft_entry__ as g

    cfg = g._tiny_cfg()
    cfg["tpu"]["point_pfn"] = point_pfn
    return PointPillars(**cfg)


@pytest.fixture(scope="module")
def tiny_setup():
    import __graft_entry__ as g

    model = _tiny_model(False)
    variables = model.init_variables(jax.random.PRNGKey(0))
    batch = g._synth_batch(2, model.tpu_cfg["max_points_static"],
                           model.tpu_cfg["max_gt_static"],
                           model.point_cloud_range, seed=3)
    return variables, batch


def test_model_forward_matches_buffered(tiny_setup):
    variables, batch = tiny_setup
    outs_buf, _ = _tiny_model(False).apply(variables, batch, train=False)
    outs_pt, _ = _tiny_model(True).apply(variables, batch, train=False)
    for a, b in zip(outs_buf, outs_pt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_model_train_stats_match_buffered(tiny_setup):
    variables, batch = tiny_setup
    outs_buf, bs_buf = _tiny_model(False).apply(variables, batch,
                                                train=True)
    outs_pt, bs_pt = _tiny_model(True).apply(variables, batch, train=True)
    for a, b in zip(outs_buf, outs_pt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(bs_buf)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(bs_pt)}
    for k, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(k)]),
            rtol=1e-5, atol=1e-6, err_msg=jax.tree_util.keystr(k))
