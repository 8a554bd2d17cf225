"""Sparse gather-based vertical encoder: exact equivalence with the dense
masked path under shared parameters."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from objectdetection_3d_tpu.ops.sparse_conv import (  # noqa: E402
    downsample_z_active_set,
    flatten_cells,
)
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


def build(sparse):
    cfg = tiny_model_cfg()
    cfg["tpu"]["sparse_middle"] = sparse
    return PointPillars(**cfg)


def test_flatten_cells_sorted_like_voxelizer():
    model = build(False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(1).items()}
    vox = model.voxelize_batch(batch["points"], batch["num_points"])
    flat = flatten_cells(vox["coords"][0], model.grid_dhw)
    n = int(vox["num_voxels"][0])
    vals = np.asarray(flat)[:n]
    assert np.all(np.diff(vals) > 0)  # strictly ascending (unique cells)
    assert np.all(np.asarray(flat)[n:] == np.prod(model.grid_dhw))


def test_downsample_active_set_rules():
    # input grid D=8: output D' = 3; out z' active iff input z in
    # {2z', 2z'+1, 2z'+2} active
    coords = jnp.asarray([[0, 1, 1], [5, 2, 2], [7, 3, 3], [-1, -1, -1]])
    mask = jnp.asarray([True, True, True, False])
    out = downsample_z_active_set(coords, mask, (8, 4, 4), 8)
    got = {tuple(c) for c, m in zip(np.asarray(out["coords"]),
                                    np.asarray(out["active_mask"])) if m}
    # z=0 -> z'=0 (tap k=0); z=5 -> z'=2 (tap k=1); z=7 is beyond the
    # VALID window (outputs read inputs 2z'+k <= 6), exactly like the
    # dense VALID conv
    want = {(0, 1, 1), (2, 2, 2)}
    assert got == want


def test_sparse_matches_dense_forward():
    dense = build(False)
    sparse = build(True)
    variables = dense.init_variables(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(2, seed=3).items()}

    (c1, r1, d1), _ = dense.apply(variables, batch, train=False)
    (c2, r2, d2), _ = sparse.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-4)


def test_sparse_matches_dense_train_step():
    dense = build(False)
    sparse = build(True)
    variables = dense.init_variables(jax.random.PRNGKey(1))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(2, seed=4).items()}

    def one_step(model):
        tx = model.get_optimizer(dict(lr=3e-3, betas=[0.95, 0.99],
                                      weight_decay=0.01),
                                 grad_clip_value=2.0)
        step = model.make_train_step(tx, donate=False)
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"],
                 "opt_state": tx.init(variables["params"])}
        state, losses = step(state, batch)
        return {k: float(v) for k, v in losses.items()}, state

    l1, s1 = one_step(dense)
    l2, s2 = one_step(sparse)
    for k in l1:
        np.testing.assert_allclose(l1[k], l2[k], rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_sparse_predict_runs():
    sparse = build(True)
    variables = sparse.init_variables(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(1).items()}
    out = sparse.make_predict_fn()(variables, batch)
    assert np.all(np.isfinite(np.asarray(out["score"])))
