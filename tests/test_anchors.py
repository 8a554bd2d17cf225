import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from objectdetection_3d_tpu.models.anchors import (  # noqa: E402
    Anchor3DRangeGenerator,
    BBoxCoder,
)


def make_gen():
    return Anchor3DRangeGenerator(
        ranges=[[0, 0, 0, 40.0, 40.0, 30.0]],
        sizes=[[0.75, 0.75, 12], [1.3, 1.3, 17], [1.0, 1.75, 20]],
        rotations=[[0.0, 0.0, 0.0], [0.0, 0.0, 1.57],
                   [0.3142, 0.0, 0.0], [-0.3142, 0.0, 0.0]],
    )


def test_grid_shape_and_count():
    gen = make_gen()
    assert gen.num_base_anchors == 12
    grid = gen.grid_anchors((400, 400))
    assert grid.shape == (400, 400, 3, 4, 9)
    flat = gen.flat_anchors((400, 400))
    assert flat.shape == (400 * 400 * 12, 9)


def test_anchor_values_follow_reference_layout():
    gen = make_gen()
    h = w = 5
    grid = gen.grid_anchors((h, w))
    # endpoint-inclusive linspaces (torch.linspace semantics)
    xs = np.linspace(0, 40, w)
    ys = np.linspace(0, 40, h)
    np.testing.assert_allclose(grid[2, 3, 1, 2, :3], [xs[3], ys[2], 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(grid[2, 3, 1, 2, 3:6], [1.3, 1.3, 17])
    np.testing.assert_allclose(grid[2, 3, 1, 2, 6:], [0.3142, 0, 0])
    # flat order: ((y*W + x)*S + s)*R + r
    flat = gen.flat_anchors((h, w))
    idx = ((2 * w + 3) * 3 + 1) * 4 + 2
    np.testing.assert_allclose(flat[idx], grid[2, 3, 1, 2])


def test_coder_roundtrip():
    rng = np.random.default_rng(0)
    anchors = np.zeros((32, 9), np.float32)
    anchors[:, :2] = rng.uniform(0, 40, (32, 2))
    anchors[:, 3:6] = rng.uniform(0.5, 5, (32, 3))
    gt = anchors.copy()
    gt[:, :3] += rng.uniform(-1, 1, (32, 3))
    gt[:, 3:6] *= rng.uniform(0.8, 1.2, (32, 3))
    gt[:, 6:] = rng.uniform(-1, 1, (32, 3))

    deltas = BBoxCoder.encode(jnp.asarray(anchors), jnp.asarray(gt))
    rec = np.asarray(BBoxCoder.decode(jnp.asarray(anchors), deltas))
    # decode returns z at the box CENTER — the reference's decode quirk
    # (model/utils.py:322-327: only the anchor z is re-shifted)
    want = gt.copy()
    want[:, 2] += want[:, 5] / 2
    np.testing.assert_allclose(rec, want, atol=1e-4)


def test_encode_formulas():
    anchor = jnp.asarray([[10.0, 20.0, 1.0, 2.0, 2.0, 10.0, 0, 0, 0]])
    gt = jnp.asarray([[11.0, 19.0, 2.0, 2.0, 4.0, 10.0, 0.1, 0.2, 0.3]])
    d = np.asarray(BBoxCoder.encode(anchor, gt))[0]
    diag = np.sqrt(8.0)
    np.testing.assert_allclose(d[0], 1.0 / diag, rtol=1e-5)
    np.testing.assert_allclose(d[1], -1.0 / diag, rtol=1e-5)
    np.testing.assert_allclose(d[2], 1.0 / 10.0, rtol=1e-5)  # z centers
    np.testing.assert_allclose(d[3], 0.0, atol=1e-6)
    np.testing.assert_allclose(d[4], np.log(2.0), rtol=1e-5)
    np.testing.assert_allclose(d[6:], [0.1, 0.2, 0.3], rtol=1e-5)
