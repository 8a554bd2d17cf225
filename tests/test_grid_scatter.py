"""Oracle tests for the single-pass Pallas grid build (interpret mode on
CPU; the compiled kernel is exercised on the real chip by bench/verify
drives)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from objectdetection_3d_tpu.ops.grid_scatter import scatter_to_grid  # noqa: E402


def _case(rng, d, h, w, c, v, n_active):
    cells = np.sort(rng.choice(d * h * w, n_active,
                               replace=False)).astype(np.int32)
    cell_flat = np.concatenate(
        [cells, np.full(v - n_active, d * h * w, np.int32)])
    feats = rng.normal(0, 1, (v, c)).astype(np.float32)
    return cells, cell_flat, feats


@pytest.mark.parametrize("shape", [(4, 16, 16, 8, 64, 40),
                                   (3, 16, 8, 4, 32, 20),
                                   (2, 8, 16, 16, 16, 16)])
def test_forward_matches_dense_oracle(shape):
    d, h, w, c, v, na = shape
    rng = np.random.default_rng(int(np.sum(shape)))
    cells, cell_flat, feats = _case(rng, d, h, w, c, v, na)

    grid = scatter_to_grid(jnp.asarray(feats), jnp.asarray(cell_flat),
                           (d, h, w), True)
    want = np.zeros((d * h * w, c), np.float32)
    want[cells] = feats[:na]
    np.testing.assert_array_equal(np.asarray(grid).reshape(-1, c), want)


def test_all_padding_gives_zero_grid():
    d, h, w, c, v = 2, 8, 8, 4, 16
    feats = np.ones((v, c), np.float32)
    cell_flat = np.full((v,), d * h * w, np.int32)
    grid = scatter_to_grid(jnp.asarray(feats), jnp.asarray(cell_flat),
                           (d, h, w), True)
    assert not np.any(np.asarray(grid))


def test_vjp_is_row_gather():
    d, h, w, c, v, na = 4, 16, 16, 8, 64, 40
    rng = np.random.default_rng(7)
    cells, cell_flat, feats = _case(rng, d, h, w, c, v, na)
    weights = rng.normal(0, 1, (d * h * w, c)).astype(np.float32)

    def loss(f):
        grid = scatter_to_grid(f, jnp.asarray(cell_flat), (d, h, w), True)
        return jnp.sum(grid.reshape(-1, c) * weights)

    got = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
    want = np.zeros((v, c), np.float32)
    want[:na] = weights[cells]
    np.testing.assert_allclose(got, want, rtol=1e-6)
