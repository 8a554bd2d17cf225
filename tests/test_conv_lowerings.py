"""Equivalence of the vertical encoder's conv lowerings.

The encoder offers several mathematically identical lowerings of the same
parameters (native conv3d, z-sliced 2D decomposition, z-folded wide-channel
strided conv3d); any output divergence is a bug, so each alternative is
pinned against the native XLA conv here.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models.layers import (  # noqa: E402
    SparseMiddleExtractor,
)


def _random_grid(key, shape, occupancy=0.2):
    k1, k2 = jax.random.split(key)
    mask = (jax.random.uniform(k1, shape[:-1]) < occupancy).astype(
        jnp.float32)
    x = jax.random.normal(k2, shape) * mask[..., None]
    return x, mask


def _run(enc_kwargs, grid, mask, variables=None, train=False):
    enc = SparseMiddleExtractor(in_channels=int(grid.shape[-1]),
                                out_channels=(6, 8), **enc_kwargs)
    if variables is None:
        variables = enc.init(jax.random.PRNGKey(0), grid, mask, False)
    if train:
        (y, m), mut = enc.apply(variables, grid, mask, True,
                                mutable=["batch_stats"])
        return y, m, variables, mut
    y, m = enc.apply(variables, grid, mask, False)
    return y, m, variables, None


@pytest.mark.parametrize("alt", [dict(decompose_convs=True),
                                 dict(decompose_convs=1),
                                 dict(zfold_convs=True)])
def test_encoder_lowerings_match_native(alt):
    grid, mask = _random_grid(jax.random.PRNGKey(7), (2, 13, 12, 10, 5))
    y0, m0, variables, _ = _run({}, grid, mask)
    y1, m1, _, _ = _run(alt, grid, mask, variables=variables)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)


def test_zfold_train_grads_match_native():
    grid, mask = _random_grid(jax.random.PRNGKey(3), (1, 9, 8, 8, 4))

    def loss(enc_kwargs, variables):
        enc = SparseMiddleExtractor(in_channels=4, out_channels=(6, 8),
                                    **enc_kwargs)

        def f(params):
            (y, _), _ = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                grid, mask, True, mutable=["batch_stats"])
            return jnp.sum(y ** 2)

        return jax.grad(f)(variables["params"])

    enc0 = SparseMiddleExtractor(in_channels=4, out_channels=(6, 8))
    variables = enc0.init(jax.random.PRNGKey(0), grid, mask, False)
    g0 = loss({}, variables)
    g1 = loss(dict(zfold_convs=True), variables)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_zfold_block_choice():
    pick = SparseMiddleExtractor._zfold_block
    assert pick(20, 100) == 4      # (4+2)*20 = 120 <= 128
    assert pick(32, 49) == 2       # (2+2)*32 = 128
    assert pick(64, 24) == 1       # floored at 1 (gated off by callers)
    assert pick(128, 11) == 1
    assert pick(20, 4) == 4        # capped by remaining depth
