"""Pallas z-fold conv kernel: equivalence with the XLA conv (TPU-only;
the Mosaic roll path is not faithfully emulated by the interpreter)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,co", [((2, 16, 40, 20), 16),
                                      ((1, 24, 100, 120), 80),
                                      ((3, 8, 31, 37), 64)])
def test_matches_xla_conv(shape, co):
    if jax.default_backend() != "tpu":
        pytest.skip("pallas kernel exactness is validated on TPU only")
    from objectdetection_3d_tpu.ops.zfold_conv import conv2d_3x3_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, shape[-1], co)).astype(
        np.float32))
    np.testing.assert_allclose(np.asarray(conv2d_3x3_pallas(x, w)),
                               np.asarray(_xla_conv(x, w)), atol=2e-4)


def test_gradients_match_xla():
    if jax.default_backend() != "tpu":
        pytest.skip("pallas kernel exactness is validated on TPU only")
    from objectdetection_3d_tpu.ops.zfold_conv import conv2d_3x3_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 12, 8)).astype(np.float32))
    gp = jax.grad(lambda x, w: jnp.sum(conv2d_3x3_pallas(x, w) ** 2),
                  argnums=(0, 1))(x, w)
    gx = jax.grad(lambda x, w: jnp.sum(_xla_conv(x, w) ** 2),
                  argnums=(0, 1))(x, w)
    for a, b in zip(gp, gx):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-3)


def test_flag_falls_through_on_cpu():
    """zfold_pallas on a non-TPU backend must silently use the XLA conv
    (same guard style as pallas_subm)."""
    from objectdetection_3d_tpu.models.layers import SparseMiddleExtractor

    grid = jnp.asarray(np.random.default_rng(2).normal(
        0, 1, (1, 9, 8, 8, 4)).astype(np.float32))
    mask = jnp.ones((1, 9, 8, 8), jnp.float32)
    enc = SparseMiddleExtractor(in_channels=4, out_channels=(6,),
                                zfold_convs=True)
    v = enc.init(jax.random.PRNGKey(0), grid, mask, False)
    y0, _ = enc.apply(v, grid, mask, False)
    enc_p = SparseMiddleExtractor(in_channels=4, out_channels=(6,),
                                  zfold_convs=True, zfold_pallas=True)
    y1, _ = enc_p.apply(v, grid, mask, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_fused_stage_flag_falls_through_on_cpu():
    """fused_stages off-TPU must silently use the unfused stages."""
    from objectdetection_3d_tpu.models.layers import SparseMiddleExtractor

    rng = np.random.default_rng(4)
    grid = jnp.asarray(rng.normal(0, 1, (1, 9, 8, 8, 4)).astype(
        np.float32))
    mask = (jnp.asarray(rng.uniform(size=(1, 9, 8, 8))) < 0.5).astype(
        jnp.float32)
    grid = grid * mask[..., None]
    enc = SparseMiddleExtractor(in_channels=4, out_channels=(6, 8))
    v = enc.init(jax.random.PRNGKey(0), grid, mask, False)
    y0, m0 = enc.apply(v, grid, mask, False)
    enc_f = SparseMiddleExtractor(in_channels=4, out_channels=(6, 8),
                                  fused_stages=True)
    y1, m1 = enc_f.apply(v, grid, mask, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
