"""Coverage for auxiliary modules: MLP filter, paddings indicators,
foreground filter round-trip, masked batch norm statistics."""

import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu.models.layers import (  # noqa: E402
    MLP,
    MaskedBatchNorm,
    get_paddings_indicator,
    get_paddings_indicator_np,
)
from objectdetection_3d_tpu.models.preprocess_tools import (  # noqa: E402
    ForegroundFilter,
)


def test_paddings_indicator():
    counts = jnp.asarray([0, 2, 5])
    mask = np.asarray(get_paddings_indicator(counts, 4))
    want = np.array([[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(mask, want)
    np.testing.assert_array_equal(
        get_paddings_indicator_np(np.asarray([0, 2, 5]), 4), want)


def test_mlp_shapes_and_range():
    mlp = MLP(input_channels=37)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (16, 37)),
                    jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=False)
    out = mlp.apply(variables, x, train=False)
    assert out.shape == (16, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_foreground_filter_mlp_roundtrip(tmp_path):
    mlp = MLP(input_channels=37)
    x = jnp.zeros((4, 37), jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=False)
    path = tmp_path / "mlp.pkl"
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(variables), f)

    ff = ForegroundFilter({
        "path": str(tmp_path) + "/",
        "filter_type": "mlp",
        "mlp": {"trunk_confidence": 0.5, "input_channels": 37},
    })
    feats = np.random.default_rng(1).normal(0, 1, (32, 37)).astype(
        np.float32)
    mask = ff.evaluate(feats)
    assert mask.shape == (32,)
    assert mask.dtype == np.uint8


def test_foreground_filter_validates_threshold(tmp_path):
    with pytest.raises(AssertionError):
        ForegroundFilter({
            "path": str(tmp_path) + "/", "filter_type": "mlp",
            "mlp": {"trunk_confidence": 1.5},
        })


def test_masked_batch_norm_matches_torch_semantics():
    """Masked BN over active rows == torch BatchNorm1d over those rows."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, (64, 8)).astype(np.float32)
    mask = rng.uniform(size=64) > 0.3

    bn = MaskedBatchNorm(eps=1e-3, momentum=0.01)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask)[:, None], True)
    out, mutated = bn.apply(variables, jnp.asarray(x),
                            jnp.asarray(mask)[:, None], True,
                            mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(8, eps=1e-3, momentum=0.01)
    tout = tbn(torch.tensor(x[mask]))
    np.testing.assert_allclose(np.asarray(out)[mask],
                               tout.detach().numpy(), atol=1e-4)
    # inactive rows stay exactly zero
    assert np.all(np.asarray(out)[~mask] == 0)
    # running stats follow torch's update rule
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-4)
