"""Loss parity tests against torch implementations of the reference math."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from objectdetection_3d_tpu.losses import (  # noqa: E402
    CrossEntropyLoss,
    FocalLoss,
    SmoothL1Loss,
)


def torch_focal(pred, target_onehot, gamma, alpha, lw, avg_factor):
    pred = torch.tensor(pred)
    target = torch.tensor(target_onehot)
    ps = pred.sigmoid()
    pt = (1 - ps) * target + ps * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        pred, target, reduction="none") * fw * lw
    if avg_factor is None:
        return loss.mean().item()
    return (loss.sum() / avg_factor).item()


def test_focal_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.normal(0, 2, (64, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 64)  # 3 == background -> all-zero one-hot
    onehot = (labels[:, None] == np.arange(3)[None, :]).astype(np.float32)

    fl = FocalLoss(gamma=2.0, alpha=0.25, loss_weight=1.0)
    got = float(fl(jnp.asarray(pred), jnp.asarray(labels), avg_factor=10.0))
    want = torch_focal(pred, onehot, 2.0, 0.25, 1.0, 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got_mean = float(fl(jnp.asarray(pred), jnp.asarray(labels)))
    want_mean = torch_focal(pred, onehot, 2.0, 0.25, 1.0, None)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.normal(0, 1, (32, 9)).astype(np.float32)
    target = rng.normal(0, 1, (32, 9)).astype(np.float32)
    beta, lw = 0.11, 2.0

    sl = SmoothL1Loss(beta=beta, loss_weight=lw)
    got = float(sl(jnp.asarray(pred), jnp.asarray(target), avg_factor=7.0))

    p, t = torch.tensor(pred), torch.tensor(target)
    diff = (p - t).abs()
    loss = torch.where(diff < beta, 0.5 * diff * diff / beta,
                       diff - 0.5 * beta) * lw
    want = (loss.sum() / 7.0).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (40, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 40)
    lw = 0.2

    ce = CrossEntropyLoss(loss_weight=lw)
    got = float(ce(jnp.asarray(logits), jnp.asarray(labels),
                   avg_factor=11.0))
    want = (F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                            reduction="none") * lw).sum().item() / 11.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weight_as_padding_mask():
    """Masked fixed-shape reduction == reference dynamic gather."""
    rng = np.random.default_rng(3)
    pred = rng.normal(0, 1, (16, 9)).astype(np.float32)
    target = rng.normal(0, 1, (16, 9)).astype(np.float32)
    mask = (rng.uniform(size=16) > 0.5).astype(np.float32)

    sl = SmoothL1Loss(beta=0.11, loss_weight=2.0)
    got = float(sl(jnp.asarray(pred), jnp.asarray(target),
                   weight=jnp.asarray(mask)[:, None], avg_factor=5.0))
    sel = mask.astype(bool)
    want = float(sl(jnp.asarray(pred[sel]), jnp.asarray(target[sel]),
                    avg_factor=5.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)
