"""Detection losses, jittable with padding-mask support.

Semantics match the reference exactly (losses/focal_loss.py:14-57,
losses/smooth_L1.py:5-47, losses/cross_entropy.py:13-45) with one addition:
an optional elementwise ``weight`` doubles as the padding mask, so the fixed
static shapes of the TPU build reduce to the reference's dynamic gathers.

Reduction contract (as in the reference):
  * ``avg_factor`` given and > 0  -> ``sum(loss) / avg_factor``
  * ``avg_factor`` None           -> ``mean(loss)``
"""

import jax.numpy as jnp
import jax


def one_hot(index, classes):
    """(N,) int labels -> (N, classes) float one-hot; label == classes -> all
    zeros (background), matching the reference's out-of-range behavior
    (losses/focal_loss.py:7-11)."""
    out_idx = jnp.arange(classes)[None, :]
    return (index[:, None] == out_idx).astype(jnp.float32)


def _reduce(loss, avg_factor):
    if avg_factor is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / avg_factor


class FocalLoss:
    """Sigmoid focal loss (gamma=2, alpha=0.25 active)."""

    def __init__(self, gamma=2.0, alpha=0.25, loss_weight=1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        """
        Args:
            pred: (N, C) logits (or (N,) single-logit).
            target: (N,) int labels when pred is 2D (label == C means
                background / all-zero target), else (N,) float targets.
            weight: optional elementwise/broadcastable mask-weight.
        """
        pred_sigmoid = jax.nn.sigmoid(pred)
        if pred.ndim > 1:
            target = one_hot(target, pred.shape[-1])
        target = target.astype(pred.dtype)

        pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
        focal_weight = (self.alpha * target + (1 - self.alpha) *
                        (1 - target)) * pt ** self.gamma
        # numerically-stable BCE-with-logits
        bce = jnp.clip(pred, 0) - pred * target + jnp.log1p(
            jnp.exp(-jnp.abs(pred)))
        loss = bce * focal_weight
        if weight is not None:
            loss = loss * weight
        loss = loss * self.loss_weight
        return _reduce(loss, avg_factor)


class SmoothL1Loss:
    """Piecewise smooth-L1 (beta=0.11 active)."""

    def __init__(self, beta=1.0, loss_weight=1.0):
        self.beta = beta
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta,
                         0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        if weight is not None:
            loss = loss * weight
        loss = loss * self.loss_weight
        return _reduce(loss, avg_factor)


class CrossEntropyLoss:
    """Softmax cross-entropy over discrete bins (loss_weight=0.2 active)."""

    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, cls_score, label, weight=None, avg_factor=None):
        logp = jax.nn.log_softmax(cls_score, axis=-1)
        label_clipped = jnp.clip(label, 0, cls_score.shape[-1] - 1)
        # one-hot select, not take_along_axis: a row gather over N rows
        # costs ~25 ms real at N=1.92M x 3 axes on this chip, the
        # elementwise select ~3 ms; exact (0/1 weights, finite logp)
        sel = (label_clipped[..., None]
               == jnp.arange(cls_score.shape[-1])).astype(logp.dtype)
        loss = -jnp.sum(logp * sel, axis=-1)
        if weight is not None:
            loss = loss * weight
        loss = loss * self.loss_weight
        return _reduce(loss, avg_factor)
