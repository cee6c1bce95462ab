"""Classification / segmentation losses.

Reference: /root/reference/experiments/utils.py:7-24 (`calc_loss`):
cross-entropy with optional label smoothing (eps-blended one-hot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy", "smooth_cross_entropy", "smooth_nll"]


def smooth_nll(logits, labels, smoothing: float):
    """Per-element label-smoothed negative log-likelihood ``[...]``:
    targets are the eps-blended one-hot ``(1 - eps) * onehot +
    eps / (C - 1) * (1 - onehot)`` — the true class keeps ``1 - eps``
    and only the off-classes share ``eps`` (reference utils.py:13-20).
    The ONE place that owns the smoothing convention (the point-sharded
    train step reduces it with collectives instead of the local mean).
    """
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    off = smoothing / max(c - 1, 1)
    target = onehot * (1.0 - smoothing) + (1.0 - onehot) * off
    return -jnp.sum(target * logp, axis=-1)


def smooth_cross_entropy(logits, labels, smoothing: float = 0.2,
                         label_mask=None):
    """Label-smoothed cross entropy (see :func:`smooth_nll`), reduced
    to the (optionally masked) mean.

    Args:
      logits: ``[..., C]``.
      labels: ``[...]`` int class indices.
      smoothing: blend factor eps; 0 reduces to plain cross-entropy.
      label_mask: optional ``[...]`` bool (masked entries excluded).
    """
    nll = smooth_nll(logits, labels, smoothing)
    if label_mask is None:
        return jnp.mean(nll)
    m = label_mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def cross_entropy(logits, labels, label_mask=None):
    """Mean cross-entropy from logits and integer labels."""
    return smooth_cross_entropy(logits, labels, 0.0, label_mask)
