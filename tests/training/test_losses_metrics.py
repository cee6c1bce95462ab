"""Tests for losses and metrics against independent references."""

import jax.numpy as jnp
import numpy as np

from deltaconv_tpu.training.losses import cross_entropy, smooth_cross_entropy
from deltaconv_tpu.training.metrics import (
    accuracy,
    balanced_accuracy,
    shape_iou,
)


def _np_log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_cross_entropy_matches_numpy(rng):
    logits = rng.normal(size=(16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 16).astype(np.int32)
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        -_np_log_softmax(logits)[np.arange(16), labels].mean()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_cross_entropy_matches_reference_formula(rng):
    """Reference utils.py:12-20: true class 1-eps, off-classes
    eps/(C-1)."""
    eps, c = 0.2, 10
    logits = rng.normal(size=(16, c)).astype(np.float32)
    labels = rng.integers(0, c, 16).astype(np.int32)
    got = float(
        smooth_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), eps)
    )
    onehot = np.eye(c, dtype=np.float32)[labels]
    target = onehot * (1 - eps) + (1 - onehot) * eps / (c - 1)
    want = float(-(target * _np_log_softmax(logits)).sum(-1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_accuracy_metrics():
    pred = np.array([0, 1, 1, 2, 2, 2])
    true = np.array([0, 1, 2, 2, 2, 1])
    assert accuracy(pred, true) == 4 / 6
    # per-class recall: c0 1/1, c1 1/2, c2 2/3
    np.testing.assert_allclose(
        balanced_accuracy(pred, true), (1 + 0.5 + 2 / 3) / 3
    )


def test_shape_iou_empty_union_counts_as_one():
    # Category 1 ('bag') has 2 parts with global indices 4, 5.
    pred = np.full((1, 10), 4)
    seg = np.full((1, 10), 4)
    ious = shape_iou(pred, seg, np.array([1]))
    # Part 4: IoU 1. Part 5: absent from both -> 1.
    assert ious == [1.0]

    pred = np.array([[4] * 5 + [5] * 5])
    seg = np.array([[4] * 10])
    ious = shape_iou(pred, seg, np.array([1]))
    # Part 4: I=5, U=10 -> 0.5 ; part 5: I=0, U=5 -> 0.
    np.testing.assert_allclose(ious, [0.25])
