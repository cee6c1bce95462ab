"""Small geometry helpers shared across the package."""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5

__all__ = ["EPS", "batch_dot", "normalize", "safe_norm"]


def safe_norm(v, axis=-1, keepdims=False):
    """L2 norm with a well-defined zero gradient at ``v = 0``.

    ``jnp.linalg.norm`` back-propagates ``0/0 = NaN`` through
    exactly-zero vectors — which the vector stream produces by design
    (VectorNonLin's ReLU zeroes sub-threshold norms). PyTorch defines
    this subgradient as 0; this helper matches that convention so
    training is NaN-free.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    positive = sq > 0
    safe = jnp.sqrt(jnp.where(positive, sq, 1.0))
    return jnp.where(positive, safe, 0.0)


def batch_dot(a, b):
    """Row-wise dot product over the last axis, keepdims.

    Equivalent of the reference's bmm-based helper
    (/root/reference/deltaconv/geometry/utils.py:3-4), shaped
    ``[..., 3] x [..., 3] -> [..., 1]``.
    """
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps: float = EPS):
    """Normalize vectors over the last axis with a clamped norm."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)
