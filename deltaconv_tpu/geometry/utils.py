"""Small geometry helpers shared across the package."""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5

__all__ = ["EPS", "batch_dot", "normalize"]


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
