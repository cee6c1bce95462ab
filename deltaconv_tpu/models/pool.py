"""Masked global pooling over the point axis.

Dense replacements for PyG's ``global_max_pool`` / ``global_mean_pool``
over batch vectors (used by the reference heads,
deltanet_classification.py:46-47): with the batched ``[B, N, C]``
layout these are plain masked reductions over axis 1.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["global_max_pool", "global_mean_pool"]


def global_max_pool(x, point_mask=None):
    """``[B, N, C] -> [B, C]`` masked max over points."""
    if point_mask is None:
        return jnp.max(x, axis=-2)
    mask = point_mask[..., None]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    out = jnp.max(jnp.where(mask, x, neg), axis=-2)
    return jnp.where(jnp.any(point_mask, axis=-1)[..., None], out, 0.0)


def global_mean_pool(x, point_mask=None):
    """``[B, N, C] -> [B, C]`` masked mean over points."""
    if point_mask is None:
        return jnp.mean(x, axis=-2)
    m = point_mask[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return jnp.sum(x * m, axis=-2) / cnt
