"""Masked global pooling over the point axis.

Dense replacements for PyG's ``global_max_pool`` / ``global_mean_pool``
over batch vectors (used by the reference heads,
deltanet_classification.py:46-47): with the batched ``[B, N, C]``
layout these are plain masked reductions over axis 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["global_max_pool", "global_mean_pool"]


def _cross_shard_max(x, axis_name):
    """Differentiable max over a mesh axis (``lax.pmax`` has no AD
    rule): all-gather the per-shard maxima and reduce locally."""
    return jnp.max(jax.lax.all_gather(x, axis_name, axis=0), axis=0)


def global_max_pool(x, point_mask=None, axis_name=None):
    """``[B, N, C] -> [B, C]`` masked max over points.

    ``axis_name``: when the point axis is sharded over a mesh axis
    (point-sharding), completes the reduction across shards.
    """
    if point_mask is None:
        out = jnp.max(x, axis=-2)
        return _cross_shard_max(out, axis_name) if axis_name else out
    mask = point_mask[..., None]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    out = jnp.max(jnp.where(mask, x, neg), axis=-2)
    any_valid = jnp.any(point_mask, axis=-1)[..., None]
    if axis_name:
        out = _cross_shard_max(out, axis_name)
        any_valid = jax.lax.pmax(any_valid, axis_name)
    return jnp.where(any_valid, out, 0.0)


def global_mean_pool(x, point_mask=None, axis_name=None):
    """``[B, N, C] -> [B, C]`` masked mean over points (psum-completed
    across shards when ``axis_name`` is set)."""
    if point_mask is None:
        if axis_name is None:
            return jnp.mean(x, axis=-2)
        s = jax.lax.psum(jnp.sum(x, axis=-2), axis_name)
        cnt = jax.lax.psum(jnp.float32(x.shape[-2]), axis_name)
        return s / cnt
    m = point_mask[..., None].astype(x.dtype)
    s = jnp.sum(x * m, axis=-2)
    cnt = jnp.sum(m, axis=-2)
    if axis_name:
        s = jax.lax.psum(s, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    return s / jnp.maximum(cnt, 1.0)
