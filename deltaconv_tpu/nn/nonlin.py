"""Normalization and vector non-linearities.

Reference: /root/reference/deltaconv/nn/nonlin.py. PyTorch BatchNorm1d
semantics are reproduced with flax.linen.BatchNorm (torch
``momentum=0.1`` == flax ``momentum=0.9``; ``eps=1e-5``); statistics
reduce over every axis except channels, which matches torch's
flattened ``[N_total, C]`` view when applied to ``[B, N, C]`` /
``[B, N, K, C]`` activations.

``VectorNonLin`` applies the nonlinearity to per-channel vector *norms*
(shifted by a learned bias or batch-normalized, since norms are
non-negative) and rescales the vectors — preserving direction and hence
rotation/reflection equivariance (reference nonlin.py:38-86).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as lnn
import jax.numpy as jnp

from ..geometry.utils import safe_norm

EPS = 1e-8

__all__ = ["BatchNorm", "VectorNonLin", "leaky_relu02"]


def leaky_relu02(x):
    """LeakyReLU with the reference's negative_slope=0.2."""
    return jnp.where(x >= 0, x, 0.2 * x)


class BatchNorm(lnn.Module):
    """BatchNorm over all axes but the last, PyTorch-parameterized.

    Wraps ``flax.linen.BatchNorm`` with torch defaults so imported
    PyTorch ``BatchNorm1d`` state maps 1:1
    (weight->scale, bias->bias, running_mean/var->mean/var).
    """

    momentum: float = 0.9  # torch momentum 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    # Mesh axis to sync batch statistics over (point-sharded training:
    # every shard sees only its rows of the cloud).
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, train: bool = False, mask=None):
        if mask is not None and mask.ndim == x.ndim - 1:
            mask = mask[..., None]
        # dtype=float32: statistics and normalization run in f32 even
        # when the surrounding network computes in bf16 (mixed
        # precision); output is f32, callers cast back.
        return lnn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x, mask=mask)


class VectorNonLin(lnn.Module):
    """Nonlinearity on vector norms; direction-preserving.

    Input ``[..., 2, C]``: norms over the component axis are shifted by
    a learned per-channel bias (when ``use_batchnorm=False``) or
    batch-normalized, passed through ``nonlin`` (default ReLU), and the
    vectors are rescaled by ``nonlin(shifted) / max(norm, EPS)``.
    """

    use_batchnorm: bool = True
    nonlin: Callable = lnn.relu
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, v, train: bool = False, mask=None):
        """``mask``: optional validity over ``v.shape[:-2]`` — masked
        entries are excluded from the norm batch statistics."""
        c = v.shape[-1]
        n = safe_norm(v.astype(jnp.float32), axis=-2)  # [..., C]
        if self.use_batchnorm:
            shifted = BatchNorm(name="bn", axis_name=self.axis_name)(
                n, train=train, mask=mask)
        else:
            bias = self.param("bias", lnn.initializers.zeros, (c,))
            shifted = n + bias
        scale = self.nonlin(shifted) / jnp.maximum(n, EPS)
        return v * scale[..., None, :].astype(v.dtype)
