"""Scalar and vector MLP stacks.

Reference: /root/reference/deltaconv/nn/mlp.py. Each scalar layer is
bias-free Dense -> BatchNorm -> LeakyReLU(0.2); each vector layer is
bias-free Dense (acting per component, hence equivariant) ->
VectorNonLin with batch-normalized norms.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as lnn
import jax.numpy as jnp

from .init import torch_linear_kernel
from .nonlin import BatchNorm, VectorNonLin, leaky_relu02

__all__ = ["MLP", "VectorMLP", "ScalarVectorMLP", "ScalarVectorIdentity"]


class MLP(lnn.Module):
    """Stack of (Dense no-bias -> BatchNorm -> nonlin) over channels.

    ``channels`` lists the output width of every layer (the input width
    is inferred), matching the reference's ``MLP([in, h1, ...])`` minus
    the explicit input entry.

    ``dtype``: compute dtype of the Dense matmuls and activations
    (mixed precision; params stay f32, BatchNorm statistics run f32).
    """

    channels: Sequence[int]
    nonlin: Optional[Callable] = leaky_relu02
    dtype: Optional[str] = None
    # Mesh axis for cross-shard BatchNorm statistics (point-sharded
    # training).
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """``mask``: optional validity over ``x.shape[:-1]`` — masked
        rows are excluded from BatchNorm statistics (padding points
        must not pollute train-mode normalization)."""
        dt = jnp.dtype(self.dtype) if self.dtype else None
        for i, ch in enumerate(self.channels):
            x = lnn.Dense(ch, use_bias=False, dtype=dt,
                          kernel_init=torch_linear_kernel,
                          name=f"lin{i}")(x)
            x = BatchNorm(name=f"bn{i}", axis_name=self.axis_name)(
                x, train=train, mask=mask)
            if self.nonlin is not None:
                x = self.nonlin(x)
            if dt is not None:
                x = x.astype(dt)
        return x


class VectorMLP(lnn.Module):
    """Stack of (Dense no-bias per component -> VectorNonLin).

    Input ``[..., 2, C]``. Bias-free channel mixing applied identically
    to both vector components plus a norm-nonlinearity keeps the map
    equivariant to per-point tangent rotations/reflections.
    """

    channels: Sequence[int]
    use_batchnorm: bool = True
    dtype: Optional[str] = None
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, v, train: bool = False, mask=None):
        """``mask``: optional validity over ``v.shape[:-2]``."""
        dt = jnp.dtype(self.dtype) if self.dtype else None
        for i, ch in enumerate(self.channels):
            v = lnn.Dense(ch, use_bias=False, dtype=dt,
                          kernel_init=torch_linear_kernel,
                          name=f"lin{i}")(v)
            v = VectorNonLin(
                use_batchnorm=self.use_batchnorm, name=f"nonlin{i}",
                axis_name=self.axis_name,
            )(v, train=train, mask=mask)
            if dt is not None:
                v = v.astype(dt)
        return v


class ScalarVectorMLP(lnn.Module):
    """Paired scalar+vector MLP over an ``(x, v)`` tuple.

    Reference mlp.py:19-39; exported API (not used by shipped models).
    """

    channels: Sequence[int]
    nonlin: bool = True
    vector_stream: bool = True

    @lnn.compact
    def __call__(self, xv, train: bool = False):
        if isinstance(xv, tuple):
            x, v = xv
        else:
            x, v = xv, None
        x = MLP(
            self.channels,
            nonlin=leaky_relu02 if self.nonlin else None,
            name="scalar_mlp",
        )(x, train=train)
        if self.vector_stream:
            if v is None:
                raise ValueError(
                    "vector_stream=True requires an (x, v) tuple input"
                )
            v = VectorMLP(self.channels, name="vector_mlp")(v, train=train)
            return x, v
        return x


class ScalarVectorIdentity(lnn.Module):
    """Identity helper matching the reference export (mlp.py:41-46)."""

    @lnn.compact
    def __call__(self, xv, train: bool = False):
        return xv
