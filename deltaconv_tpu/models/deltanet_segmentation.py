"""DeltaNet segmentation head.

Reference: /root/reference/deltaconv/models/deltanet_segmentation.py:9-68.
Backbone stage outputs are concatenated and embedded; a global max pool
is broadcast back per point, optionally joined by an embedded
categorical one-hot (ShapeNet's 16 object categories), re-concatenated
with the per-stage features, and decoded to per-point logits.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as lnn
import jax.numpy as jnp

from ..nn.init import torch_linear_bias, torch_linear_kernel
from ..nn.mlp import MLP
from ..nn.nonlin import leaky_relu02
from .deltanet_base import DeltaNetBase
from .pool import global_max_pool

__all__ = ["DeltaNetSegmentation"]


class DeltaNetSegmentation(lnn.Module):
    """Per-point segmentation with DeltaConv.

    Defaults match the reference: conv channels [64, 128, 256],
    mlp depth 2, embedding 1024, k=20, lambda=1e-3.
    """

    num_classes: int
    conv_channels: Sequence[int] = (64, 128, 256)
    mlp_depth: int = 2
    embedding_size: int = 1024
    categorical_vector: bool = False
    num_neighbors: int = 20
    grad_regularizer: float = 0.001
    grad_kernel_width: float = 1.0
    dropout: float = 0.5
    dense_operators: bool = True
    operator_dtype: Optional[str] = None
    compute_dtype: Optional[str] = None
    knn_method: str = "exact"
    # Mesh axis of a sharded point dimension (point-sharded forward).
    point_axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, normal=None, features=None, category=None,
                 point_mask=None, train: bool = False, operators=None):
        """Args as the classification model, plus ``category``:
        ``[B, 16]`` one-hot object category (required when
        ``categorical_vector=True``). Returns ``[B, N, num_classes]``.
        """
        conv_out = DeltaNetBase(
            conv_channels=self.conv_channels,
            mlp_depth=self.mlp_depth,
            num_neighbors=self.num_neighbors,
            grad_regularizer=self.grad_regularizer,
            grad_kernel_width=self.grad_kernel_width,
            dense_operators=self.dense_operators,
            operator_dtype=self.operator_dtype,
            compute_dtype=self.compute_dtype,
            knn_method=self.knn_method,
            point_axis_name=self.point_axis_name,
            name="deltanet_base",
        )(pos, normal=normal, features=features, point_mask=point_mask,
          train=train, operators=operators)

        x = jnp.concatenate(conv_out, axis=-1)
        x = MLP([self.embedding_size], dtype=self.compute_dtype,
                axis_name=self.point_axis_name, name="lin_global")(
            x, train=train, mask=point_mask)

        n = pos.shape[-2]
        x_max = global_max_pool(x, point_mask,
                                self.point_axis_name)  # [B, E]
        x_max = jnp.broadcast_to(
            x_max[..., None, :], x_max.shape[:-1] + (n, x_max.shape[-1])
        )

        if self.categorical_vector:
            if category is None:
                raise ValueError(
                    "categorical_vector=True requires a category one-hot"
                )
            cat = MLP([64], dtype=self.compute_dtype,
                      name="lin_categorical")(category, train=train)
            cat = jnp.broadcast_to(
                cat[..., None, :], cat.shape[:-1] + (n, cat.shape[-1])
            )
            x_max = jnp.concatenate([x_max, cat], axis=-1)

        x = jnp.concatenate([x_max] + conv_out, axis=-1)

        x = MLP([256], dtype=self.compute_dtype, name="head0",
                axis_name=self.point_axis_name)(
            x, train=train, mask=point_mask)
        x = lnn.Dropout(self.dropout, deterministic=not train)(x)
        x = MLP([256], dtype=self.compute_dtype, name="head1",
                axis_name=self.point_axis_name)(
            x, train=train, mask=point_mask)
        x = lnn.Dropout(self.dropout, deterministic=not train)(x)
        x = lnn.Dense(128, kernel_init=torch_linear_kernel,
                      bias_init=torch_linear_bias(256), name="head2")(x)
        x = leaky_relu02(x)
        return lnn.Dense(self.num_classes,
                         kernel_init=torch_linear_kernel,
                         bias_init=torch_linear_bias(128),
                         name="head_out")(x.astype(jnp.float32))
