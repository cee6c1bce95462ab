"""DeltaNet classification head.

Reference: /root/reference/deltaconv/models/deltanet_classification.py:9-50.
Backbone stage outputs are concatenated, embedded to 1024 channels,
globally max+mean pooled, and classified through a dropout MLP head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as lnn
import jax.numpy as jnp

from ..nn.init import torch_linear_bias, torch_linear_kernel
from ..nn.mlp import MLP
from .deltanet_base import DeltaNetBase
from .pool import global_max_pool, global_mean_pool

__all__ = ["DeltaNetClassification"]


class DeltaNetClassification(lnn.Module):
    """Point-cloud classification with DeltaConv.

    Defaults match the reference: conv channels [64, 64, 128, 256],
    mlp depth 1, k=20, lambda=1e-3, kernel width 1.
    """

    num_classes: int
    conv_channels: Sequence[int] = (64, 64, 128, 256)
    mlp_depth: int = 1
    num_neighbors: int = 20
    grad_regularizer: float = 0.001
    grad_kernel_width: float = 1.0
    embedding_size: int = 1024
    dropout: float = 0.5
    dense_operators: bool = True
    operator_dtype: Optional[str] = None
    compute_dtype: Optional[str] = None
    knn_method: str = "exact"
    # Mesh axis the point dimension is sharded over (point-sharded
    # forward, parallel/point_sharding.py): global pools complete with
    # collectives over this axis.
    point_axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, normal=None, features=None, point_mask=None,
                 train: bool = False, operators=None):
        """Returns logits ``[B, num_classes]``."""
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
                axis_name=self.point_axis_name, name="lin_embedding")(
            x, train=train, mask=point_mask)

        ax = self.point_axis_name
        x = jnp.concatenate(
            [global_max_pool(x, point_mask, ax),
             global_mean_pool(x, point_mask, ax)],
            axis=-1,
        )

        x = MLP([512], dtype=self.compute_dtype, name="head0")(
            x, train=train)
        x = lnn.Dropout(self.dropout, deterministic=not train)(x)
        x = MLP([256], dtype=self.compute_dtype, name="head1")(
            x, train=train)
        x = lnn.Dropout(self.dropout, deterministic=not train)(x)
        return lnn.Dense(self.num_classes,
                         kernel_init=torch_linear_kernel,
                         bias_init=torch_linear_bias(256),
                         name="head_out")(x.astype(jnp.float32))
