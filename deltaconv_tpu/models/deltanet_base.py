"""DeltaNet backbone: operator construction + stacked DeltaConvs.

Reference: /root/reference/deltaconv/models/deltanet_base.py:8-87.

The reference rebuilds the kNN graph and the grad/div operators every
forward pass on the (augmented) positions — operator construction *is*
the per-step hot path, so it lives inside the jitted model call here
too, expressed entirely with static shapes so XLA compiles it once.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import flax.linen as lnn
import jax
import jax.numpy as jnp

from ..geometry.dense import densify
from ..geometry.frames import build_tangent_basis, estimate_basis
from ..geometry.grad_div import GradDiv, build_grad_div
from ..geometry.knn import knn
from ..nn.deltaconv import DeltaConv

__all__ = ["DeltaNetBase", "build_operators",
           "build_dense_operators_fused"]


def build_operators(
    pos,
    k: int,
    normal=None,
    point_mask=None,
    kernel_width: float = 1.0,
    regularizer: float = 0.001,
    normal_k: int = 10,
    knn_method: str = "exact",
) -> GradDiv:
    """Builds the per-cloud grad/div operators, batched over axis 0.

    Pipeline per cloud (reference deltanet_base.py:42-69): kNN graph
    (self-loop in slot 0); tangent frames from given normals
    (``build_tangent_basis``) or estimated from a ``normal_k``-NN graph
    with ``orientation=pos`` (``estimate_basis``); then the MLS grad/div
    build.

    Args:
      pos: ``[B, N, 3]`` or ``[N, 3]`` positions.
      k: neighbors for the conv/operator graph (incl. self).
      normal: optional matching-shape unit normals.
      point_mask: optional ``[B, N]`` / ``[N]`` bool validity.
      kernel_width, regularizer: WLS parameters.
      normal_k: neighbors used for basis estimation when no normals.

    Returns:
      :class:`GradDiv` (batched when ``pos`` is batched).
    """

    def frames_and_graph(pos, normal, point_mask):
        nbr_idx, nbr_mask = knn(pos, k, point_mask, method=knn_method)
        if normal is None:
            nbr_n, mask_n = knn(pos, normal_k, point_mask,
                                method=knn_method)
            n, xb, yb = estimate_basis(pos, nbr_n, mask_n, orientation=pos)
        else:
            n = normal
            xb, yb = build_tangent_basis(n)
        if point_mask is not None:
            nbr_mask = nbr_mask & point_mask[:, None]
        return n, xb, yb, nbr_idx, nbr_mask

    def single(pos, normal, point_mask):
        n, xb, yb, nbr_idx, nbr_mask = frames_and_graph(
            pos, normal, point_mask
        )
        return build_grad_div(
            pos, n, xb, yb, nbr_idx, nbr_mask, point_mask,
            kernel_width=kernel_width, regularizer=regularizer,
        )

    if pos.ndim == 2:
        return single(pos, normal, point_mask)
    in_axes = (0, None if normal is None else 0,
               None if point_mask is None else 0)

    if jax.default_backend() == "tpu":
        # Fused Pallas operator construction (ops/wls_fused.py): the
        # whole WLS pipeline in one kernel instead of ~150 small ones.
        from ..ops.wls_fused import build_grad_div_fused

        n, xb, yb, nbr_idx, nbr_mask = jax.vmap(
            frames_and_graph, in_axes=in_axes
        )(pos, normal, point_mask)
        return build_grad_div_fused(
            pos, n, xb, yb, nbr_idx, nbr_mask,
            kernel_width=kernel_width, regularizer=regularizer,
        )

    return jax.vmap(single, in_axes=in_axes)(pos, normal, point_mask)


def build_dense_operators_fused(pos, k: int, normal,
                                kernel_width: float = 1.0,
                                regularizer: float = 0.001,
                                knn_method: str = "approx"):
    """Inference fast path: the whole operator build (kNN -> frames ->
    WLS -> dense assembly) in two Pallas kernels with a deferred
    normalization scale (see ops/fused_build.py). Requires given
    normals, no point_mask, batched ``[B, N, 3]`` input with
    ``N % 128 == 0``. Semantics match ``densify(build_operators(...),
    bfloat16)`` to bf16 rounding."""
    from ..geometry.dense import DenseGradDiv
    from ..ops.fused_build import fused_dense_build
    from ..ops.knn_topk import knn_topk

    b, n, _ = pos.shape
    idx, mean_dist = knn_topk(pos, k,
                              quantized=(knn_method == "approx"),
                              return_mean_dist=True)
    mask = jnp.ones(idx.shape, bool)
    xb, yb = build_tangent_basis(normal)
    avg = jnp.mean(mean_dist, axis=1)  # [B]
    wg, wd, rn = fused_dense_build(pos, normal, xb, yb, idx, mask, avg,
                                   kernel_width, regularizer)
    inf_norm = jnp.max(rn, axis=1)
    scale = jnp.where(inf_norm > 1e-5, 1.0 / inf_norm, 1.0)
    return DenseGradDiv(nbr_idx=idx, nbr_mask=mask, w_grad=wg,
                        w_div=wd, scale=scale)


class DeltaNetBase(lnn.Module):
    """DGCNN-style backbone of sequential DeltaConv blocks.

    Attributes mirror the reference constructor
    (deltanet_base.py:9-39): the first conv is centralized, the last
    drops the vector stream, and every intermediate scalar output is
    returned for multi-scale concatenation by the heads.
    """

    conv_channels: Sequence[int]
    mlp_depth: int = 1
    num_neighbors: int = 20
    grad_regularizer: float = 0.001
    grad_kernel_width: float = 1.0
    centralize_first: bool = True
    # Dense (MXU) operator form: XLA's TPU gather runs far below HBM
    # bandwidth, so the per-edge operators are materialized once per
    # forward as [2N, N] matrices and applied as batched matmuls.
    # operator_dtype=bfloat16 halves matmul traffic (f32 accumulation).
    dense_operators: bool = True
    operator_dtype: Optional[str] = None
    knn_method: str = "exact"
    # Opt-in single-kernel eval build (ops/fused_build.py). Measured
    # SLOWER than the default gather_rows + wls_fused + densify
    # pipeline on v5e (2781 vs 2885 clouds/s at B=32, N=1024: the
    # separate kernels pipeline better and run the WLS chain at
    # 512-wide tiles) — kept for other shapes/generations.
    fused_eval_build: bool = False
    # Mixed precision for the conv stack: bf16 matmuls/activations,
    # f32 BatchNorm statistics and parameters. Geometry (operator
    # construction) always runs f32.
    compute_dtype: Optional[str] = None
    # Mesh axis of a sharded point dimension (point-sharded training):
    # BatchNorm/edge statistics inside the convs psum over it.
    point_axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, pos, normal=None, features=None, point_mask=None,
                 train: bool = False, operators=None):
        """Args:
          pos: ``[B, N, 3]`` positions (operators are rebuilt on them).
          normal: optional ``[B, N, 3]`` normals.
          features: optional ``[B, N, C]`` input scalars (default: pos).
          point_mask: optional ``[B, N]`` bool validity.
          operators: optional prebuilt operator object implementing the
            neighbor protocol (geometry/nbr_ops.py) — skips the
            internal build; used by the point-sharded forward, which
            constructs collective-backed operators inside shard_map.

        Returns: list of per-stage scalar outputs ``[B, N, C_i]``.
        """
        op_dtype = (jnp.dtype(self.operator_dtype)
                    if self.operator_dtype else None)
        use_fused_build = (
            self.fused_eval_build
            and self.dense_operators and not train and point_mask is None
            and normal is not None and pos.ndim == 3
            and op_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and pos.shape[1] % 128 == 0
        )
        if operators is not None:
            gd = operators
        elif use_fused_build:
            gd = build_dense_operators_fused(
                pos, self.num_neighbors, normal,
                kernel_width=self.grad_kernel_width,
                regularizer=self.grad_regularizer,
                knn_method=self.knn_method,
            )
        else:
            gd = build_operators(
                pos,
                self.num_neighbors,
                normal=normal,
                point_mask=point_mask,
                kernel_width=self.grad_kernel_width,
                regularizer=self.grad_regularizer,
                knn_method=self.knn_method,
            )
            if self.dense_operators:
                gd = densify(gd, op_dtype)

        x = features if features is not None else pos
        if self.compute_dtype:
            x = x.astype(jnp.dtype(self.compute_dtype))
        v = gd.grad(x)

        out = []
        n_convs = len(self.conv_channels)
        for i, ch in enumerate(self.conv_channels):
            last = i == n_convs - 1
            x, v = DeltaConv(
                out_channels=ch,
                depth=self.mlp_depth,
                centralized=(self.centralize_first and i == 0),
                vector=not last,
                dtype=self.compute_dtype,
                axis_name=self.point_axis_name,
                name=f"conv{i}",
            )(x, v, gd, train=train, point_mask=point_mask)
            out.append(x)
        return out
